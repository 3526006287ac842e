"""1000×-posture probes (VERDICT r12 item 4): push the two hottest
scale rows one measured point past the green 100× axis and name the
binding resource.

- q165 (two chained JVM state stores) at a 1000× events replica
  (100M events through the 5-trigger replay) under the round-12
  ``jvm_state_partitions`` formula (min(cores, n//300k) → 32 here).
  The replica is SPAN-SCALED: each of the 1000 copies is shifted into
  its own disjoint time segment, so event density per hour is the 1×
  density and the interval-join state/output grow LINEARLY — the shape
  a 1000×-bigger crawl actually has. The first attempt replicated into
  the SAME time span (scale_dataset's key-offset form, which is right
  for batch joins keyed on offset ids): 1000× density makes the
  clicks×purchases-within-1h join output QUADRATIC in the factor, and
  the run blew a 55-minute ceiling — recorded in scale_notes as the
  densification caveat, not an engine defect.
- q240 semdedup_scaled and q262's 7-stage pipeline at a 1000×
  documents+embeddings replica (5M docs / 2M vectors) via
  ``scale_dataset(only=...)``.

Each probe replicates ONLY the fact tables the query reads — a 1000×
lineitem expansion nothing scans would dominate the wall for no
signal. Single warm-ish run per query (these are minutes-long; the
point is the binding resource, not a median), wall seconds printed
per stage.

Usage:  python scripts/probe1000x.py [q165|q240|q262 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = {
    "q165_chained_stateful": ["events"],
    "q240_semdedup_scaled": ["documents", "embeddings"],
    "q262_curation_pipeline_semantic": ["documents", "embeddings"],
}


def _scale_events_span(spark, src_dir: str, dest_dir: str, factor: int) -> str:
    """factor× events where replica i is time-shifted by i × (span + 3h):
    disjoint segments, 1× density — the streaming 1000× posture. Other
    tables copied at 1×. Idempotent via a stamp marker."""
    import hashlib
    import shutil

    from pyspark.sql import functions as F

    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.datagen import KEY_OFFSET, TABLES, table_path

    fp = hashlib.md5()
    st = os.stat(table_path(src_dir, "events"))
    fp.update(f"events|{st.st_size}|{st.st_mtime_ns}".encode())
    stamp = f"span factor={factor} src={fp.hexdigest()[:16]}"
    marker = os.path.join(dest_dir, "_SCALED_OK")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == stamp:
                return dest_dir
        shutil.rmtree(dest_dir, ignore_errors=True)
    os.makedirs(dest_dir, exist_ok=True)
    ev = load_table(spark, src_dir, "events")  # µs-normalized ts
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_s = int((hi - lo).total_seconds()) + 3 * 3600  # +3h > any watermark
    rep = ev.crossJoin(
        F.broadcast(spark.range(factor).withColumnRenamed("id", "__rep"))
    )
    rep = rep.withColumn("event_id", F.col("event_id") + F.col("__rep") * KEY_OFFSET)
    rep = rep.withColumn(
        "ts", F.expr(f"ts + make_dt_interval(0, 0, 0, __rep * {span_s}.0)")
    )
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    rep.repartition(2 * cpus).drop("__rep").select(*ev.columns).write.mode(
        "overwrite"
    ).parquet(table_path(dest_dir, "events"))
    for name in TABLES:
        if name != "events":
            shutil.copyfile(table_path(src_dir, name), table_path(dest_dir, name))
    with open(marker, "w") as f:
        f.write(stamp)
    return dest_dir


def main() -> None:
    from pandas_streaming_spark.datagen import scale_dataset
    from pandas_streaming_spark.queries import QUERIES
    from pandas_streaming_spark.session import get_spark
    from pandas_streaming_spark.streaming.replay import SCRATCH

    wanted = sys.argv[1:] or list(PROBES)
    names = []
    for n in wanted:
        m = [k for k in PROBES if k == n or k.startswith(n)]
        if len(m) != 1:
            raise SystemExit(f"unknown/ambiguous probe {n!r}")
        names.append(m[0])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe1000x")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        tables = PROBES[name]
        span = tables == ["events"]  # streaming probe: span-scaled
        scaled = os.path.join(
            SCRATCH,
            f"scaled-{os.path.basename(sf_dir.rstrip('/'))}"
            f"-x1000-{'span-' if span else ''}{'-'.join(t[:3] for t in tables)}",
        )
        t0 = time.perf_counter()
        if span:
            _scale_events_span(spark, sf_dir, scaled, 1000)
        else:
            scale_dataset(spark, sf_dir, scaled, 1000, only=tables)
        synth = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_rows = QUERIES[name](spark, scaled).count()
        wall = time.perf_counter() - t0
        out[name] = {
            "synth_s": round(synth, 1),
            "wall_s": round(wall, 1),
            "rows": n_rows,
        }
        print(name, out[name], flush=True)
    print(json.dumps({"probe": "1000x", "sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
