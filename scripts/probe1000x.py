"""1000×-posture probes (VERDICT r12 item 4): push the two hottest
scale rows one measured point past the green 100× axis and name the
binding resource.

- q165 (two chained JVM state stores) at a 1000× events replica
  (100M events through the 5-trigger replay) under the round-12
  ``jvm_state_partitions`` formula (min(cores, n//300k) → 32 here).
- q240 semdedup_scaled and q262's 7-stage pipeline at a 1000×
  documents+embeddings replica (5M docs / 2M vectors).

Each probe replicates ONLY the fact tables the query reads
(``scale_dataset(only=...)``) — a 1000× lineitem expansion nothing
scans would dominate the wall for no signal. Single warm-ish run per
query (these are minutes-long; the point is the binding resource, not
a median), wall seconds printed per stage.

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
        scaled = os.path.join(
            SCRATCH,
            f"scaled-{os.path.basename(sf_dir.rstrip('/'))}"
            f"-x1000-{'-'.join(t[:3] for t in tables)}",
        )
        t0 = time.perf_counter()
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
