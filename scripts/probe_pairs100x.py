"""100x-documents posture probe for the verified-pairs machinery
(VERDICT r13 item 4): the q165 replica law applied to the DOCUMENTS
axis. A densified replica (scale_dataset: identical text, offset ids)
concentrates 100x near-dup mass into the 1x content space — every text
becomes a 100-member bucket, the capped production kernel drops them
all, and the probe measures an artifact. The documents-axis law is the
same as q165's span+keyspace rule: a 100x-bigger crawl has ~100x
CONTENT (vocabulary, pages), not 100 copies of the same page. So the
replica salts every token per replica (bijective vocabulary renaming:
within-replica near-dup structure EXACTLY preserved, cross-replica
Jaccard = 0) and offsets doc_id per replica — both axes scale with the
factor.

Measures the verified_pairs stage ladder with HONEST per-stage seconds
(each stage persisted before the next is timed, so stage N+1 never
re-pays stage N):

    signature   minhash_signatures (8-hash KM, 3-shingles)
    banding     4x2 band table -> capped buckets -> candidate pairs
    verify      candidate-scoped exact Jaccard (delta-sized shingles)
    merge       KeyedUpsertSink commit of the >=0.8 survivors

Usage: python scripts/probe_pairs100x.py [factor]   # default 100
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_salted_docs(spark, sf_dir: str, dest_dir: str, factor: int) -> str:
    """factor-x documents replica: doc_id offset + per-replica token
    salting. Other tables copied 1x (the probe reads only documents)."""
    import hashlib

    from pyspark.sql import functions as F

    from pandas_streaming_spark.catalog import load_table, table_path
    from pandas_streaming_spark.datagen import KEY_OFFSET, TABLES

    fp = hashlib.md5()
    st = os.stat(table_path(sf_dir, "documents"))
    fp.update(f"documents|{st.st_size}|{st.st_mtime_ns}".encode())
    stamp = f"salted factor={factor} src={fp.hexdigest()[:16]}"
    marker = os.path.join(dest_dir, "_SCALED_OK")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == stamp:
                return dest_dir
        shutil.rmtree(dest_dir, ignore_errors=True)
    os.makedirs(dest_dir, exist_ok=True)
    docs = load_table(spark, sf_dir, "documents")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rep = docs.crossJoin(
        F.broadcast(spark.range(factor).withColumnRenamed("id", "__rep"))
    )
    salted = (
        rep.withColumn("doc_id", F.col("doc_id") + F.col("__rep") * KEY_OFFSET)
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(
                        F.lit("r"), F.col("__rep").cast("string"), F.lit("_"), t
                    ),
                ),
                " ",
            ),
        )
        .repartition(2 * cpus)
        .drop("__rep")
        .select(*docs.columns)
    )
    salted.write.mode("overwrite").parquet(table_path(dest_dir, "documents"))
    for name in TABLES:
        if name != "documents":
            shutil.copyfile(table_path(sf_dir, name), table_path(dest_dir, name))
    with open(marker, "w") as f:
        f.write(stamp)
    return dest_dir


def main() -> None:
    from pyspark.sql import functions as F

    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.dedup import (
        banded_table,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from pandas_streaming_spark.queries.dedup_q import _PAIRS_KERNEL
    from pandas_streaming_spark.session import get_spark
    from pandas_streaming_spark.streaming.replay import SCRATCH, _fresh_dir
    from pandas_streaming_spark.streaming.upsert import KeyedUpsertSink

    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe_pairs100x")
    spark.sparkContext.setLogLevel("ERROR")
    dest = os.path.join(
        SCRATCH,
        f"scaled-{os.path.basename(sf_dir.rstrip('/'))}-x{factor}-salted-doc",
    )
    t0 = time.perf_counter()
    build_salted_docs(spark, sf_dir, dest, factor)
    synth_s = round(time.perf_counter() - t0, 1)

    docs = load_table(spark, dest, "documents")
    n_docs = docs.count()
    kp = _PAIRS_KERNEL
    stages: dict[str, float] = {}

    # stage 1: signatures (one shingle-explode + 8 min-aggregates)
    t0 = time.perf_counter()
    sig = minhash_signatures(
        docs, n_hashes=kp["n_hashes"], k=kp["k"]
    ).persist()
    n_sig = sig.count()
    stages["signature_s"] = round(time.perf_counter() - t0, 1)

    # stage 2: banding + capped buckets -> candidate pairs.
    # banded_table recomputes signatures from text, so band from the
    # persisted sig directly (same expressions as banded_table).
    rows = kp["n_hashes"] // kp["bands"]
    t0 = time.perf_counter()
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("signature", b * rows + i + 1)
                                    for i in range(rows)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(kp["bands"])
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "bh.band", "bh.band_hash")
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter(
            (F.size("ids") >= 2) & (F.size("ids") <= kp["max_bucket"])
        )
    )
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
        .persist()
    )
    n_cand = cand.count()
    stages["banding_s"] = round(time.perf_counter() - t0, 1)

    # stage 3: candidate-scoped exact verify, shingles only for endpoints
    t0 = time.perf_counter()
    ids = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    sub = docs.join(ids, "doc_id", "left_semi")
    p = ngram_jaccard_pairs(sub, k=kp["k"], threshold=0.0, candidates=cand)
    jac_e4 = F.round(
        F.lit(10000.0)
        * F.col("common")
        / (F.col("na") + F.col("nb") - F.col("common")),
        0,
    ).cast("long")
    pairs = (
        p.select("id_a", "id_b", jac_e4.alias("jac_e4"))
        .filter(F.col("jac_e4") >= 8000)
        .persist()
    )
    n_pairs = pairs.count()
    stages["verify_s"] = round(time.perf_counter() - t0, 1)

    # stage 4: MERGE commit through the manifest machinery
    t0 = time.perf_counter()
    sink = KeyedUpsertSink(
        _fresh_dir("probe-pairs"), ["id_a", "id_b"], ["jac_e4"], num_buckets=8
    )
    sink(pairs, batch_id=0)
    stages["merge_commit_s"] = round(time.perf_counter() - t0, 1)
    sink.close()
    sig.unpersist()
    cand.unpersist()
    pairs.unpersist()

    print(
        json.dumps(
            {
                "probe": "pairs100x",
                "factor": factor,
                "sf_dir": sf_dir,
                "synth_s": synth_s,
                "n_docs": n_docs,
                "n_sig": n_sig,
                "n_candidates": n_cand,
                "n_pairs": n_pairs,
                "stages": stages,
                "total_s": round(sum(stages.values()), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
