"""Densified-corpus ladder for the CAPPED incremental near-dup kernel
(r15, VERDICT r14 item 1's 'done' criterion): the probe the uncapped
q309 kernel FAILED — identical-text replicas (no salting: this is the
boilerplate-heavy degenerate case, the opposite of probe_pairs100x's
content-scaling law) concentrate f-times the duplication mass into the
same buckets, so uncapped bucket depth grows with f and pair mass grows
quadratically (r14 measured 14.9 -> 57.2 s at 10x).

Per factor f in the ladder this measures, with the SAME CappedLshIndex
machinery q312 grades:

  base_ingest_s   ingest the f-times densified corpus (step 0) — capped
                  pair mass is O(cap x bucket depth), so this must stay
                  <= linear per decade;
  shard_ingest_s  ingest a FIXED 200-doc shard of base texts with fresh
                  (larger) ids (step 1) — the crawl steady state. Probe
                  cost is O(cap) per band row and the fresh ids never
                  enter top-cap, so this must stay ~FLAT as f grows:
                  per-shard cost must not depend on how degenerate the
                  accumulated corpus is;
  n_cand_live     live candidate rows after both steps (vs the UNCAPPED
                  candidate count on the same corpus, for contrast).

Usage: python scripts/probe_cap10x.py [factors]   # default 1,3,10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def densify(spark, sf_dir: str, factor: int):
    """f identical-text replicas with offset ids — the degenerate crawl."""
    from pyspark.sql import functions as F

    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.datagen import KEY_OFFSET

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if factor == 1:
        return docs
    rep = docs.crossJoin(
        F.broadcast(spark.range(factor).withColumnRenamed("id", "__rep"))
    )
    return (
        rep.withColumn("doc_id", F.col("doc_id") + F.col("__rep") * KEY_OFFSET)
        .drop("__rep")
        .select("doc_id", "text")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.datagen import KEY_OFFSET
    from pandas_streaming_spark.operators.dedup import (
        CappedLshIndex,
        lsh_candidate_pairs,
    )
    from pandas_streaming_spark.session import get_spark
    from pandas_streaming_spark.streaming.replay import _fresh_dir

    factors = (
        [int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1 else [1, 3, 10]
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe_cap10x")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the fixed probe shard: 200 base texts under fresh ids far above
    # every replica id — a new crawl day hitting the hottest buckets
    shard = (
        base.orderBy("doc_id")
        .limit(200)
        .withColumn("doc_id", F.col("doc_id") + F.lit(1000 * KEY_OFFSET))
        .localCheckpoint(eager=True)
    )

    results = []
    for f in factors:
        corpus = densify(spark, sf_dir, f).localCheckpoint(eager=True)
        n_docs = corpus.count()
        # materialize the union: a raw union-of-checkpoints feeding the
        # verify joins trips an AQE partition-count edge ('Can't zip
        # RDDs', 32 vs 64) — the graded q312 path reads one parquet
        # table and never sees this shape
        lookup = corpus.unionByName(shard).repartition(32).localCheckpoint(
            eager=True
        )
        idx = CappedLshIndex(_fresh_dir(f"cap10x-{f}"), cap=2)
        try:
            t0 = time.perf_counter()
            idx.ingest(corpus, 0, docs_lookup=lookup)
            base_s = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            idx.ingest(shard, 1, docs_lookup=lookup)
            shard_s = round(time.perf_counter() - t0, 1)
            n_cand = (
                idx.cands.read(spark).select("id_a", "id_b").distinct().count()
            )
            n_pairs = idx.pairs(spark, 8000).count()
        finally:
            idx.close()
        # contrast: the UNCAPPED candidate mass on the same corpus
        # (count only — this is the quantity that grows quadratically)
        n_unc = lsh_candidate_pairs(
            corpus, n_hashes=8, bands=4, k=3, max_bucket=None
        ).count()
        results.append(
            {
                "factor": f,
                "n_docs": n_docs,
                "base_ingest_s": base_s,
                "shard_ingest_s": shard_s,
                "n_cand_live": n_cand,
                "n_pairs_08": n_pairs,
                "n_cand_uncapped": n_unc,
            }
        )
        print(json.dumps(results[-1]), flush=True)

    r0, rN = results[0], results[-1]
    data_ratio = rN["n_docs"] / r0["n_docs"]
    print(
        json.dumps(
            {
                "probe": "cap10x",
                "sf_dir": sf_dir,
                "ladder": results,
                "base_ingest_growth": round(
                    rN["base_ingest_s"] / max(r0["base_ingest_s"], 0.1), 2
                ),
                "shard_ingest_growth": round(
                    rN["shard_ingest_s"] / max(r0["shard_ingest_s"], 0.1), 2
                ),
                "capped_cand_growth": round(
                    rN["n_cand_live"] / max(r0["n_cand_live"], 1), 2
                ),
                "uncapped_cand_growth": round(
                    rN["n_cand_uncapped"] / max(r0["n_cand_uncapped"], 1), 2
                ),
                "data_ratio": round(data_ratio, 2),
                "linear_ok": rN["base_ingest_s"]
                <= data_ratio * max(r0["base_ingest_s"], 0.5) * 1.25,
            }
        )
    )


if __name__ == "__main__":
    main()
