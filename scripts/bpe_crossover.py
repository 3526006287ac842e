"""Measure where the UNROLLED BPE training plan stops scaling in merge
count vs the CHECKPOINTED ITERATIVE loop (VERDICT r10 item 5 /
scale_notes "BPE merge-count crossover"): run both forms at
8/16/24/32 merges on $SPARK_GRAFT_SF_DIR (default sf0.01 — the probe is
about PLAN cost, which is corpus-size-independent) and print per-form
wall seconds split into plan-build vs execute.

    python scripts/bpe_crossover.py [8 16 24 32]

The unrolled form (`_bpe_train_chain`, q241's shape) carries every
merge in one lazy plan — analyzer/optimizer cost grows with each
REPLACE + winner subtree even though per-step frames are lazily
checkpointed. The iterative form (`_bpe_train_iterative`, q261's shape)
truncates lineage every 6 merges and pays a per-iteration job-overhead
floor instead. The crossover is where a real 32k-merge vocabulary must
live on the loop form.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pandas_streaming_spark.queries.tokenizer import (
        _bpe_train_chain,
        _bpe_train_iterative,
    )
    from pandas_streaming_spark.session import get_spark

    steps_list = [int(a) for a in sys.argv[1:]] or [8, 16, 24, 32]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="bpe-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: JVM, parquet footer, tokenize path
    _bpe_train_iterative(spark, sf_dir, steps=2, ckpt_every=6)

    out: dict[str, dict] = {}
    for steps in steps_list:
        t0 = time.perf_counter()
        winners, _cur, _dirty = _bpe_train_chain(spark, sf_dir, steps=steps)
        merged = winners[0]
        for wdf in winners[1:]:
            merged = merged.unionByName(wdf)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows_u = merged.collect()
        exec_u = time.perf_counter() - t0

        t0 = time.perf_counter()
        rows_i, _ = _bpe_train_iterative(spark, sf_dir, steps=steps)
        total_i = time.perf_counter() - t0

        assert [(r["step"], r["x"], r["y"], r["cnt"]) for r in rows_u] == [
            (t, x, y, c) for t, x, y, _m, c in rows_i
        ], f"unrolled and iterative merge tables diverge at steps={steps}"
        out[str(steps)] = {
            "unrolled_build_s": round(build, 2),
            "unrolled_exec_s": round(exec_u, 2),
            "unrolled_total_s": round(build + exec_u, 2),
            "iterative_total_s": round(total_i, 2),
        }
        print(steps, out[str(steps)], flush=True)
    print(json.dumps({"probe": "bpe_crossover", "sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
