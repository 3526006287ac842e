#!/usr/bin/env python
"""Round-16 optimization measurement harness (measure_r15 successor).

For each given query (default: the bench HEADLINE list) at
$SPARK_GRAFT_SF_DIR:

- captures ``explain('formatted')`` to plans/r16/<name>_<tag>.txt
- times N noop-sink runs (guide §1.4: computes every column, discards;
  no driver materialization cost) and N arrow-materialized runs (the
  bench's own protocol) and prints medians side by side, so the
  "engine time" vs "bench-visible time" split is explicit per query.

r16 vs r15: exact query-name matching (ADVICE r15 — 'q18' silently
expanded to q181/q183/q185/...); a deliberate prefix must end '_'.

Usage:
    python scripts/measure_r16.py before                    # headline set
    python scripts/measure_r16.py before q254_poisson_bootstrap,q137_triangle_count
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEADLINE = [
    "q01_pricing_summary", "q04_star_join_revenue", "q11_asof_join",
    "q14_count_distinct", "q21_topk_per_group", "q27_global_topk",
    "q34_date_trunc_tumbling", "q39_similarity_topk", "q40_top_tokens",
    "q50_lsh_candidate_pairs", "q81_tfidf", "q84_chunk_documents",
    "q88_salted_hot_key", "q94_funnel",
]


def select_names(queries, only: list[str] | None) -> list[str]:
    if not only:
        return HEADLINE
    names: list[str] = []
    for p in only:
        if p in queries:
            hits = [p]
        elif p.endswith("_"):
            hits = [n for n in queries if n.startswith(p)]
            if len(hits) > 1:
                print(f"WARNING: prefix {p!r} matched {len(hits)} queries:"
                      f" {hits}", file=sys.stderr)
        else:
            raise SystemExit(
                f"unknown query {p!r} (exact names only; a deliberate "
                f"prefix must end with '_')"
            )
        names.extend(h for h in hits if h not in names)
    return names


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    n_runs = int(os.environ.get("MEASURE_RUNS", "5"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pandas_streaming_spark.queries import QUERIES
    from pandas_streaming_spark.session import get_spark

    spark = get_spark(app_name="measure-r16")
    spark.sparkContext.setLogLevel("ERROR")

    names = select_names(QUERIES, only)
    plans_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(plans_dir, exist_ok=True)

    print(f"{'query':34s} {'noop_med':>9s} {'arrow_med':>9s} {'min':>7s} {'max':>7s}")
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
        spark.sparkContext.setJobDescription(f"{name} [{tag}] warm")
        df.write.format("noop").mode("overwrite").save()  # warm
        noop_runs = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name} [{tag}] noop {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop_runs.append(time.perf_counter() - t0)
        arrow_runs = []
        for i in range(n_runs):
            spark.sparkContext.setJobDescription(f"{name} [{tag}] arrow {i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            arrow_runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name:34s} {statistics.median(noop_runs):9.3f}"
            f" {statistics.median(arrow_runs):9.3f}"
            f" {min(arrow_runs):7.3f} {max(arrow_runs):7.3f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
