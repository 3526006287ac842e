"""10×-scale probe of the round-5 continuation operators (the
scale_notes "r5 ops at 10×" protocol): synthesize a 10× replica of
$SPARK_GRAFT_SF_DIR (default sf0.1) into .scratch, run each new
operator once warm, and print per-query wall seconds + the growth
factor vs a 1× warm run. Usage:

    python scripts/probe10x.py [q134 q135 ...]   # default: the r5b set
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "q130_regression_stats",
    "q131_mode_bitagg",
    "q133_autocorr",
    "q134_bloom_prune",
    "q135_cms_heavy_hitters",
    "q136_zipf_slope",
    "q137_triangle_count",
    "q138_pagerank_nations",
    "q139_token_entropy",
    "q141_hll_distinct",
    "q143_rollup_reuse",
    "q144_weighted_sample",
    "q145_cohort_retention",
    "q146_bm25",
    "q149_scd2_history",
    "q150_path_transitions",
]


def main() -> None:
    from pandas_streaming_spark.datagen import scale_dataset
    from pandas_streaming_spark.queries import QUERIES
    from pandas_streaming_spark.session import get_spark
    from pandas_streaming_spark.streaming.replay import SCRATCH

    resolved = []
    for n in sys.argv[1:] or DEFAULT:
        matches = [k for k in QUERIES if k == n] or [
            k for k in QUERIES if k.startswith(n)
        ]
        if len(matches) != 1:
            raise SystemExit(
                f"{'unknown' if not matches else 'ambiguous'} query {n!r}"
                + (f": {matches}" if matches else "")
            )
        resolved.append(matches[0])
    names = resolved
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe10x")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = os.path.join(
        SCRATCH, f"scaled-{os.path.basename(sf_dir.rstrip('/'))}-x10"
    )
    scale_dataset(spark, sf_dir, scaled, 10)
    out = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()  # warm 1x
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        one = time.perf_counter() - t0
        fn(spark, scaled).collect()  # warm 10x
        t0 = time.perf_counter()
        fn(spark, scaled).collect()
        ten = time.perf_counter() - t0
        out[name] = {
            "x1_s": round(one, 2),
            "x10_s": round(ten, 2),
            "growth": round(ten / one, 1) if one > 0 else None,
        }
        print(name, out[name], flush=True)
    print(json.dumps({"probe": "10x", "sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
