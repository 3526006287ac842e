#!/usr/bin/env python
"""Dump explain('formatted') for named queries to plans/r16/<name>_<tag>.txt.

Usage: python scripts/dump_plans.py <code_root> <tag> <q1,q2,...> [sf_dir]
(code_root lets the r16 before/after pair come from the baseline
worktree vs the working tree; plans always land in THIS repo's
plans/r16/.)
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    code_root, tag, qlist = sys.argv[1:4]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.001"
    sys.path.insert(0, code_root)

    from pandas_streaming_spark.queries import QUERIES
    from pandas_streaming_spark.session import get_spark

    spark = get_spark(app_name=f"dump-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for name in qlist.split(","):
        if name not in QUERIES:
            raise SystemExit(f"unknown query {name!r} (exact names only)")
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        print("wrote", path, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
