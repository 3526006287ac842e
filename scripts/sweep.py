#!/usr/bin/env python
"""Full-registry verification sweep: every `__spark_entry__.queries()`
entry vs its duckdb oracle, printing one line per query and a final
TOTAL FAILS count (exit status follows it).

Usage:
    python scripts/sweep.py /root/testdata/sf0.01 small   # plain local[4],
                                                          # 3 shuffle partitions
                                                          # (driver/verify shape)
    python scripts/sweep.py /root/testdata/sf0.1          # tuned local[32]
    python scripts/sweep.py <sf_dir> small q146,q199      # only entries whose
                                                          # name starts with a
                                                          # listed prefix

The `small` mode is the partitioning-invariance axis: a plain un-tuned
SparkSession with tiny parallelism must produce byte-identical graded
results (catches session-conf assumptions and partition-order leaks).
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    small = len(sys.argv) > 2 and sys.argv[2] == "small"
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    if small:
        os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
        # before the JVM: TWS workers inherit the launch-time env
        from pandas_streaming_spark.compat import ensure_protobuf

        ensure_protobuf()
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .config("spark.sql.shuffle.partitions", "3")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from pandas_streaming_spark.session import get_spark

        spark = get_spark("registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod
    from pandas_streaming_spark.compare import compare_frames, duckdb_connect

    qs, osql = mod.queries(), mod.oracle_sql()
    con = duckdb_connect(sf_dir)
    fails = 0
    for name, fn in qs.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        try:
            if name not in osql:
                print(name, "rows-only:", fn(spark, sf_dir).count(), flush=True)
                continue
            r = compare_frames(
                name, fn(spark, sf_dir).toPandas(), con.execute(osql[name]).df()
            )
            if not r.ok:
                fails += 1
            print(name, "OK" if r.ok else "FAIL " + r.detail[:200], flush=True)
        except Exception as e:  # a crashing query must not stop the sweep
            fails += 1
            print(name, "ERR", f"{type(e).__name__}: {e}"[:200], flush=True)
    print("TOTAL FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
