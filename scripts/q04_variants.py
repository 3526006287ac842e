#!/usr/bin/env python
"""r15 q04 join-order experiment: same-JVM interleaved A/B/C timing.

A = shipped shape: (c >< o) >< li >< n >< r, filter ASIA at the end;
    statically broadcasts the 600k-row lineitem projection (BuildRight).
B = dim-first: (c >< n >< r, filter ASIA) -> orders -> lineitem, no new
    hints; strategy left to threshold + AQE (scale-adaptive).
C = B with the lineitem join pinned shuffle_hash on the (orders><dim)
    build side: the fact is never a broadcast build at any scale.

All three are verified row-identical before timing.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def qA(spark):
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    n = F.broadcast(load_table(spark, SF, "nation"))
    r = F.broadcast(load_table(spark, SF, "region"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def _dim_orders(spark):
    c = load_table(spark, SF, "customer")
    o = load_table(spark, SF, "orders")
    n = F.broadcast(load_table(spark, SF, "nation"))
    r = F.broadcast(load_table(spark, SF, "region"))
    dim = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey", "n_name")
    )
    return o.join(dim, o.o_custkey == dim.c_custkey).select("o_orderkey", "n_name")


def _agg(joined):
    return (
        joined.groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def qB(spark):
    li = load_table(spark, SF, "lineitem")
    co = _dim_orders(spark)
    return _agg(li.join(co, li.l_orderkey == co.o_orderkey))


def qC(spark):
    li = load_table(spark, SF, "lineitem")
    co = _dim_orders(spark)
    return _agg(li.join(co.hint("shuffle_hash"), li.l_orderkey == co.o_orderkey))


def main() -> int:
    rounds = int(os.environ.get("ROUNDS", "7"))
    spark = get_spark(app_name="q04-variants")
    spark.sparkContext.setLogLevel("ERROR")
    variants = {"A": qA, "B": qB, "C": qC}
    ref = {tuple(r) for r in qA(spark).collect()}
    for k, fn in variants.items():
        got = {tuple(r) for r in fn(spark).collect()}
        assert got == ref, f"variant {k} differs"
    print("all variants row-identical", flush=True)
    times = {k: [] for k in variants}
    for k, fn in variants.items():  # warm
        fn(spark).write.format("noop").mode("overwrite").save()
    for i in range(rounds):
        for k, fn in variants.items():
            spark.sparkContext.setJobDescription(f"q04 variant {k} round {i}")
            t0 = time.perf_counter()
            fn(spark).write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        print(f"{k}: med {statistics.median(ts):.3f} min {min(ts):.3f} max {max(ts):.3f} all {[round(t,2) for t in ts]}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
