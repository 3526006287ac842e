"""Scale-path operators: salting equivalence + bucketed co-located joins
(SURVEY.md §4.2 item 6 / plans/scale_notes.md).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.operators.skew import salted_groupby, salted_join


def test_salted_groupby_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = (
        salted_groupby(
            li,
            ["l_returnflag"],
            {
                "total_qty": ("l_quantity", "sum"),
                "n": ("l_quantity", "count"),
                "avg_price": ("l_extendedprice", "avg"),
                "max_tax": ("l_tax", "max"),
            },
            salt=8,
        )
        .orderBy("l_returnflag")
        .toPandas()
    )
    exp = (
        li.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.count("l_quantity").alias("n"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.max("l_tax").alias("max_tax"),
        )
        .orderBy("l_returnflag")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, exp, check_exact=False, atol=1e-6)


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    fact = orders.withColumnRenamed("o_custkey", "c_custkey")
    got = (
        salted_join(fact, cust, key="c_custkey", salt=4)
        .groupBy("c_nationkey")
        .count()
        .orderBy("c_nationkey")
        .toPandas()
    )
    exp = (
        fact.join(cust, on="c_custkey")
        .groupBy("c_nationkey")
        .count()
        .orderBy("c_nationkey")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, exp)


def test_salted_join_rejects_outer(spark, sf_dir):
    """Right/full outer would emit unmatched dim rows once per salt
    replica — the API refuses rather than silently duplicating."""
    import pytest

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    fact = orders.withColumnRenamed("o_custkey", "c_custkey")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner/left only"):
            salted_join(fact, cust, key="c_custkey", how=how)


def test_bucketed_join_skips_shuffle(spark, sf_dir):
    """Bucketed tables co-locate join keys: the sort-merge join reads
    bucketed scans directly — no Exchange on either side (the layout
    plans/scale_notes.md prescribes for repeated fact-fact joins)."""
    from pandas_streaming_spark.plans import physical_plan

    from pandas_streaming_spark.catalog import write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    b_orders = write_bucketed(
        spark, orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"]
    )
    b_li = write_bucketed(
        spark, li, "b_lineitem", ["l_orderkey"], 8, ["l_orderkey"]
    )
    try:
        joined = (
            b_orders
            .join(b_li, F.col("o_orderkey") == F.col("l_orderkey"))
            .select("o_orderkey", "l_quantity")
        )
        # disable broadcast so the join must pick SMJ over the buckets
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = physical_plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan[:1500]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert joined.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
