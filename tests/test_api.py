"""Facade tests: the streamz-style StreamingFrame surface lowers to
correct Spark plans, batch and streaming (SURVEY.md §1.1/§2.2–2.5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pandas_streaming_spark.api import wrap
from pandas_streaming_spark.catalog import load_table


def test_projection_and_mask(spark, sf_dir):
    sdf = wrap(load_table(spark, sf_dir, "orders"))
    out = sdf[sdf["o_totalprice"] > 400000][["o_orderkey", "o_totalprice"]]
    rows = out.collect()
    assert all(r["o_totalprice"] > 400000 for r in rows)


def test_groupby_agg_matches_sql(spark, sf_dir):
    sdf = wrap(load_table(spark, sf_dir, "orders"))
    got = (
        sdf.groupby("o_orderpriority")
        .agg(n=("o_orderkey", "count"), total=("o_totalprice", "sum"))
        .df.orderBy("o_orderpriority")
        .toPandas()
    )
    exp = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("o_orderkey").alias("n"), F.sum("o_totalprice").alias("total"))
        .orderBy("o_orderpriority")
        .toPandas()
    )
    pd.testing.assert_frame_equal(got, exp)


def test_rolling_matches_pandas(spark, sf_dir):
    sdf = wrap(load_table(spark, sf_dir, "events"))
    got = (
        sdf.rolling(3, order_by="event_id", partition_by="user_id")
        .agg(msum=("value", "sum"))
        .df.select("user_id", "event_id", "msum")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "event_id"])
    )
    exp = ev.assign(
        msum=ev.groupby("user_id")["value"].transform(
            lambda s: s.rolling(3, min_periods=1).sum()
        )
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["user_id", "event_id", "msum"]],
        exp[["user_id", "event_id", "msum"]],
        check_dtype=False,
        atol=1e-9,
    )


def test_global_window_warns(spark, sf_dir):
    """No partition key -> single-partition global sort: allowed (pandas
    parity) but must warn loudly so it never ships silently at scale."""
    import pytest

    sdf = wrap(load_table(spark, sf_dir, "events"))
    with pytest.warns(UserWarning, match="single-partition global sort"):
        sdf.rolling(3, order_by="event_id")
    with pytest.warns(UserWarning, match="single-partition global sort"):
        sdf.cumulative("value", "sum", order_by="event_id")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # partitioned forms stay silent
        sdf.rolling(3, order_by="event_id", partition_by="user_id")
        sdf.cumulative("value", "sum", order_by="event_id", partition_by="user_id")


def test_map_partitions(spark, sf_dir):
    sdf = wrap(load_table(spark, sf_dir, "documents"))

    def add_len(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": pdf.doc_id, "text_len": pdf.text.str.len()})

    out = sdf[["doc_id", "text"]].map_partitions(add_len, "doc_id long, text_len long")
    row = out.df.filter(F.col("doc_id") == 0).collect()[0]
    expected = len(
        load_table(spark, sf_dir, "documents").filter("doc_id = 0").collect()[0]["text"]
    )
    assert row["text_len"] == expected


def test_combine_latest_is_asof(spark):
    import datetime

    t = datetime.datetime
    left = wrap(
        spark.createDataFrame(
            [(1, t(2024, 1, 1, 12))], "k long, lt timestamp"
        )
    )
    right = wrap(
        spark.createDataFrame(
            [(1, t(2024, 1, 1, 10), 7.0, 1), (1, t(2024, 1, 1, 13), 9.0, 2)],
            "k long, rt timestamp, v double, ord long",
        )
    )
    out = left.combine_latest(
        right, key="k", left_time="lt", right_time="rt",
        value_cols=["v"], right_ord="ord",
    ).collect()
    assert out[0]["v"] == 7.0  # latest value known at left's time, not the future one


def test_value_counts_and_distinct(spark, sf_dir):
    sdf = wrap(load_table(spark, sf_dir, "events"))
    vc = {r["event_type"]: r["count"] for r in sdf.value_counts("event_type").collect()}
    assert sum(vc.values()) == load_table(spark, sf_dir, "events").count()
    assert sdf.distinct(["event_type"]).df.count() == len(vc)


def test_streaming_accumulate_roundtrip(spark, sf_dir):
    """accumulate() on a real stream == batch groupBy (the reference's
    core invariant, through the facade)."""
    from pandas_streaming_spark.operators.stateful import (
        RUNNING_STATS_OUT,
        RUNNING_STATS_STATE,
        running_user_stats,
    )
    from pandas_streaming_spark.streaming.replay import (
        replay_events,
        run_stream_to_final,
        write_replay_batches,
    )

    replay_dir = write_replay_batches(spark, sf_dir, 3)
    stream = replay_events(spark, sf_dir, replay_dir)
    out = run_stream_to_final(running_user_stats(stream), "update", ["user_id"])
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
        .toPandas()
    )
    merged = out.merge(batch, on="user_id", suffixes=("_s", "_b"))
    assert len(merged) == len(batch)
    assert (merged.n_events_s == merged.n_events_b).all()
    assert (merged.max_value_s == merged.max_value_b).all()


def test_pivot_melt_roundtrip(spark, sf_dir):
    """pivot_table then melt recovers the grouped aggregation (NULL cells
    from empty combinations dropped on both sides)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    wide = wrap(ev).pivot_table(
        "user_id", "event_type", "value", aggfunc="sum", col_values=types
    )
    long = (
        wrap(wide.df)
        .melt(["user_id"], types, var_name="event_type", value_name="sv")
        .df.filter(F.col("sv").isNotNull())
    )
    exp = ev.groupBy("user_id", "event_type").agg(F.sum("value").alias("sv"))
    key = lambda df: sorted(
        (r["user_id"], r["event_type"], round(r["sv"], 6)) for r in df.collect()
    )
    assert key(long) == key(exp)


def test_fillna_dropna_describe(spark):
    from pandas_streaming_spark.api import wrap

    df = wrap(
        spark.createDataFrame(
            [(1, 2.0), (2, None), (None, 4.0)], "a int, b double"
        )
    )
    assert df.fillna(0).filter(F.col("b") == 0).collect()[0]["a"] == 2
    assert df.dropna().df.count() == 1
    assert df.dropna(subset=["b"]).df.count() == 2
    desc = {r["summary"]: r for r in df.describe("b").collect()}
    assert desc["count"]["b"] == "2"
    assert float(desc["max"]["b"]) == 4.0


def test_pandas_names_sort_head_nlargest(spark):
    from pandas_streaming_spark.api import wrap
    from pandas_streaming_spark.plans import physical_plan

    df = wrap(
        spark.createDataFrame(
            [(i, float((i * 37) % 11)) for i in range(20)], "k long, v double"
        )
    )
    top = df.nlargest(3, "v").collect()
    assert [r["v"] for r in top] == sorted([float((i * 37) % 11) for i in range(20)], reverse=True)[:3]
    # nlargest must compile to the top-k operator, not a global sort
    assert "TakeOrderedAndProject" in physical_plan(df.nlargest(3, "v").df)
    assert df.head(4).df.count() == 4
    sv = df.sort_values("v", ascending=False).collect()
    assert [r["v"] for r in sv] == sorted((r["v"] for r in sv), reverse=True)
    ren = df.rename({"k": "id"}).df
    assert ren.columns == ["id", "v"]
    assert df.drop_duplicates(["v"]).df.count() == 11


def test_sample_is_content_addressed(spark, sf_dir):
    from pandas_streaming_spark.api import wrap
    from pandas_streaming_spark.catalog import load_table

    docs = wrap(load_table(spark, sf_dir, "documents"))
    a = sorted(r["doc_id"] for r in docs.sample(0.2, "doc_id").df.select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in docs.sample(0.2, "doc_id")
        .df.repartition(7)
        .select("doc_id")
        .collect()
    )
    assert a == b and 0 < len(a) < docs.df.count()
    # frac with no whole-percent representation (or an empty snap) is
    # refused rather than silently rounded
    import pytest

    for bad in (0.005, 0.015, 0.0, 1.5, -0.1):
        with pytest.raises(ValueError, match="granularity|multiple"):
            docs.sample(bad, "doc_id")


def test_facade_sketch_and_sampling_methods(spark, sf_dir):
    """Round-5 facade additions: prune_to preserves the join, HLL
    nunique lands in its error band, heavy_hitters covers the true top,
    weighted_sample respects k, rollup_time partials sum to the raw
    totals."""
    from pandas_streaming_spark.api import wrap
    from pandas_streaming_spark.catalog import load_table
    from pyspark.sql import functions as F

    ev = wrap(load_table(spark, sf_dir, "events"))
    docs = wrap(load_table(spark, sf_dir, "documents"))

    # prune_to: pruned join == plain join
    part = wrap(load_table(spark, sf_dir, "part").where(F.col("p_size") <= 5))
    li = wrap(load_table(spark, sf_dir, "lineitem"))
    plain = li.df.join(part.df, li.df["l_partkey"] == part.df["p_partkey"]).count()
    pruned = (
        li.prune_to(part, "l_partkey", "p_partkey")
        .df.join(part.df, F.col("l_partkey") == F.col("p_partkey"))
        .count()
    )
    assert pruned == plain

    # nunique_approx within the m=64 band vs exact
    est = ev.nunique_approx("user_id").df.collect()[0]["hll_est"]
    exact = ev.df.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.52

    # heavy_hitters: top-3 estimated tokens all have est >= their true count
    tok = wrap(
        docs.df.select(F.explode(F.split("text", " ")).alias("t")).where(
            F.col("t") != ""
        )
    )
    hh = tok.heavy_hitters("t", k=3).df.collect()
    true = {
        r["t"]: r["n"]
        for r in tok.df.groupBy("t").agg(F.count("*").alias("n")).collect()
    }
    assert len(hh) == 3 and all(r["cms_est"] >= true[r["t"]] for r in hh)

    # weighted_sample: k rows per group, no helper column leaked
    ws = docs.weighted_sample("doc_id", "n_chars", k=5, by="lang")
    assert "__ares_rank" not in ws.df.columns
    per = {r["lang"]: r["n"] for r in ws.df.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(v == 5 for v in per.values())

    # rollup_time: partial sums reproduce the raw total
    cents = wrap(ev.df.withColumn("c", F.round(F.col("value") * 100, 0).cast("long")))
    partials = cents.rollup_time("ts", "hour", ["event_type"], "c")
    assert (
        partials.df.agg(F.sum("sum_v")).collect()[0][0]
        == cents.df.agg(F.sum("c")).collect()[0][0]
    )
