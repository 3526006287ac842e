"""Property tests for the second round-5 batch: continuous-aggregate
merge algebra, A-Res weighted sampling, and the full-outer stream join's
split invariance."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from pandas_streaming_spark.operators.rollup import (
    rollup_merge,
    time_rollup,
)
from pandas_streaming_spark.operators.sampling import weighted_sample_topk


def test_rollup_merge_equals_direct(spark, sf_dir):
    """merge(hourly) == direct daily rollup, in-engine (q143 pins it
    cross-engine): the decomposable-partials contract."""
    from pandas_streaming_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    via_hourly = rollup_merge(
        time_rollup(ev, "ts", "hour", ["event_type"], "cents"), "day", ["event_type"]
    )
    direct = time_rollup(ev, "ts", "day", ["event_type"], "cents")
    cols = ["bucket_ts", "event_type", "cnt", "sum_v", "min_v", "max_v"]
    a = sorted(map(tuple, via_hourly.select(*cols).collect()))
    b = sorted(map(tuple, direct.select(*cols).collect()))
    assert a == b


def test_rollup_merge_is_grain_transitive(spark, sf_dir):
    """hour → day → month == hour → month: merge composes."""
    from pandas_streaming_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    hourly = time_rollup(ev, "ts", "hour", [], "cents")
    two_step = rollup_merge(rollup_merge(hourly, "day", []), "month", [])
    one_step = rollup_merge(hourly, "month", [])
    cols = ["bucket_ts", "cnt", "sum_v", "min_v", "max_v"]
    assert sorted(map(tuple, two_step.select(*cols).collect())) == sorted(
        map(tuple, one_step.select(*cols).collect())
    )


def _ares_key(doc_id: int, w: int) -> float:
    u = (int(hashlib.md5(str(doc_id).encode()).hexdigest()[:7], 16) + 1.0) / (1 << 28)
    return u ** (1.0 / w)


def test_weighted_sample_matches_reference(spark):
    """Selection == a pure-Python A-Res over the same content hashes."""
    rng = random.Random(2)
    rows = [(i, rng.randrange(1, 500)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sorted(
        r["doc_id"]
        for r in weighted_sample_topk(df, "doc_id", "w", k=25).collect()
    )
    want = sorted(
        i for i, _ in sorted(rows, key=lambda r: (-_ares_key(r[0], r[1]), r[0]))[:25]
    )
    assert got == want


def test_weighted_sample_prefers_heavy_weights(spark):
    """An item with overwhelming weight must be selected; k >= n keeps
    everything; k <= 0 rejects."""
    rows = [(i, 1) for i in range(199)] + [(999, 10**9)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = {
        r["doc_id"] for r in weighted_sample_topk(df, "doc_id", "w", k=10).collect()
    }
    assert 999 in picked
    assert weighted_sample_topk(df, "doc_id", "w", k=500).count() == 200
    with pytest.raises(ValueError):
        weighted_sample_topk(df, "doc_id", "w", k=0)


@pytest.mark.parametrize("k", [1, 8])
def test_stream_full_outer_split_invariance(spark, sf_dir, k):
    """q142's full-outer interval join must converge to the batch FULL
    OUTER join for any micro-batch split (q142 grades k=5 vs duckdb)."""
    import pandas_streaming_spark.queries.stream_upsert_q as su
    import pandas_streaming_spark.queries.streaming_q as sq

    orig = sq.K_BATCHES
    sq.K_BATCHES = k
    try:
        got = sorted(map(tuple, sq.q142_stream_full_outer(spark, sf_dir).collect()))
    finally:
        sq.K_BATCHES = orig
    from pandas_streaming_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    j = p.join(
        c,
        (F.col("pu") == F.col("cu"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("cts") <= F.col("pts")),
        "full_outer",
    ).select(
        F.coalesce("pu", "cu").alias("user_id"), "purchase_id", "click_id"
    )
    want = sorted(
        map(
            tuple,
            j.groupBy("user_id")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(
                    F.when(
                        F.col("purchase_id").isNotNull()
                        & F.col("click_id").isNotNull(),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("n_both"),
                F.sum(F.when(F.col("click_id").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_purchase_only"),
                F.sum(F.when(F.col("purchase_id").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_click_only"),
            )
            .orderBy("user_id")
            .collect(),
        )
    )
    assert got == want


@pytest.mark.parametrize("k", [1, 8])
def test_streaming_rollup_view_split_invariance(spark, sf_dir, k):
    """q151's materialized view must equal the batch rollup for any
    split (q151 grades k=5 vs duckdb)."""
    import pandas_streaming_spark.queries.stream_upsert_q as su
    import pandas_streaming_spark.queries.streaming_q as sq

    orig = sq.K_BATCHES
    sq.K_BATCHES = k
    try:
        got = sorted(
            map(tuple, su.q151_streaming_rollup_view(spark, sf_dir).collect())
        )
    finally:
        sq.K_BATCHES = orig
    from pandas_streaming_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100, 0).cast("long")
    )
    want = sorted(
        map(
            tuple,
            ev.groupBy(
                F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm").alias(
                    "hour"
                ),
                "event_type",
            )
            .agg(
                F.count("*").alias("n"),
                (F.sum("cents") / 100.0).alias("sum_value"),
            )
            .orderBy("hour", "event_type")
            .collect(),
        )
    )
    assert got == want


def test_interval_overlap_matches_theta_join(spark):
    """Bucketized overlap join == the naive theta join on random
    intervals (including multi-bucket spans and exact boundary
    touches), with and without equality keys."""
    import datetime as dt

    from pandas_streaming_spark.operators.intervals import interval_overlap_join

    rng = random.Random(13)
    base = dt.datetime(2024, 1, 1)

    def mk(n, key_space):
        rows = []
        for i in range(n):
            s = base + dt.timedelta(minutes=rng.randrange(0, 5000))
            e = s + dt.timedelta(minutes=rng.randrange(0, 200))
            rows.append((i, rng.randrange(key_space), s, e))
        return rows

    a_rows, b_rows = mk(80, 3), mk(60, 3)
    a = spark.createDataFrame(a_rows, "a_id long, k long, a_s timestamp, a_e timestamp")
    b = spark.createDataFrame(
        [(i, k, s, e) for i, k, s, e in b_rows],
        "b_id long, k long, b_s timestamp, b_e timestamp",
    )
    got = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b.drop("k"), "a_s", "a_e", "b_s", "b_e"
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, _, s1, e1 in a_rows
        for j, _, s2, e2 in b_rows
        if s1 <= e2 and s2 <= e1
    )
    assert got == want
    # keyed variant
    got_k = sorted(
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            a, b, "a_s", "a_e", "b_s", "b_e", on=["k"]
        ).collect()
    )
    want_k = sorted(
        (i, j)
        for i, k1, s1, e1 in a_rows
        for j, k2, s2, e2 in b_rows
        if k1 == k2 and s1 <= e2 and s2 <= e1
    )
    assert got_k == want_k


def test_interval_overlap_plan_and_ambiguity(spark):
    """The join must be a hash join on the bucket (no BNLJ/cartesian),
    and ambiguous non-key columns are rejected."""
    import datetime as dt

    import pytest as _pytest

    from pandas_streaming_spark.operators.intervals import interval_overlap_join
    from pandas_streaming_spark.plans import join_strategies

    base = dt.datetime(2024, 1, 1)
    a = spark.createDataFrame(
        [(1, base, base + dt.timedelta(hours=2))], "a_id long, a_s timestamp, a_e timestamp"
    )
    b = spark.createDataFrame(
        [(2, base, base + dt.timedelta(hours=1))], "b_id long, b_s timestamp, b_e timestamp"
    )
    strategies = join_strategies(
        interval_overlap_join(a, b, "a_s", "a_e", "b_s", "b_e")
    )
    assert "CartesianProduct" not in strategies
    assert "BroadcastNestedLoopJoin" not in strategies, strategies
    with _pytest.raises(ValueError, match="ambiguous"):
        interval_overlap_join(
            a, a.withColumnRenamed("a_s", "x"), "a_s", "a_e", "x", "a_e"
        )


def test_interval_overlap_drops_empty_intervals(spark):
    """end < start is an empty interval: excluded, not a task crash."""
    import datetime as dt

    from pandas_streaming_spark.operators.intervals import interval_overlap_join

    base = dt.datetime(2024, 1, 1)
    a = spark.createDataFrame(
        [
            (1, base, base - dt.timedelta(hours=2)),  # reversed -> dropped
            (2, base, base + dt.timedelta(minutes=30)),
        ],
        "a_id long, a_s timestamp, a_e timestamp",
    )
    b = spark.createDataFrame(
        [(9, base, base + dt.timedelta(hours=1))],
        "b_id long, b_s timestamp, b_e timestamp",
    )
    got = [(r["a_id"], r["b_id"]) for r in interval_overlap_join(
        a, b, "a_s", "a_e", "b_s", "b_e").collect()]
    assert got == [(2, 9)]


def test_weighted_sample_nonpositive_weights_never_selected(spark):
    """weight <= 0 ⇒ P(selected) = 0 — not inverted-key-first (the
    u^(1/-w) >= 1 trap) and no ANSI divide-by-zero for w = 0."""
    rows = [(i, 10) for i in range(20)] + [(100, -5), (101, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = {
        r["doc_id"] for r in weighted_sample_topk(df, "doc_id", "w", k=20).collect()
    }
    assert picked == set(range(20))
    # only over-asking k brings them in, and then ranked LAST
    allr = {
        r["doc_id"]: r["__ares_rank"]
        for r in weighted_sample_topk(df, "doc_id", "w", k=22).collect()
    }
    assert allr[100] > 20 and allr[101] > 20
