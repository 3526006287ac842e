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


def test_q11_bucketed_asof_plan_invariants(spark, sf_dir, monkeypatch):
    """VERDICT r5 item 1 pin: above the cost gate, the graded as-of
    query's parallelism must scale with (key x time-bucket), not key
    cardinality. Invariants: exactly ONE key-only exchange (the tiny
    carry-cell frame, |keys| x |buckets| rows) — the big union exchanges
    on (__k, __b); every aggregate is hash-based (max(struct) finals
    would force a SortAggregate = full local sort of the union before
    combining); and no cartesian/BNLJ anywhere."""
    import re

    from pandas_streaming_spark.plans import physical_plan
    from pandas_streaming_spark.queries.tpch import q11_asof_join

    # force the at-scale regime regardless of the test fixture's size
    monkeypatch.setenv("SPARK_GRAFT_ASOF_AUTO_THRESHOLD", "0")
    plan = physical_plan(q11_asof_join(spark, sf_dir))
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    key_only = re.findall(r"hashpartitioning\(__k#\d+L?, \d+\)", plan)
    assert len(key_only) == 1, f"key-only exchanges (want 1 tiny carry): {key_only}"
    assert re.search(r"hashpartitioning\(__k#\d+L?, __b#\d+L?, \d+\)", plan), (
        "big union must exchange on (__k, __b)"
    )


def test_q11_auto_gate_picks_plain_at_small_scale(spark, sf_dir, monkeypatch):
    """VERDICT r6 item 2: below the threshold the cost gate must choose
    the plain key-partitioned plan (no (__k, __b) exchange, no carry
    seeds) — the 1x bench regression this gate exists to undo — and both
    regimes must return identical rows."""
    import re

    from pandas_streaming_spark.compare import normalize
    from pandas_streaming_spark.plans import physical_plan
    from pandas_streaming_spark.queries.tpch import q11_asof_join

    monkeypatch.delenv("SPARK_GRAFT_ASOF_AUTO_THRESHOLD", raising=False)
    plan = physical_plan(q11_asof_join(spark, sf_dir))  # sf fixtures << 128 MB
    assert not re.search(r"hashpartitioning\(__k#\d+L?, __b#\d+L?, \d+\)", plan), (
        "small inputs must take the plain key-partitioned plan"
    )
    plain_pdf = q11_asof_join(spark, sf_dir).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_ASOF_AUTO_THRESHOLD", "0")
    bucketed_pdf = q11_asof_join(spark, sf_dir).toPandas()
    assert normalize(plain_pdf) == normalize(bucketed_pdf)


def test_asof_auto_rejects_malformed_threshold_env(spark, monkeypatch):
    """A malformed SPARK_GRAFT_ASOF_AUTO_THRESHOLD must raise a clear
    configuration error naming the env var, not a bare int() ValueError
    deep inside a graded query (ADVICE r7)."""
    import pytest

    from pandas_streaming_spark.operators.asof import asof_join_auto

    left = spark.createDataFrame([(1, 10.0)], "k long, t double")
    right = spark.createDataFrame([(1, 5.0, 2.0)], "k long, rt double, v double")
    for bad in ("", "128MB", "1e6"):
        monkeypatch.setenv("SPARK_GRAFT_ASOF_AUTO_THRESHOLD", bad)
        with pytest.raises(ValueError, match="SPARK_GRAFT_ASOF_AUTO_THRESHOLD"):
            asof_join_auto(
                left, right, key="k", left_time="t", right_time="rt",
                value_cols=["v"], bucket_seconds=100.0,
            )


def test_asof_auto_unknown_stats_pick_bucketed(spark):
    """Inputs with no usable size statistics (createDataFrame locals
    report huge/unknown) must fall to the bucketed plan — the safe
    direction at scale."""
    import re

    from pandas_streaming_spark.operators.asof import (
        _plan_size_bytes,
        asof_join_auto,
    )
    from pandas_streaming_spark.plans import physical_plan

    left = spark.createDataFrame([(1, 10.0)], "k long, t double")
    right = spark.createDataFrame([(1, 5.0, 2.0)], "k long, rt double, v double")
    est = _plan_size_bytes(left) + _plan_size_bytes(right)
    out = asof_join_auto(
        left, right, key="k", left_time="t", right_time="rt",
        value_cols=["v"], bucket_seconds=100.0,
    )
    if est >= 128 * 1024 * 1024:  # unknown stats -> bucketed shape
        assert re.search(
            r"hashpartitioning\(__k#\d+L?, __b#\d+L?, \d+\)", physical_plan(out)
        )
    assert [(r["k"], r["t"], r["v"]) for r in out.collect()] == [(1, 10.0, 2.0)]


def test_bucketed_asof_differential_vs_plain(spark):
    """asof_join_bucketed == asof_join across the full parameter surface
    on a seeded random dataset with NULL right values and duplicate
    timestamps (the plain operator is itself property-tested against
    pd.merge_asof, so transitivity pins bucketed == pandas)."""
    import random

    import pandas as pd

    from pandas_streaming_spark.operators.asof import asof_join, asof_join_bucketed

    rng = random.Random(20260814)

    def mk(n):
        return pd.DataFrame(
            {
                "k": [rng.randrange(4) for _ in range(n)],
                "t": [
                    pd.Timestamp("2024-01-01")
                    + pd.Timedelta(seconds=rng.randrange(120))
                    for _ in range(n)
                ],
            }
        )

    left = mk(50).rename(columns={"t": "lt"})
    left["lid"] = range(len(left))
    right = mk(70).rename(columns={"t": "rt"})
    right["v"] = [
        None if rng.random() < 0.15 else round(rng.uniform(-10, 10), 3)
        for _ in range(len(right))
    ]
    right["ord"] = range(len(right))
    sl, sr = spark.createDataFrame(left), spark.createDataFrame(right)
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 30.0):
            for exact in (True, False):
                for bucket in (7.0, 45.0):
                    kw = dict(
                        key="k", left_time="lt", right_time="rt",
                        value_cols=["v"], right_ord="ord", direction=direction,
                        tolerance=tol, allow_exact_matches=exact,
                    )
                    a = (
                        asof_join(sl, sr, **kw)
                        .toPandas().sort_values("lid").reset_index(drop=True)
                    )
                    b = (
                        asof_join_bucketed(sl, sr, bucket_seconds=bucket, **kw)
                        .toPandas().sort_values("lid").reset_index(drop=True)
                    )
                    pd.testing.assert_series_equal(
                        a["v"].astype("float64"), b["v"].astype("float64"),
                        check_names=False,
                        obj=f"{direction}/tol={tol}/exact={exact}/bucket={bucket}",
                    )


def test_transparent_bucketed_layout(spark, sf_dir):
    """VERDICT r5 item 2: ensure_bucketed_layout makes load_table serve
    the bucketed copy to every reader — q04's fact-fact join runs with
    ZERO exchanges on the join keys and bit-identical results; dropping
    the layout (or disabling via set_scale_layout) restores the plain
    path; a fresh catalog re-registers from the manifest."""
    import re

    from pandas_streaming_spark import catalog
    from pandas_streaming_spark.plans import physical_plan
    from pandas_streaming_spark.queries.tpch import q04_star_join_revenue

    plain = q04_star_join_revenue(spark, sf_dir).collect()
    try:
        catalog.ensure_bucketed_layout(
            spark, sf_dir, "orders", ["o_orderkey"], 8, ["o_orderkey"]
        )
        catalog.ensure_bucketed_layout(
            spark, sf_dir, "lineitem", ["l_orderkey"], 8, ["l_orderkey"]
        )
        df = q04_star_join_revenue(spark, sf_dir)
        plan = physical_plan(df)
        assert not re.findall(
            r"hashpartitioning\([ol]_orderkey", plan
        ), "fact-fact join must be exchange-free under the bucketed layout"
        assert df.collect() == plain

        # disable flag: plain path must still be reachable and green
        was = catalog.set_scale_layout(False)
        try:
            assert q04_star_join_revenue(spark, sf_dir).collect() == plain
        finally:
            catalog.set_scale_layout(was)

        # fresh-session shape: drop ONLY the catalog entries; the
        # manifest must transparently re-register the external tables
        digest = catalog._layout_digest(sf_dir)
        spark.sql(f"DROP TABLE IF EXISTS pss_b_{digest}_orders")
        spark.sql(f"DROP TABLE IF EXISTS pss_b_{digest}_lineitem")
        assert q04_star_join_revenue(spark, sf_dir).collect() == plain
        assert not re.findall(
            r"hashpartitioning\([ol]_orderkey",
            physical_plan(q04_star_join_revenue(spark, sf_dir)),
        ), "re-registered layout must still serve the exchange-free join"
    finally:
        catalog.drop_bucketed_layout(spark, sf_dir, "orders")
        catalog.drop_bucketed_layout(spark, sf_dir, "lineitem")
    assert q04_star_join_revenue(spark, sf_dir).collect() == plain


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir):
    """The Morton layout must let a stats-based scan skip files on BOTH
    dimensions of a conjunctive predicate — the property a single-key
    sort cannot deliver. Checks the file-level min/max envelopes of the
    cached z-ordered events copy against the graded q161 predicate, and
    contrasts with a ts-only sorted layout whose user_id envelopes are
    unprunable."""
    import datetime as dt

    from pandas_streaming_spark.operators.zorder import (
        file_prune_fraction,
        zordered_events_path,
    )

    zpath = zordered_events_path(spark, sf_dir)
    ranges = {
        "user_id": (100, 260),
        "ts": (
            dt.datetime(2024, 1, 10),
            dt.datetime(2024, 1, 13),
        ),
    }
    frac_z = file_prune_fraction(zpath, ranges)
    assert frac_z < 0.6, f"z-order should skip files on the 2-dim predicate: {frac_z}"
    # single-dimension envelope check: user_id alone must also prune
    frac_user = file_prune_fraction(zpath, {"user_id": ranges["user_id"]})
    assert frac_user < 0.9, frac_user


def test_z_value_is_bijective_and_local(spark):
    """z_value interleaves exactly (bijective on the domain) and is
    monotone along each axis when the other is fixed low-bit-stable —
    pinned on a small exhaustive grid via the Spark expression itself."""
    from pyspark.sql import functions as F

    from pandas_streaming_spark.operators.zorder import z_value

    df = (
        spark.range(16)
        .withColumnRenamed("id", "a")
        .crossJoin(spark.range(16).withColumnRenamed("id", "b"))
        .select("a", "b", z_value(F.col("a"), F.col("b"), bits=4).alias("z"))
    )
    rows = df.collect()
    zs = {r["z"] for r in rows}
    assert len(zs) == 256  # bijective on 4-bit x 4-bit
    by_ab = {(r["a"], r["b"]): r["z"] for r in rows}
    expect = lambda a, b: sum(
        (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))
        for i in range(4)
    )
    assert all(by_ab[(a, b)] == expect(a, b) for a in range(16) for b in range(16))


def test_bucketed_layout_invalidates_on_source_regeneration(spark, tmp_path):
    """The layout manifest fingerprints the source parquet; the round
    driver REGENERATES testdata between rounds, and a stale bucketed
    copy silently serving old rows would be a correctness catastrophe.
    Rewrite the source (same path, new content) and the catalog must
    fall back to the fresh plain data and drop the stale manifest."""
    import os as _os
    import shutil as _shutil

    from pandas_streaming_spark import catalog

    sf_copy = str(tmp_path / "sfx")
    _os.makedirs(sf_copy)
    _shutil.copyfile(
        "/root/testdata/sf0.001/orders.parquet", f"{sf_copy}/orders.parquet"
    )
    try:
        catalog.ensure_bucketed_layout(
            spark, sf_copy, "orders", ["o_orderkey"], 4, ["o_orderkey"]
        )
        n_before = catalog.load_table(spark, sf_copy, "orders").count()
        assert catalog._load_bucketed(spark, sf_copy, "orders") is not None

        # regenerate the source: HALF the rows, new mtime
        half = (
            catalog.load_table(spark, sf_copy, "orders")
            .filter("o_orderkey % 2 = 0")
            .toPandas()
        )
        half.to_parquet(f"{sf_copy}/orders.parquet.new")
        _os.replace(f"{sf_copy}/orders.parquet.new", f"{sf_copy}/orders.parquet")

        got = catalog.load_table(spark, sf_copy, "orders").count()
        assert got == len(half) != n_before, (
            "stale layout served old rows after source regeneration"
        )
        assert catalog._load_bucketed(spark, sf_copy, "orders") is None
        mp = catalog._layout_manifest_path(spark, sf_copy, "orders")
        assert not _os.path.exists(mp), "stale manifest must be dropped"
    finally:
        catalog.drop_bucketed_layout(spark, sf_copy, "orders")


def test_pack_bins_single_group_exchange(spark, sf_dir):
    """pack_bins' plan is one hash exchange on the group column feeding
    the mapInPandas scan — no extra shuffles, no cartesian."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.text import pack_bins
    from pandas_streaming_spark.plans import physical_plan
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    plan = physical_plan(pack_bins(docs, "doc_id", "n_tok", 512, "source"))
    assert plan.count("hashpartitioning(source") == 1
    assert "CartesianProduct" not in plan


def test_semdedup_no_cartesian(spark, sf_dir):
    """semdedup's candidate stage must join within clusters (shuffle on
    the cluster key), never all-pairs: no CartesianProduct anywhere (the
    centroid crossJoin is a bounded broadcast, k rows)."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.similarity import semdedup
    from pandas_streaming_spark.plans import physical_plan

    emb = load_table(spark, sf_dir, "embeddings")
    plan = physical_plan(semdedup(emb, threshold=0.3))
    assert "CartesianProduct" not in plan


def test_kmv_estimator_band(spark):
    """KMV (k-1)/h_k estimate lands within 25% of truth at k=64 over a
    1000-member synthetic set (md5 uniformity; deterministic, so this is
    a fixed fact about the construction, not a flaky statistical test)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.lit("g").alias("g"), F.col("id").alias("user_id")
    )
    h = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
        .cast("double")
        / F.lit(float(16**15))
    )
    w = Window.partitionBy("g").orderBy(F.col("__h").asc(), "user_id")
    r = df.withColumn("__h", h).withColumn("__rn", F.row_number().over(w))
    hk = r.filter(F.col("__rn") == 64).select("__h").collect()[0][0]
    est = round(63.0 / hk)
    assert 750 <= est <= 1250, est
