"""Round-10 additions: k ∝ n SemDeDup (q240), the BPE training loop
(q241), the trained quality gate (q242), and the NTILE-via-global-index
formula that replaced q210's unpartitioned windows."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_semdedup_scaled_no_cartesian(spark, sf_dir):
    """semdedup_scaled must join within (shard, fine) clusters — no
    CartesianProduct anywhere in the plan (same contract as semdedup)."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.similarity import semdedup_scaled
    from pandas_streaming_spark.plans import physical_plan

    emb = load_table(spark, sf_dir, "embeddings")
    plan = physical_plan(semdedup_scaled(emb, threshold=0.3))
    assert "CartesianProduct" not in plan


def test_shard_kmeans_cluster_count_grows_with_corpus(spark):
    """The whole point of q240: cluster COUNT scales with n (shard_size
    fixed), so per-cluster membership stays bounded — compare sf0.001 vs
    sf0.01 and check the per-cluster bound."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.similarity import shard_kmeans_assign

    counts = {}
    bound_ok = True
    # sf0.001/sf0.01 share a 500-vector embeddings fixture; sf0.1 is 4x
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        a = shard_kmeans_assign(
            load_table(spark, sf, "embeddings"), shard_size=200, k_fine=4
        )
        sizes = (
            a.groupBy("shard", "fine").agg(F.count("*").alias("c")).collect()
        )
        counts[sf] = len(sizes)
        bound_ok = bound_ok and all(r["c"] <= 200 for r in sizes)
    assert bound_ok
    assert counts["/root/testdata/sf0.1"] > counts["/root/testdata/sf0.01"]


def test_bpe_wrapped_replace_is_leftmost_nonoverlap(spark):
    """The marker-wrapped REPLACE must implement the BPE apply exactly:
    all non-overlapping occurrences merge in ONE pass ('a a a a' →
    'aa aa') and odd runs leave the tail unmerged ('a a a' → 'aa a')."""
    df = spark.createDataFrame(
        [("·a··a··a··a·",), ("·a··a··a·",), ("·b··a··a·",)], ["ws"]
    )
    out = df.select(
        F.replace(F.col("ws"), F.lit("·a··a·"), F.lit("·aa·")).alias("r")
    ).collect()
    assert [r["r"] for r in out] == ["·aa··aa·", "·aa··a·", "·b··aa·"]


def test_q241_merge_table_shape(spark, sf_dir):
    """8 deterministic merge rules; merged symbol is the concatenation;
    counts are positive frequency-weighted pair counts."""
    from pandas_streaming_spark.queries.tokenizer import q241_bpe_train

    rows = q241_bpe_train(spark, sf_dir).collect()
    assert [r["step"] for r in rows] == list(range(1, 9))
    assert all(r["merged"] == r["x"] + r["y"] and r["cnt"] > 0 for r in rows)
    assert all(r["x"] != "" and r["y"] != "" for r in rows)


def test_q242_gate_learns_above_prior(spark):
    """The trained gate must beat the majority-class baseline on the
    eval split — i.e. it LEARNED the teacher rule from token evidence
    (deterministic: content-addressed split + exact-integer model).
    sf0.01 so the eval split is large enough to be meaningful."""
    from pandas_streaming_spark.queries.quality import (
        q242_trained_quality_gate,
    )

    rows = q242_trained_quality_gate(spark, "/root/testdata/sf0.01").collect()
    n = sum(r["n_docs"] for r in rows)
    correct = sum(r["n_docs"] for r in rows if r["label"] == r["pred"])
    pos = sum(r["n_docs"] for r in rows if r["label"] == 1)
    majority = max(pos, n - pos) / n
    assert correct / n >= majority + 0.05, (correct, n, majority)


def test_poisson_cdf_literals_match_math():
    """q254's inverse-CDF thresholds must be the true Poisson(1) CDF —
    the literals are copied into both engines, so a typo would be a
    SHARED wrong constant the oracle could never catch."""
    import math

    from pandas_streaming_spark.queries.diagnostics import _POIS_CDF

    lam = 1.0
    pmf = [math.exp(-lam)]
    for k in range(1, 5):
        pmf.append(pmf[-1] * lam / k)
    cdf = []
    acc = 0.0
    for v in pmf:
        acc += v
        cdf.append(acc)
    assert [float(x) for x in _POIS_CDF] == pytest.approx(cdf, abs=1e-15)


def test_jl_sign_matrix_shape_and_balance():
    """q253's md5 sign matrix: right shape, deterministic, and roughly
    balanced (a degenerate all-+1 matrix would be a broken hash)."""
    from pandas_streaming_spark.queries.vectors import _jl_signs

    s1, s2 = _jl_signs(), _jl_signs()
    assert s1 == s2
    assert len(s1) == 16 and all(len(r) == 64 for r in s1)
    flat = [v for r in s1 for v in r]
    assert set(flat) == {-1, 1}
    pos = sum(1 for v in flat if v == 1)
    assert 0.35 * len(flat) < pos < 0.65 * len(flat)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 37, 100])
def test_ntile4_formula_matches_native(spark, n):
    """q210's floor-balanced bucket formula over the 0-based global rank
    must equal NTILE(4) for every n (including n < 4)."""
    df = spark.range(n).select(F.col("id"))
    w = Window.orderBy("id")
    native = df.select(
        "id", F.ntile(4).over(w).cast("long").alias("b")
    )
    r = F.col("rk")
    q = F.floor(F.lit(n) / 4).cast("long")
    rem = F.lit(n % 4).cast("long")
    formula = (
        F.when(r < rem * (q + 1), F.floor(r / (q + 1)))
        .otherwise(rem + F.floor((r - rem * (q + 1)) / q))
        + 1
    ).cast("long")
    mine = df.select(
        "id", (F.row_number().over(w) - 1).cast("long").alias("rk")
    ).select("id", formula.alias("b"))
    a = {x["id"]: x["b"] for x in native.collect()}
    b = {x["id"]: x["b"] for x in mine.collect()}
    assert a == b
