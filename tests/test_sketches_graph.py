"""Unit + property tests for the sketch and graph operators (round 5):
Bloom no-false-negatives, CMS overestimate-only, triangle count and
PageRank vs independent brute-force references. The graded queries
q134/q135/q137/q138 get their value grades from the duckdb oracles; the
tests here pin the *semantic invariants* the oracles can't express
(supersets, inequalities, convergence) on adversarial random inputs."""

from __future__ import annotations

import itertools
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandas_streaming_spark.operators.graph import (
    canonical_edges,
    pagerank,
    triangle_count,
)
from pandas_streaming_spark.operators.sketches import (
    bloom_build,
    bloom_might_contain,
    bloom_prune,
    cms_build,
    cms_estimate,
)


# --------------------------------------------------------------------------
# Bloom
# --------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    """Every inserted key must probe true — the invariant that makes
    bloom_prune a correctness-preserving optimization."""
    keys = [random.Random(7).randrange(10**12) for _ in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    words = bloom_build(df, "k", num_bits=128 * 64)
    hits = df.where(bloom_might_contain("k", words)).count()
    assert hits == df.count()


def test_bloom_false_positive_rate_bounded(spark):
    """~16 bits/key at k=5 ⇒ fpp well under 5%; probe disjoint keys."""
    rng = random.Random(11)
    keys = [rng.randrange(10**12) for _ in range(400)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    words = bloom_build(df, "k", num_bits=((400 * 16 + 63) // 64) * 64)
    probe = spark.createDataFrame(
        [(10**13 + i,) for i in range(2000)], "k long"
    )
    fp = probe.where(bloom_might_contain("k", words)).count()
    assert fp / 2000 < 0.05, fp


def test_bloom_prune_preserves_join(spark):
    """bloom_prune(fact)⋈dim == fact⋈dim row-for-row."""
    rng = random.Random(3)
    fact = spark.createDataFrame(
        [(i, rng.randrange(200)) for i in range(3000)], "row_id long, fk long"
    )
    dim = spark.createDataFrame(
        [(k,) for k in rng.sample(range(200), 30)], "pk long"
    )
    plain = (
        fact.join(dim, fact["fk"] == dim["pk"]).select("row_id").collect()
    )
    pruned = (
        bloom_prune(fact, "fk", dim, "pk")
        .join(dim, F.col("fk") == F.col("pk"))
        .select("row_id")
        .collect()
    )
    assert sorted(r["row_id"] for r in pruned) == sorted(
        r["row_id"] for r in plain
    )


def test_bloom_build_rejects_bad_bits(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        bloom_build(df, "k", num_bits=100)  # not a multiple of 64


# --------------------------------------------------------------------------
# Count-Min Sketch
# --------------------------------------------------------------------------


def test_cms_overestimate_only_and_exact_when_wide(spark):
    """est ≥ true for EVERY item (Count-Min's one-sided error); with a
    grid wider than the distinct-item count collisions are possible but
    the minimum over 4 rows is almost always exact — assert ≥ and that
    total overestimate is small."""
    rng = random.Random(5)
    items = [f"tok{rng.randrange(50)}" for _ in range(5000)]
    df = spark.createDataFrame([(t,) for t in items], "token string")
    true = {}
    for t in items:
        true[t] = true.get(t, 0) + 1
    grid = cms_build(df, "token", depth=4, width=512)
    distinct = spark.createDataFrame([(t,) for t in true], "token string")
    est = {
        r["token"]: r["cms_est"]
        for r in cms_estimate(distinct, grid, "token", depth=4, width=512).collect()
    }
    assert set(est) == set(true)
    assert all(est[t] >= true[t] for t in true), "CMS underestimated"
    assert sum(est[t] - true[t] for t in true) <= 0.05 * len(items)


def test_cms_grid_bounded(spark):
    """Grid rows ≤ depth×width no matter the stream size."""
    df = spark.range(20000).select(
        F.concat(F.lit("t"), (F.col("id") % 3000).cast("string")).alias("token")
    )
    grid = cms_build(df, "token", depth=4, width=64)
    assert grid.count() <= 4 * 64


# --------------------------------------------------------------------------
# Graph
# --------------------------------------------------------------------------


def _random_graph(rng: random.Random, n: int, p: float) -> list[tuple[int, int]]:
    return [
        (u, v)
        for u, v in itertools.combinations(range(n), 2)
        if rng.random() < p
    ]


def test_triangle_count_vs_bruteforce(spark):
    """Degree-oriented count == O(n^3) brute force on random sparse
    graphs (the complete-graph case in q137's data can't distinguish
    orientation bugs; these can)."""
    for seed, n, p in [(1, 12, 0.4), (2, 18, 0.25), (3, 25, 0.15)]:
        rng = random.Random(seed)
        edges = _random_graph(rng, n, p)
        if not edges:
            continue
        eset = set(edges)
        brute = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in eset and (a, c) in eset and (b, c) in eset
        )
        # feed edges with random direction + duplicates: the operator
        # must canonicalize.
        noisy = [
            (v, u) if rng.random() < 0.5 else (u, v) for u, v in edges
        ] + edges[: len(edges) // 2]
        df = spark.createDataFrame(noisy, "src long, dst long")
        row = triangle_count(df).collect()[0]
        assert row["n_triangles"] == brute, (seed, brute, row)
        assert row["n_edges"] == len(edges)


def test_canonical_edges_drops_loops_and_dups(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (3, 2), (2, 3)], "src long, dst long"
    )
    got = sorted((r["u"], r["v"]) for r in canonical_edges(df, "src", "dst").collect())
    assert got == [(1, 2), (2, 3)]


def _pagerank_numpy(
    edges: list[tuple[int, int]], iterations: int, d: float
) -> dict[int, float]:
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for u, _ in set(edges):
        out[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[idx[v]] for v in nodes if out[v] == 0)
        nxt += d * dangling / n
        for u, v in set(edges):
            nxt[idx[v]] += d * r[idx[u]] / out[u]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_vs_numpy_and_mass_conserved(spark):
    """3-iteration distributed PageRank == dense numpy power iteration
    (1e-9 tolerance), including dangling-node handling; total mass = 1."""
    rng = random.Random(9)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}
    want = _pagerank_numpy(edges, 3, 0.85)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------


def test_hll_registers_mergeable(spark):
    """HLL's defining property: registers(A ∪ B) == per-bucket max of
    registers(A), registers(B) — what makes the sketch distributable."""
    from pandas_streaming_spark.operators.sketches import hll_registers

    a = spark.range(0, 4000).select(F.col("id").alias("x"), F.lit("g").alias("g"))
    b = spark.range(2000, 7000).select(F.col("id").alias("x"), F.lit("g").alias("g"))
    ra = {r["hll_bucket"]: r["hll_rho"] for r in hll_registers(a, "x", "g").collect()}
    rb = {r["hll_bucket"]: r["hll_rho"] for r in hll_registers(b, "x", "g").collect()}
    ru = {
        r["hll_bucket"]: r["hll_rho"]
        for r in hll_registers(a.unionByName(b), "x", "g").collect()
    }
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert ru == merged


def test_hll_estimate_within_error_band(spark):
    """m=64 ⇒ ~13% standard error; assert within 4 sigma across a
    cardinality sweep (deterministic inputs — no flake)."""
    from pandas_streaming_spark.operators.sketches import hll_estimate, hll_registers

    for n in (50, 500, 5000, 50000):
        df = spark.range(n).select(
            F.concat(F.lit("item"), F.col("id")).alias("x"), F.lit("g").alias("g")
        )
        est = hll_estimate(hll_registers(df, "x", "g"), "g").collect()[0]["hll_est"]
        assert abs(est - n) / n < 0.52, (n, est)
