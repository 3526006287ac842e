"""Distributed graph analytics on edge DataFrames: triangle counting and
PageRank (reference graph/iterative family; connected components already
lives in operators.dedup.dedup_clusters).

Scale shapes:

* **Triangle counting** uses the degree-oriented wedge algorithm (Cohen
  2009 / Suri–Vassilvitskii 2011): orient every undirected edge from its
  lower-(degree, id) endpoint to the higher one, build wedges only at
  each edge's *smaller* endpoint, and close them with a hash join back
  to the oriented edge set. Orientation bounds per-node wedge fan-out by
  O(sqrt(|E|)) even on power-law hubs — the naive "all length-2 paths"
  join explodes quadratically on exactly the hot vertices a web or
  co-occurrence graph is full of. Three shuffles total (degree agg,
  wedge join, closing join), no collect.

* **PageRank** is the standard damped power iteration expressed as a
  DataFrame loop: contributions = rank/out_degree shuffled to the dst,
  dangling mass folded back uniformly via a broadcast 1-row aggregate
  (never a driver-side scalar), `localCheckpoint` per iteration to cut
  the growing lineage (the same pattern as dedup_clusters' pointer
  jumping). Each iteration is one shuffle on dst plus broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected simple edge set ``(u, v), u < v``: drops self-loops,
    direction, and duplicates. One distinct (= one shuffle)."""
    u, v = F.col(src), F.col(dst)
    return (
        edges.where(u.isNotNull() & v.isNotNull() & (u != v))
        .select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .distinct()
    )


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Count triangles in the undirected simple graph underlying
    ``edges``. Returns one row: n_vertices, n_edges, n_triangles.

    Orientation order is (degree, id) lexicographic — ties broken by id
    so the order is total and both the wedge and closing joins see a
    consistent DAG. Every triangle {a≺b≺c} is counted exactly once, as
    the wedge (a→b, a→c) closed by the oriented edge b→c.
    """
    # The canonical edge set feeds FOUR branches (degrees, edge count,
    # wedges via orientation, closing edges) — checkpoint it once so an
    # expensive upstream edge-build (e.g. a co-occurrence self-join)
    # doesn't recompute per branch. On a cluster this is the
    # persist(DISK_ONLY)/checkpoint decision; the edge list is the
    # small thing here, the build is the big thing.
    und = canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # Orient by (deg, id): small endpoint -> large endpoint.
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("e")
        )
        .select("e.s", "e.t")
        .localCheckpoint(eager=True)  # reused by e1, e2, and closing
    )
    e1 = oriented.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = oriented.select(F.col("s").alias("a"), F.col("t").alias("c"))
    # Wedges at the small endpoint; b != c halves the symmetric pairs.
    wedges = e1.join(e2, "a").where(F.col("b") < F.col("c"))
    # unionByName, not positional unionAll: the reversed branch must land
    # t in b and s in c.
    closing = oriented.select(
        F.col("s").alias("b"), F.col("t").alias("c")
    ).unionByName(oriented.select(F.col("t").alias("b"), F.col("s").alias("c")))
    tri = wedges.join(closing, ["b", "c"]).agg(F.count("*").alias("n_triangles"))
    summary = und.agg(
        F.count("*").alias("n_edges"),
    ).crossJoin(deg.agg(F.count("*").alias("n_vertices")))
    return summary.crossJoin(tri).select("n_vertices", "n_edges", "n_triangles")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Damped PageRank over the directed simple graph of ``edges``
    (duplicates collapse — an edge either exists or not, matching the
    oracle's DISTINCT). Returns (node, rank) after exactly
    ``iterations`` synchronous power iterations from the uniform start.

    rank'(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/out(u) + dangling/N)

    Dangling (sink) mass is redistributed uniformly via a broadcast
    1-row aggregate — the loop never materializes a scalar on the
    driver. Fixed iteration count (not convergence-tested) keeps the
    result deterministic and oracle-checkable.
    """
    # checkpoint the edge set once: it feeds nodes, out_deg, and every
    # iteration's contribution join — without this an expensive upstream
    # edge build (q138: a 5-way fact join) re-executes ~4× per iteration
    e = (
        edges.where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionAll(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_deg = e.groupBy(F.col("e_src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    # N as a broadcast 1-row frame: the loop stays collect-free.
    n_row = F.broadcast(nodes.agg(F.count("*").cast("double").alias("n_nodes")))
    ranks = (
        nodes.crossJoin(n_row)
        .select("node", (F.lit(1.0) / F.col("n_nodes")).alias("rank"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        r = ranks.join(F.broadcast(out_deg), "node", "left")
        contribs = (
            r.where(F.col("out_deg").isNotNull())
            .join(e, F.col("node") == F.col("e_src"))
            .groupBy(F.col("e_dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        dangling = F.broadcast(
            r.where(F.col("out_deg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling")
            )
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(dangling)
            .crossJoin(n_row)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dangling") / F.col("n_nodes")
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
