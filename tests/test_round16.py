"""Round-16 optimization tests: every operator whose internals changed
for performance this round is pinned result-identical to the previous
form (optimization-brief rule — internals may change, results may not).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_max_token_multiplicity_single_case_fold_equivalence(spark):
    """r16 re-shapes the Gopher dominance fold (one CASE over structs,
    closed-run mx + finish-step fold of the open run) — the result must
    still equal the r14 definitional transform/filter idiom on every
    adversarial shape, including runs that END the sorted array (the
    finish step's responsibility) and ties between a closed and the
    final open run."""
    from pandas_streaming_spark.operators.text import max_token_multiplicity

    texts = [
        "a b c a b a",          # clear winner
        "x",                     # single token
        "t t t t",               # all same (one never-closed run)
        "a b c d e",             # all distinct
        "z a z a z a",           # winner at sort-end (open-run finish)
        "a  b   a",              # doubled spaces -> empty-string tokens
        " lead",                 # leading space -> empty first token
        "tail ",                 # trailing space -> empty last token
        "m m n n",               # tie: closed run == final open run
        "q " * 500 + "r",        # long run closed by a final singleton
        "r " + "q " * 499 + "q",  # long run IS the final open run
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    w = F.split("text", " ")
    old = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda x: F.size(F.filter(w, lambda y: y == x)),
        )
    )
    got = df.select(
        max_token_multiplicity(w).alias("new"), old.alias("old")
    ).collect()
    for r in got:
        assert r["new"] == r["old"], (r["new"], r["old"])


def test_max_token_multiplicity_empty_array_is_zero(spark):
    """Pins the documented edge divergence (VERDICT r15 item 5): a
    literal EMPTY array returns 0 (the old array_max([]) idiom returned
    NULL). Unreachable from the split()-based call sites — worst case
    split yields [''] — but pinned so the contract is explicit."""
    from pandas_streaming_spark.operators.text import max_token_multiplicity

    df = spark.range(1).select(
        F.array().cast("array<string>").alias("toks")
    )
    [row] = df.select(max_token_multiplicity(F.col("toks")).alias("m")).collect()
    assert row["m"] == 0


def test_shard_kmeans_assign_maxby_argmax_equivalence(spark):
    """r16 re-shapes shard_kmeans_assign's E-step (map-side max_by
    aggregate with a unique (non-null, sim, -fine) ordering key instead
    of a per-vector row_number window over the k_fine fan-out).
    Full-row equivalence against the old windowed form on adversarial
    shapes: centroid-sim ties (tie must go to the SMALLER fine label),
    a zero vector (cosine NULL for every candidate -> smallest fine
    with NULL sim_e4), shards with fewer members than k_fine (partial
    candidate sets), and the fixture corpus."""
    from pyspark.sql import Window

    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.functions import vec_cosine
    from pandas_streaming_spark.operators.similarity import (
        label_centroids,
        shard_kmeans_assign,
    )

    def old_assign(embeddings, shard_size, k_fine,
                   id_col="vec_id", vec_col="embedding"):
        # the pre-r16 fan-out + window form, verbatim
        e = embeddings.select(
            F.col(id_col),
            F.col(vec_col),
            F.floor(F.col(id_col) / shard_size).cast("long").alias("shard"),
            F.pmod(F.col(id_col), F.lit(k_fine)).cast("long").alias("__seed"),
        )
        lab = e.withColumn(
            "__lab", (F.col("shard") * k_fine + F.col("__seed")).cast("long")
        )
        cents = label_centroids(lab, label_col="__lab", vec_col=vec_col)
        cent = (
            cents.groupBy("label")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "centroid_e6"))),
                    lambda s: s["centroid_e6"].cast("double") / F.lit(1000000.0),
                ).alias("cvec")
            )
            .select(
                F.floor(F.col("label") / k_fine).cast("long").alias("shard"),
                F.pmod(F.col("label"), F.lit(k_fine)).cast("long").alias("fine"),
                "cvec",
            )
        )
        sims = e.join(cent, "shard").select(
            F.col(id_col),
            F.col("shard"),
            F.col("fine"),
            vec_cosine(vec_col, "cvec").alias("sim"),
            F.col(vec_col),
        )
        w = Window.partitionBy(id_col).orderBy(F.desc_nulls_last("sim"), "fine")
        return (
            sims.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                id_col,
                "shard",
                "fine",
                F.round(F.lit(10000.0) * F.col("sim"), 0).cast("long").alias("sim_e4"),
                vec_col,
            )
        )

    # adversarial synthetic corpus: ids 0..6 with shard_size=4, k_fine=2
    # - shard 0 holds ids 0..3 (both seeds present); ids 0 and 2 are the
    #   SAME vector, so both seed centroids coincide -> every member's
    #   two candidate sims TIE -> fine must be 0 for all
    # - id 3 is the zero vector -> cosine NULL vs both candidates
    # - shard 1 holds only id 4 (seed 0) -> a single-candidate shard
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0]),
        (4, [0.5, 0.5, 0.0]),
    ]
    synth = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    for df, kw in (
        (synth, dict(shard_size=4, k_fine=2)),
        (load_table(spark, "/root/testdata/sf0.001", "embeddings"),
         dict(shard_size=200, k_fine=4)),
    ):
        new = shard_kmeans_assign(df, **kw).orderBy("vec_id").collect()
        old = old_assign(df, **kw).orderBy("vec_id").collect()
        assert [r.asDict() for r in new] == [r.asDict() for r in old]
    # the documented tie rule, explicitly: coincident centroids -> fine 0
    tied = shard_kmeans_assign(synth, shard_size=4, k_fine=2).orderBy("vec_id")
    got = {r["vec_id"]: (r["fine"], r["sim_e4"]) for r in tied.collect()}
    assert got[0] == (0, 10000) and got[1] == (0, 10000) and got[2] == (0, 10000)
    assert got[3][0] == 0 and got[3][1] is None  # zero vector: NULL sim
    assert got[4][0] == 0  # single-candidate shard


def test_orderkey_profile_contract(spark):
    """q106 degenerates countDistinct(o_orderkey) to count(o_orderkey)
    (the q81 ids_unique playbook): (a) the fixture contract holds —
    o_orderkey unique and non-null at EVERY fixture SF (list derived
    from the testdata dir, the ADVICE r15 rule); (b) on the fixture the
    degenerate aggregate equals the definitional one."""
    import os

    import duckdb

    sfs = sorted(d for d in os.listdir("/root/testdata") if d.startswith("sf"))
    assert "sf0.1" in sfs, sfs
    for sf in sfs:
        n, nd, nn = duckdb.sql(
            f"SELECT count(*), count(DISTINCT o_orderkey), "
            f"count(*) FILTER (o_orderkey IS NULL) "
            f"FROM '/root/testdata/{sf}/orders.parquet'"
        ).fetchone()
        assert n == nd and nn == 0, (sf, n, nd, nn)

    from pandas_streaming_spark.catalog import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    [row] = o.agg(
        F.count("o_orderkey").alias("fast"),
        F.countDistinct("o_orderkey").alias("safe"),
    ).collect()
    assert row["fast"] == row["safe"]


def test_pipeline_gates_projection_keeps_membership(spark):
    """r16 projects text out of the pipeline gate battery's output
    (guide §2.3 — no downstream stage reads it). The gated doc_id set
    and the (n_docs, n_tokens) stage aggregates must equal the
    definitional inline battery computed WITH text retained."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.text import max_token_multiplicity
    from pandas_streaming_spark.queries.pipeline import _pipeline_stages

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    s1, s2, neardup, gates, _sp, _p = _pipeline_stages(docs)
    got = gates(s2)
    assert got.columns == ["doc_id", "source", "n_tok"]

    w = F.split("text", " ")
    ref = (
        s2.select(
            "*",
            F.size(w).alias("__n"),
            F.length(F.regexp_replace("text", " ", "")).alias("__sl"),
            F.size(F.array_distinct(w)).alias("__nd"),
            F.size(
                F.array_intersect(
                    F.array_distinct(w),
                    F.array(*[F.lit(s) for s in ("the", "a", "of", "to", "and")]),
                )
            ).alias("__ns"),
            max_token_multiplicity(w).alias("__mc"),
        )
        .filter(
            (F.col("__n") >= 30)
            & (F.col("__n") <= 10000)
            & (F.col("__sl") >= 3 * F.col("__n"))
            & (F.col("__sl") <= 10 * F.col("__n"))
            & (F.col("__nd") * 10 >= 3 * F.col("__n"))
            & (F.col("__ns") >= 2)
            & (F.col("__mc") * 5 <= F.col("__n"))
        )
        .select("doc_id", "source", "n_tok")
    )
    assert (
        got.orderBy("doc_id").collect() == ref.orderBy("doc_id").collect()
    )
