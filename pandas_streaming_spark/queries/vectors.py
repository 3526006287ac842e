"""Embedding / vector-search / multimodal queries split out of `llm`
(round 6, VERDICT r5 item 8): brute-force and bucketed ANN, k-NN
join, centroids/k-means, quantization, matryoshka normalization,
embedding near-dup, multimodal decode and frame sampling, recall
audits.

Same house rules and oracle discipline as the parent module.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pandas_streaming_spark.operators.multimodal import decode_images, documents_as_media
from pandas_streaming_spark.operators.similarity import (
    ann_bucketed_topk,
    ann_recall,
    assign_to_centroids,
    cosine_topk,
    ivf_topk,
    kmeans_step,
    knn_join,
    label_centroids,
    quantize_int8,
    similarity_join,
)
from pandas_streaming_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q39_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=20)


def q42_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = similarity_join(_t(spark, sf_dir, "embeddings"), threshold=0.35, block_col="label")
    return (
        pairs.groupBy("label").agg(F.count("*").alias("n_pairs")).orderBy("label")
    )


# ---------------------------------------------------------------------------
# Dedup extras
# ---------------------------------------------------------------------------


def q57_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_bucketed_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_bits=8)


def q58_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(_t(spark, sf_dir, "documents"))
    return decode_images(media).orderBy("doc_id").limit(100)


def q59_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = similarity_join(_t(spark, sf_dir, "embeddings"), threshold=0.35, block_col="label")
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("id_b").alias("n_dup_docs"),
    )


def q79_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame-sampling shape over binary payloads: 64-byte frames,
    every 2nd kept, md5 per frame (operators.multimodal.sample_frames).
    ASCII guard on both sides pins byte-slices == duckdb char-slices."""
    from pandas_streaming_spark.operators.multimodal import sample_frames

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("text").rlike(r"^[\x20-\x7e]*$")
    )
    media = documents_as_media(docs)
    return (
        sample_frames(media, frame_len=64, every_n=2)
        .orderBy("doc_id", "frame_idx")
        .limit(500)
    )


def q86_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN (operators.similarity.knn_join): top-3 cosine
    neighbors for each of the 5 lowest-id query vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    return knn_join(emb.filter(F.col("vec_id") < 5), emb, k=3).orderBy(
        "query_id", "rnk"
    )


def q87_label_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid in exact integer micro-units
    (operators.similarity.label_centroids) — the fixed-point
    representation makes a float-vector aggregate cross-engine gradable."""
    return label_centroids(_t(spark, sf_dir, "embeddings")).orderBy("label", "dim")


def q91_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step (operators.similarity.assign_to_centroids): nearest
    per-label centroid by cosine, centroids in exact fixed point."""
    return assign_to_centroids(_t(spark, sf_dir, "embeddings")).orderBy("vec_id")


def q92_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (operators.similarity.ivf_topk): probe the 2 centroids
    nearest vec_id=0's vector, exact top-10 within the probed cells."""
    return ivf_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_probe=2)


def q95_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (operators.similarity.
    quantize_int8): per-vector max-abs scale in micro-units + the int8
    code array, graded as a joined string (array-grading policy of q49 —
    list-vs-ndarray reprs diverge across engines)."""
    return (
        quantize_int8(_t(spark, sf_dir, "embeddings"))
        .select("vec_id", "scale_e6", F.concat_ws(",", "codes").alias("codes"))
        .orderBy("vec_id")
    )


def q96_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full Lloyd iteration (operators.similarity.kmeans_step):
    E-step assignment to the label centroids, M-step recenter on the new
    assignment — exact fixed-point at every stage."""
    return kmeans_step(_t(spark, sf_dir, "embeddings")).orderBy(
        "assigned_label", "dim"
    )


def q99_normalize_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation to 16 dims + exact-integer L2 normalization
    (operators.similarity.normalize_embeddings): the serving transform
    that turns truncated embeddings back into unit vectors. Unit vector
    graded as a joined string per the q49/q95 array policy."""
    from pandas_streaming_spark.operators.similarity import normalize_embeddings

    return (
        normalize_embeddings(_t(spark, sf_dir, "embeddings"), dims=16)
        .select("vec_id", "norm_e6", F.concat_ws(",", "unit_e6").alias("unit_e6"))
        .orderBy("vec_id")
    )


def q108_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality audit (VERDICT r3 item 7): recall@10 of the
    2-bit sign-bucket ANN vs exact brute force over 20 spread query ids.
    2 bits (not q57's 8) so buckets hold a meaningful candidate pool at
    the 500-row grading corpus; the recall floor is pinned by
    tests/test_operators.py::test_ann_recall_thresholds."""
    return ann_recall(
        _t(spark, sf_dir, "embeddings"),
        query_ids=list(range(0, 100, 5)),
        k=10,
        n_bits=2,
    )


def q182_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (§2.9 similarity
    tail) — the lexical+vector fusion every RAG stack runs: rank
    candidates for "documents like doc 0" twice, lexically (distinct
    shared tokens with doc 0 — integer score, broadcast token probe)
    and semantically (cosine_topk against vec 0's embedding), then fuse
    with RRF(k=60): score = Σ 1/(60 + rank) over the rankings a doc
    appears in. Both rankings are cut to top-50 BEFORE ranking (standard
    RRF cutoff, and what keeps the per-ranking window a post-LIMIT
    50-row frame instead of a global sort); contributions are integer
    micro-units so the fused sum is exact cross-engine. Docs and
    vectors share the id space (TESTDATA: vec_id == doc_id)."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    q_toks = (
        docs.filter(F.col("doc_id") == 0)
        .select(F.explode(F.array_distinct(F.split("text", " "))).alias("__qt"))
    )
    doc_toks = (
        docs.filter(F.col("doc_id") != 0)
        .select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("__t"))
    )
    lex = (
        doc_toks.join(F.broadcast(q_toks), F.col("__t") == F.col("__qt"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("lex_score"))
        .orderBy(F.col("lex_score").desc(), "doc_id")
        .limit(50)
    )
    # rank within the 50 fused candidates: the no-partition window runs
    # AFTER the TakeOrdered cut, so it sorts 50 rows, not the corpus
    w_lex = Window.orderBy(F.col("lex_score").desc(), "doc_id")
    lex = lex.select(
        "doc_id", F.row_number().over(w_lex).cast("long").alias("rank_lex")
    )
    vec = (
        cosine_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=51)
        .filter(F.col("vec_id") != 0)
        .limit(50)
    )
    w_vec = Window.orderBy(F.col("sim_e4").desc(), "vec_id")
    vec = vec.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(w_vec).cast("long").alias("rank_vec"),
    )
    rrf = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            "rank_lex",
            "rank_vec",
            (
                F.coalesce(
                    F.round(F.lit(1e6) / (F.lit(60) + F.col("rank_lex")), 0)
                    .cast("long"),
                    F.lit(0),
                )
                + F.coalesce(
                    F.round(F.lit(1e6) / (F.lit(60) + F.col("rank_vec")), 0)
                    .cast("long"),
                    F.lit(0),
                )
            ).alias("rrf_e6"),
        )
        .orderBy(F.col("rrf_e6").desc(), "doc_id")
        .limit(10)
    )
    return rrf


def q207_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (operators.similarity.semdedup, VERDICT r8
    item 5): cluster on exact fixed-point label centroids, drop
    within-cluster members with cosine >= 0.3 to a neighbor nearer the
    centroid (the paper's keep-farthest-from-centroid rule). One row per
    vector with the kept flag; the oracle re-derives cluster membership,
    centroid sims, and the dominance rule from scratch."""
    from pandas_streaming_spark.operators.similarity import semdedup

    return semdedup(_t(spark, sf_dir, "embeddings"), threshold=0.3).orderBy(
        "vec_id"
    )


def q240_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over a k ∝ n clustering
    (operators.similarity.semdedup_scaled — VERDICT r9 item 1, closing
    the q207 `weak`): shard_size=200 / k_fine=4 gives ~50-member
    clusters whose COUNT grows with the corpus (sf0.01: 12 clusters,
    sf0.1: 40, 10× replica: 400), so every stage — shard assignment,
    local Lloyd E-step with k_fine constant candidates per vector,
    within-cluster cosine pairs, dominance — is linear in n. Same
    keep-farthest rule and threshold (0.3) as q207; the oracle
    re-derives shards, fixed-point centroids, assignment, and dominance
    from scratch. The per-cluster candidate bound (cluster ≤
    shard_size; assignment never crosses shards) is ASSERTED in the
    plan: an action-time assert_true over the cluster-size aggregate
    fails the query loudly if any cluster exceeds shard_size."""
    from pandas_streaming_spark.operators.similarity import semdedup_scaled

    out = semdedup_scaled(
        _t(spark, sf_dir, "embeddings"), threshold=0.3, shard_size=200, k_fine=4
    )
    # The cluster-size bound `count <= shard_size` is IMPLIED by the
    # id//shard_size arithmetic for any duplicate-free id column (a
    # (shard, fine) cell can hold at most shard_size distinct ids), so
    # the action-time assert guards the one thing the arithmetic can't:
    # duplicate vec_ids, which are what would silently inflate a cluster
    # past the bound (ADVICE r10). Non-dense id spaces degrade to
    # UNDERsized clusters — a recall concern, never a linearity one.
    mx = out.groupBy("shard", "fine").agg(
        F.count("*").alias("__c"),
        F.count_distinct("vec_id").alias("__cd"),
    ).agg(
        F.max("__c").alias("__max_cluster"),
        F.max(F.col("__c") - F.col("__cd")).alias("__max_dup"),
    )
    return (
        out.join(F.broadcast(mx))
        .filter(
            F.coalesce(
                F.assert_true(
                    (F.col("__max_dup") == F.lit(0))
                    & (F.col("__max_cluster") <= F.lit(200)),
                    F.concat(
                        F.lit(
                            "q240 duplicate-vec_id guard: largest cluster "
                            "holds "
                        ),
                        F.col("__max_cluster").cast("string"),
                        F.lit(" members with "),
                        F.col("__max_dup").cast("string"),
                        F.lit(" duplicate ids (shard_size=200)"),
                    ),
                ).cast("boolean"),
                F.lit(True),
            )
        )
        .drop("__max_cluster", "__max_dup")
        .orderBy("vec_id")
    )


def q218_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance diverse re-ranking (Carbonell &
    Goldstein 1998) — the RAG diversity pass: from the top-20 cosine
    candidates for vec 0, greedily select 5, each step maximizing
    ``rel − λ·max_sim_to_selected`` with λ=0.5. Scored ENTIRELY in
    integers: relevance and pair sims are e4-rounded first, and with
    λ=1/2 the objective doubles to ``2·rel_e4 − max_pair_e4`` — no
    float enters a comparison, so greedy ties are exact cross-engine
    (tie → smaller vec_id). The 5 steps unroll into the plan (loop
    builds the plan, not data); candidates and the 20×19 pair-sim frame
    are localCheckpointed once. Scale: everything after the top-k cut
    is k-sized — MMR cost is independent of corpus size by design."""
    emb = _t(spark, sf_dir, "embeddings")
    cand = (
        cosine_topk(emb, query_id=0, k=21)
        .filter(F.col("vec_id") != 0)
        .limit(20)
        .select("vec_id", F.col("sim_e4").alias("rel_e4"))
        .localCheckpoint(eager=False)
    )
    from pandas_streaming_spark.functions import vec_cosine

    ce = cand.join(emb.select("vec_id", "embedding"), "vec_id")
    a = ce.select(
        F.col("vec_id").alias("__a"), F.col("embedding").alias("__ea")
    )
    b = ce.select(
        F.col("vec_id").alias("__b"), F.col("embedding").alias("__eb")
    )
    pairs = (
        a.join(b, F.col("__a") != F.col("__b"))
        .select(
            "__a",
            "__b",
            F.round(F.lit(10000.0) * vec_cosine("__ea", "__eb"), 0)
            .cast("long")
            .alias("__p"),
        )
        .localCheckpoint(eager=False)
    )
    sel = (
        cand.orderBy(F.col("rel_e4").desc(), "vec_id")
        .limit(1)
        .select(
            "vec_id",
            F.lit(1).cast("long").alias("step"),
            (2 * F.col("rel_e4")).cast("long").alias("mmr_2e4"),
        )
    )
    for t in range(2, 6):
        chosen = sel.select("vec_id")
        mx = (
            pairs.join(
                chosen.select(F.col("vec_id").alias("__b")), "__b"
            )
            .groupBy("__a")
            .agg(F.max("__p").alias("__mp"))
        )
        pick = (
            cand.join(chosen, "vec_id", "left_anti")
            .join(mx, cand["vec_id"] == mx["__a"])
            .select(
                "vec_id",
                F.lit(t).cast("long").alias("step"),
                (2 * F.col("rel_e4") - F.col("__mp")).cast("long").alias("mmr_2e4"),
            )
            .orderBy(F.col("mmr_2e4").desc(), "vec_id")
            .limit(1)
        )
        sel = sel.unionByName(pick)
    return sel.select("step", "vec_id", "mmr_2e4").orderBy("step")


def _jl_signs(k: int = 16, d: int = 64) -> list[list[int]]:
    """Deterministic ±1 projection matrix: sign(j, i) = +1 iff the first
    hex digit of md5("j:i") < 8 — content-addressed, so both engines
    embed the IDENTICAL literal matrix (computed at query-build time
    from constants; no data, no RNG state)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) < 8
            else -1
            for i in range(1, d + 1)
        ]
        for j in range(1, k + 1)
    ]


def q253_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection 64 → 16 dims — the
    sketching transform that makes billion-vector similarity search
    affordable (project once, search in the small space; the ±1
    'database-friendly' construction of Achlioptas 2003): out_j =
    (1/√16) · Σ_i sign(j,i)·x_i with the sign matrix a deterministic
    md5-derived LITERAL (both engines embed the same 16×64 values —
    the content-addressed move that makes a 'random' projection
    gradable). 1/√16 = 0.25 is exact binary; the inner fold runs in
    index order on both engines (the vec_cosine policy), so the doubles
    are bit-identical before the single e6 rounding. Output: the
    projected vector as an e6-integer joined string (q95/q99 array
    policy). Scale: a pure narrow map — 16 fused folds per row, no
    shuffle, no Python."""
    signs = _jl_signs()
    S = F.array(*[F.array(*[F.lit(float(v)) for v in row]) for row in signs])
    proj = F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda j: F.round(
            F.lit(1e6)
            * F.lit(0.25)
            * F.aggregate(
                F.sequence(F.lit(1), F.lit(64)),
                F.lit(0.0),
                lambda acc, i: acc
                + F.element_at(F.element_at(S, j), i)
                * F.element_at(F.col("embedding"), i).cast("double"),
            ),
            0,
        ).cast("long"),
    )
    return (
        _t(spark, sf_dir, "embeddings")
        .select("vec_id", F.concat_ws(",", proj).alias("proj_e6"))
        .orderBy("vec_id")
    )


def q259_ann_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall-vs-bucket-bits TUNING curve (q108's single operating
    point generalized — the q238/q258 curve convention): recall@10 of
    the sign-bit-bucketed ANN at n_bits ∈ {0, 2, 4, 8} over the same 20
    spread queries, one summary row per configuration (queries, total
    hits, mean and min recall in e4). n_bits=0 is the exact-baseline
    anchor (one bucket → recall 10000 by construction); the curve shows
    what each added bit of pruning costs — the candidate-set-vs-recall
    trade an ANN deployment tunes. Scale: each config is the q108 plan
    (one scored corpus pass feeding both rankings); the four configs
    are independent passes over the same cached scan."""
    emb = _t(spark, sf_dir, "embeddings")
    qids = list(range(0, 100, 5))
    outs = []
    for nb in (0, 2, 4, 8):
        r = ann_recall(emb, query_ids=qids, k=10, n_bits=nb)
        outs.append(
            r.agg(
                F.lit(nb).cast("long").alias("n_bits"),
                F.count("*").cast("long").alias("n_queries"),
                F.sum("n_hits").cast("long").alias("total_hits"),
                F.round(F.avg("recall_e4"), 0).cast("long").alias("mean_recall_e4"),
                F.min("recall_e4").cast("long").alias("min_recall_e4"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("n_bits")


def q235_split_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space distribution shift between train/val/test splits
    — the representation-level drift check a leakage-free split should
    PASS (centroids nearly coincide) and a skewed split fails: per-split
    centroids in exact integer micro-units (the q87 fixed-point policy),
    pairwise squared L2 distance as the EXACT integer Σ(a_e6−b_e6)² —
    no sqrt, no float, cross-engine exact. Overflow bound: |component|
    ≤ 1e3 → per-dim diff² ≤ 4e18/dim is the int64 edge; unit-norm
    embeddings (this fixture) sit ~6 orders below it, and wide-range
    embeddings should drop to e3 units. Scale: one (split, dim)
    aggregate + a |splits·dims| self-join — both data-reduced."""
    from pandas_streaming_spark.operators.sampling import hash_split

    emb = _t(spark, sf_dir, "embeddings")
    s = hash_split(emb, "vec_id", {"train": 80, "val": 10, "test": 10})
    cent = label_centroids(s, label_col="split").select(
        F.col("label").alias("split"), "dim", "centroid_e6"
    )
    a = cent.select(
        F.col("split").alias("split_a"), "dim",
        F.col("centroid_e6").alias("ca"),
    )
    b = cent.select(
        F.col("split").alias("split_b"), "dim",
        F.col("centroid_e6").alias("cb"),
    )
    return (
        a.join(b, "dim")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(
            F.count("*").cast("long").alias("n_dims"),
            F.sum(
                (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
            )
            .cast("long")
            .alias("dist2_e12"),
        )
        .orderBy("split_a", "split_b")
    )


def _pq_assign(emb: DataFrame):
    """Shared PQ training/assignment chain (q263 grades the codes; q274
    serves ADC queries over them): e6-quantized components with 16-dim
    subspace ids, fixed-point codebooks per (sub, cand, dim), and the
    per-(vector, subspace) exact-integer-L2 argmin as a (dist, cand)
    min-struct. Returns ``(comps, cent, best)``.

    r16 (guide §2.4/§5, scan-audit worklist): all three products are
    PINNED with lazy localCheckpoints. Every consumer family (q263
    codes, q274 ADC, q285 refine, q294 residual, q276/q278 via
    _ivf_cell_frames) composes them several times, and the lazy lineage
    re-planned the scan+posexplode under each use — q285 planned 12
    scans of embeddings, q274 10. Same exact integers either way."""
    comps = emb.select(
        "vec_id",
        F.pmod("vec_id", F.lit(4)).cast("long").alias("seed"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id",
        "seed",
        F.floor(F.col("dim") / 16).cast("long").alias("sub"),
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1e6, 0).cast("long").alias("c_e6"),
    ).localCheckpoint(eager=False)
    cent = (
        comps.groupBy("sub", "seed", "dim")
        .agg(
            F.round(F.sum("c_e6").cast("double") / F.count("*"), 0)
            .cast("long")
            .alias("cent_e6")
        )
        .withColumnRenamed("seed", "cand")
        .localCheckpoint(eager=False)
    )
    d = (
        comps.drop("seed")
        .join(cent, ["sub", "dim"])
        .groupBy("vec_id", "sub", "cand")
        .agg(
            F.sum(
                (F.col("c_e6") - F.col("cent_e6"))
                * (F.col("c_e6") - F.col("cent_e6"))
            )
            .cast("long")
            .alias("dist")
        )
    )
    # argmin with deterministic ties: min of (dist, cand) struct
    best = d.groupBy("vec_id", "sub").agg(
        F.min(F.struct(F.col("dist"), F.col("cand"))).alias("m")
    ).localCheckpoint(eager=False)
    return comps, cent, best


def q263_product_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011) — the codebook
    compression every billion-vector ANN index (IVF-PQ / FAISS shape)
    ships embeddings in, completing the repo's compression ladder
    (int8 q95, JL q253, IVF q92): the 64-dim space splits into m=4
    16-dim subspaces; each subspace trains k=4 codewords via one
    seed-based E-step (seed = vec_id % 4, exact fixed-point centroids —
    the q87/q96 policy), and each vector is encoded as 4 one-byte codes
    by nearest codeword per subspace. ALL distance arithmetic is exact
    BIGINT on e6-quantized components — Σ(c_e6 − cent_e6)² per
    (vector, subspace, candidate) — so the argmin (ties → smaller code)
    and the graded reconstruction error are engine-exact. Graded per
    vector: the 4 codes + total squared quantization error (e12 units).
    Scale: one posexplode (n·64 component rows), one (sub, dim)-keyed
    join fanning each component to k=4 candidates (constant), two
    map-side-combined aggregates, one per-(vector, subspace) argmin —
    all linear, no global sort; codebooks are (m·k·16) cells — broadcast
    size at any corpus."""
    _comps, _cent, best = _pq_assign(_t(spark, sf_dir, "embeddings"))
    return (
        best.groupBy("vec_id")
        .agg(
            *[
                F.max(F.when(F.col("sub") == s, F.col("m.cand")))
                .cast("long")
                .alias(f"code{s}")
                for s in range(4)
            ],
            F.sum("m.dist").cast("long").alias("err_e12"),
        )
        .orderBy("vec_id")
    )


def q268_dim_variance_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension variance screening — the cheap embedding-pruning
    pass (keep the high-variance dimensions) a pipeline runs before
    paying for a learned projection (the deterministic cousin of q253's
    JL sketch): variance per dimension as the EXACT integer numerator
    n·Σx² − (Σx)² over e6-quantized components, graded as
    ``var_e12 = num div n²`` — Spark's integral ``div`` on the
    DECIMAL(38) operands (NOT ``floor(a/b)``: decimal ``/`` rounds
    HALF_UP to scale 6 BEFORE the floor, so a quotient with fractional
    part ≥ 0.9999995 floors one HIGH vs duckdb's exact ``//`` — e.g.
    floor(3999999999999/2000000000000) = 2 on Spark, 1 in duckdb; the
    numerator is ≥ 0 so div == floor exactly, same policy as q266).
    Sums ride DECIMAL(38) on the Spark side / int128 in duckdb so the
    squared term can't overflow int64.
    Output: the top-16 dimensions by variance (ties → dim asc)
    with rank. Scale: one posexplode + one 64-group map-side-combined
    aggregate; the rank window runs over 64 rows — constant at any
    corpus size."""
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    comps = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    ).select(
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1e6, 0)
        .cast("decimal(38,0)")
        .alias("c_e6"),
    )
    agg = comps.groupBy("dim").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("c_e6").alias("s1"),
        F.sum(F.col("c_e6") * F.col("c_e6")).alias("s2"),
    )
    v = agg.select(
        "dim",
        F.expr("(n * s2 - s1 * s1) div (n * n)")
        .cast("long")
        .alias("var_e12"),
    )
    w = Window.orderBy(F.col("var_e12").desc(), "dim")
    return (
        v.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 16)
        .select("rank", "dim", "var_e12")
        .orderBy("rank")
    )


def _adc_table(comps, cent, query_id: int = 0):
    """Shared ADC machinery (q274 serves it corpus-wide; q276/q278 scope
    it to IVF-probed cells): the query's e6 components ``qc`` and the
    per-(subspace, codeword) exact-BIGINT squared-distance lookup table
    — m·k = 16 cells, broadcast size at any corpus scale."""
    qc = comps.filter(F.col("vec_id") == query_id).select(
        "sub", "dim", F.col("c_e6").alias("q_e6")
    )
    table = (
        qc.join(cent, ["sub", "dim"])
        .groupBy("sub", "cand")
        .agg(
            F.sum(
                (F.col("q_e6") - F.col("cent_e6"))
                * (F.col("q_e6") - F.col("cent_e6"))
            )
            .cast("long")
            .alias("qd")
        )
    )
    return qc, table


def q274_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric-distance PQ search (the SERVING half of q263 — how an
    IVF-PQ index actually answers a query, Jégou et al. 2011 §IV): the
    query vector is NOT quantized; instead a per-(subspace, codeword)
    lookup table of exact integer squared distances to the query is
    built once (m·k = 16 cells, broadcast size), and each database
    vector's distance is the SUM of 4 table lookups on its codes — no
    per-pair float math, the scan cost a billion-vector index pays per
    probe. Graded: top-10 by ADC distance for query vec 0 (ties →
    vec_id), with the exact squared L2 alongside — the
    quantization-error audit (ADC ≥ exact never holds per-pair, but
    the ranking agreement is the design readout). Every number is an
    exact BIGINT on e6 components. Scale: codebook + table are
    constant-size broadcasts; the scan is one (sub, code)-keyed join +
    per-vector sum + TakeOrdered — linear, no global sort — and the
    exact-L2 audit runs AFTER the top-10, broadcast-scoped to the 10
    survivors, so the probe pays the corpus scan once, not twice."""
    emb = _t(spark, sf_dir, "embeddings")
    comps, cent, best = _pq_assign(emb)
    codes = best.select(
        "vec_id", "sub", F.col("m.cand").alias("cand")
    )
    qc, table = _adc_table(comps, cent, query_id=0)
    adc = (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(table), ["sub", "cand"])
        .groupBy("vec_id")
        .agg(F.sum("qd").cast("long").alias("adc_e12"))
    )
    from pyspark.sql import Window

    # TakeOrdered the ADC frame FIRST, then compute the exact-L2 audit
    # for the 10 survivors only (VERDICT r11 item 3: the old plan ran
    # the n·64-row exact aggregate over the ENTIRE corpus and then kept
    # 10 rows — linear, but at a billion vectors it doubles the probe
    # cost for an audit column only the survivors need). The top-10
    # frame is a broadcast, so the exact pass is a broadcast-joined
    # scan over 10 vectors' components, not a second full aggregate.
    top = adc.orderBy("adc_e12", "vec_id").limit(10)
    exact = (
        comps.join(F.broadcast(top.select("vec_id")), "vec_id")
        .join(qc.select("dim", "q_e6"), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (F.col("c_e6") - F.col("q_e6"))
                * (F.col("c_e6") - F.col("q_e6"))
            )
            .cast("long")
            .alias("exact_e12")
        )
    )
    w = Window.orderBy("adc_e12", "vec_id")
    return (
        top.join(F.broadcast(exact), "vec_id")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "vec_id", "adc_e12", "exact_e12")
        .orderBy("rank")
    )


def _ivf_cell_frames(emb):
    """Shared IVFADC machinery (q276 grades the n_probe=2 end-to-end
    probe; q278 the n_probe sweep; q279 the cell-health audit): the
    inverted lists are the STORED label partitions (how an IVF index
    lays vectors out on disk — assignment happened at build time), the
    per-cell centroids are exact fixed-point e6 means over the full 64
    dims, and cell ranking for a query is by exact BIGINT squared L2
    between query and centroid — every number in the coarse stage an
    exact integer, like the PQ stage it feeds. Returns
    ``(lcomps, lcent, codes, qc, table, exact)`` where exact is the
    corpus-wide exact-L2 frame ground truth comes from.

    r16 (guide §2.4/§5, scan-audit worklist): every returned frame
    except ``lcomps`` is PINNED with a lazy localCheckpoint. The lazy
    composition nested comps/cent lineage inside each product, so one
    q276 probe planned 36 scans of embeddings and the q278 sweep 63 —
    each consumer re-derived codebooks, cells, codes and ground truth
    from the base table. Checkpointing materializes each product once;
    every number downstream is the same exact integer, so results are
    oracle-identical by construction."""
    comps, cent, best = _pq_assign(emb)
    codes = best.select(
        "vec_id", "sub", F.col("m.cand").alias("cand")
    ).localCheckpoint(eager=False)
    qc, table = _adc_table(comps, cent, query_id=0)
    qc = qc.localCheckpoint(eager=False)
    table = table.localCheckpoint(eager=False)
    lcomps = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1e6, 0).cast("long").alias("c_e6"),
    )
    lcent = lcomps.groupBy("label", "dim").agg(
        F.round(F.sum("c_e6").cast("double") / F.count("*"), 0)
        .cast("long")
        .alias("ce_e6")
    ).localCheckpoint(eager=False)
    exact = (
        comps.filter(F.col("vec_id") != 0)
        .join(qc.select("dim", "q_e6"), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (F.col("c_e6") - F.col("q_e6"))
                * (F.col("c_e6") - F.col("q_e6"))
            )
            .cast("long")
            .alias("exact_e12")
        )
        .localCheckpoint(eager=False)
    )
    return lcomps, lcent, codes, qc, table, exact


def _ivfpq_rerank(emb, np_: int, shortlist: int = 50, frames=None):
    """One IVFADC+R probe (Jégou et al. 2011 §IV.D): rank cells by
    exact integer L2 (query vs centroid), take ``np_`` cells, ADC-score
    ONLY their members, keep the top-``shortlist`` by ADC, then re-rank
    those survivors by exact L2 on the original vectors (a
    broadcast-scoped pass — the same survivor-scoping as q274). Returns
    (rerank_top10, n_candidates_1row, exact_top10) sharing one chain.

    ``frames`` lets a sweep caller (q278) build the probe-independent
    machinery ONCE and share it across widths (r16, guide §2.4)."""
    lcomps, lcent, codes, qc, table, exact = (
        frames if frames is not None else _ivf_cell_frames(emb)
    )
    cells = (
        lcent.join(F.broadcast(qc.select("dim", "q_e6")), "dim")
        .groupBy("label")
        .agg(
            F.sum(
                (F.col("ce_e6") - F.col("q_e6"))
                * (F.col("ce_e6") - F.col("q_e6"))
            )
            .cast("long")
            .alias("cd")
        )
        .orderBy("cd", "label")
        .limit(np_)
        .select("label")
    )
    cand_ids = (
        emb.join(F.broadcast(cells), "label", "left_semi")
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
    )
    n_cand = cand_ids.agg(F.count("*").cast("long").alias("n_candidates"))
    adc = (
        codes.join(cand_ids, "vec_id", "left_semi")
        .join(F.broadcast(table), ["sub", "cand"])
        .groupBy("vec_id")
        .agg(F.sum("qd").cast("long").alias("adc_e12"))
    )
    short = adc.orderBy("adc_e12", "vec_id").limit(shortlist)
    rerank = (
        short.join(F.broadcast(exact.join(short.select("vec_id"), "vec_id", "left_semi")), "vec_id")
        .orderBy("exact_e12", "vec_id")
        .limit(10)
    )
    exact_top10 = exact.orderBy("exact_e12", "vec_id").limit(10)
    return rerank, n_cand, exact_top10


def q276_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED IVF-PQ probe with exact re-ranking — IVFADC+R,
    Jégou et al. 2011 §IV end-to-end, the way a billion-vector index
    actually answers a query (VERDICT r11 item 7): (1) coarse stage
    ranks the stored label cells by EXACT BIGINT squared L2 between the
    query and each cell centroid and probes the nearest 2; (2) every
    member of the probed cells is scored by 4 ADC lookups on its PQ
    codes (q274's broadcast m·k table); (3) the ADC top-50 shortlist is
    re-ranked by exact L2 on the original vectors (broadcast-scoped to
    the 50 survivors — q274's survivor-scoping); top-10 by exact L2.
    The audit the item asked for: recall@10 against the exact
    corpus-wide top-10 (q108's method — per-row hit flag + the constant
    recall_at_10_e4). On this synthetic corpus label cells are only
    weakly geometric, so the curve is honest about coarse-prune loss —
    exactly what the audit exists to catch (q278 shows recall rising
    with n_probe; q279 shows WHY via per-cell coherence).
    Scale: centroids, probe list, ADC table, and the 50-row shortlist
    are broadcasts; the scan is a cell-pruned read + 4 lookups/vector;
    only the ground-truth audit touches the full corpus (production
    monitors recall on sampled probes exactly this way)."""
    emb = _t(spark, sf_dir, "embeddings")
    rerank, _n_cand, exact_top10 = _ivfpq_rerank(emb, np_=2)
    hits = rerank.join(
        F.broadcast(exact_top10.select("vec_id", F.lit(1).alias("__h"))),
        "vec_id",
        "left",
    ).select(
        "vec_id",
        "adc_e12",
        "exact_e12",
        F.coalesce("__h", F.lit(0)).cast("long").alias("hit_exact"),
    )
    rec = hits.agg(
        (F.sum("hit_exact") * 1000).cast("long").alias("recall_at_10_e4")
    )
    from pyspark.sql import Window

    w = Window.orderBy("exact_e12", "vec_id")
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(rec))
        .select(
            "rank", "vec_id", "adc_e12", "exact_e12", "hit_exact",
            "recall_at_10_e4",
        )
        .orderBy("rank")
    )


_Q278_PROBES = (1, 2, 4)


def q278_ivfpq_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ OPERATING-POINT curve — recall@10 vs scan cost as
    n_probe sweeps {1, 2, 4}: per probe width, the candidate count (the
    per-query scan cost an IVF deployment pays) and the IVFADC+R
    top-10's recall vs the exact corpus-wide top-10. This is the table
    that picks n_probe in production (Jégou §V reports exactly this
    curve); composed from q276's chain so the sweep grades the
    composition, not a reimplementation. Scale: one PQ/ADC chain
    shared across the sweep; each width adds a cell-pruned scan, never
    a corpus pass.

    r16 (scan-audit worklist): the frames are built ONCE and passed to
    every width, and the probe-independent exact top-10 is hoisted out
    of the loop — the per-width lazy rebuild planned 63 scans of
    embeddings for the 3-point sweep."""
    emb = _t(spark, sf_dir, "embeddings")
    frames = _ivf_cell_frames(emb)
    exact = frames[5]
    exact_top10 = (
        exact.orderBy("exact_e12", "vec_id").limit(10).localCheckpoint(eager=False)
    )
    rows = []
    for np_ in _Q278_PROBES:
        rerank, n_cand, _ = _ivfpq_rerank(emb, np_=np_, frames=frames)
        rec = rerank.join(
            F.broadcast(exact_top10.select("vec_id", F.lit(1).alias("__h"))),
            "vec_id",
            "left",
        ).agg(
            (F.sum(F.coalesce("__h", F.lit(0))) * 1000)
            .cast("long")
            .alias("recall_at_10_e4")
        )
        rows.append(
            n_cand.crossJoin(rec).select(
                F.lit(np_).cast("long").alias("n_probe"),
                "n_candidates",
                "recall_at_10_e4",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("n_probe")


def q279_ivf_cell_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-health audit — load balance AND geometric coherence of
    the stored cells: a fat cell makes every probe that touches it
    expensive (cost variance), and a cell whose members sit no closer
    to its centroid than random makes the coarse prune lose recall —
    the exact failure q276/q278 measure downstream. Per cell: vector
    count, corpus share in ppm, and mean squared distance to the cell
    centroid (mean_dist_e12, a rounded ratio of exact BIGINT sums); the
    __TOTAL__ row carries the corpus count, the max-over-mean load
    factor in e3 (the number an IVF rebalance triggers on), and the
    global mean dispersion for comparison — cells whose mean_dist_e12
    approaches the global value are not separating the space.
    Scale: one pass for centroids, one narrow join for distances, all
    aggregates map-side combined; the frame is |cells| rows."""
    emb = _t(spark, sf_dir, "embeddings")
    # r16 (guide §2.4/§5, scan-audit worklist): lcomps backs the
    # centroid aggregate AND the distance join, pv backs the cell frame
    # AND the total row, cells backs the per-cell report AND the load
    # factor — lazily composed, q279 planned 10 scans of embeddings.
    # Pin each reused frame once; every number is the same exact
    # integer.
    lcomps = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1e6, 0).cast("long").alias("c_e6"),
    ).localCheckpoint(eager=False)
    lcent = lcomps.groupBy("label", "dim").agg(
        F.round(F.sum("c_e6").cast("double") / F.count("*"), 0)
        .cast("long")
        .alias("ce_e6")
    )
    pv = (
        lcomps.join(lcent, ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                (F.col("c_e6") - F.col("ce_e6"))
                * (F.col("c_e6") - F.col("ce_e6"))
            )
            .cast("long")
            .alias("d2")
        )
        .localCheckpoint(eager=False)
    )
    cells = pv.groupBy("label").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(F.sum("d2") / F.count("*"), 0).cast("long").alias("mean_dist_e12"),
    ).localCheckpoint(eager=False)
    tot = pv.agg(
        F.count("*").cast("long").alias("__N"),
        F.round(F.sum("d2") / F.count("*"), 0).cast("long").alias("__md"),
    ).crossJoin(
        cells.agg(
            F.count("*").cast("long").alias("__k"),
            F.max("n_vectors").cast("long").alias("__mx"),
        )
    )
    per = cells.crossJoin(F.broadcast(tot)).select(
        F.concat(F.lit("cell_"), F.col("label").cast("string")).alias("cell"),
        "n_vectors",
        F.round(F.lit(1e6) * F.col("n_vectors") / F.col("__N"), 0)
        .cast("long")
        .alias("share_ppm"),
        "mean_dist_e12",
        F.lit(None).cast("long").alias("load_factor_e3"),
    )
    total = tot.select(
        F.lit("__TOTAL__").alias("cell"),
        F.col("__N").alias("n_vectors"),
        F.lit(1000000).cast("long").alias("share_ppm"),
        F.col("__md").alias("mean_dist_e12"),
        F.round(F.lit(1e3) * F.col("__mx") * F.col("__k") / F.col("__N"), 0)
        .cast("long")
        .alias("load_factor_e3"),
    )
    return per.unionByName(total).orderBy("cell")


def q285_pq_codebook_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One LLOYD REFINEMENT of the PQ codebooks — the training step
    that turns q263's seed codebooks into a real quantizer (production
    PQ trains each subspace's codewords with k-means; q263 is the
    E-step under seed centroids, this adds the M-step and re-measures):
    per (subspace, codeword): assigned-vector count, quantization error
    under the OLD codebook (exact BIGINT, the sum of q263's argmin
    distances), error under the RE-ESTIMATED codebook (fixed-point mean
    of the assigned components — the q96 policy), and the squared
    codeword shift. err_after ≤ err_before per cell up to the e6
    rounding of the mean (the mean is the exact L2 minimizer) — the
    convergence readout a PQ trainer monitors per iteration.
    Scale: same linear shapes as q263 (component join + map-side
    combined aggregates); codebooks stay m·k·16 cells — broadcast
    size at any corpus."""
    comps, cent, best = _pq_assign(_t(spark, sf_dir, "embeddings"))
    assigned = best.select(
        "vec_id",
        "sub",
        F.col("m.cand").alias("cand"),
        F.col("m.dist").alias("dist"),
    )
    joined = comps.drop("seed").join(assigned, ["vec_id", "sub"])
    newcent = joined.groupBy("sub", "cand", "dim").agg(
        F.round(F.sum("c_e6").cast("double") / F.count("*"), 0)
        .cast("long")
        .alias("new_e6")
    )
    eb = assigned.groupBy("sub", "cand").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.sum("dist").cast("long").alias("err_before_e12"),
    )
    ea = (
        joined.join(newcent, ["sub", "cand", "dim"])
        .groupBy("sub", "cand")
        .agg(
            F.sum(
                (F.col("c_e6") - F.col("new_e6"))
                * (F.col("c_e6") - F.col("new_e6"))
            )
            .cast("long")
            .alias("err_after_e12")
        )
    )
    sh = (
        newcent.join(cent, ["sub", "cand", "dim"])
        .groupBy("sub", "cand")
        .agg(
            F.sum(
                (F.col("new_e6") - F.col("cent_e6"))
                * (F.col("new_e6") - F.col("cent_e6"))
            )
            .cast("long")
            .alias("shift_e12")
        )
    )
    return (
        eb.join(ea, ["sub", "cand"])
        .join(sh, ["sub", "cand"])
        .select(
            "sub", "cand", "n_vectors", "err_before_e12", "err_after_e12",
            "shift_e12",
        )
        .orderBy("sub", "cand")
    )


def q273_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm QA — the sanity screen a vector pipeline runs at
    ingest (zero vectors, truncated uploads, and un-normalized batches
    all show up as norm-band anomalies before any ANN recall does):
    per-vector L2 norm as ``round(sqrt(Σ c_e6²))`` (the sum is an exact
    BIGINT over e6-quantized components; sqrt is the correctly-rounded
    IEEE op both engines agree on — the q216 policy), histogrammed into
    0.1-unit bands (norm_e6 // 100000). Graded per non-empty band:
    vector count, band min/max norm (exact integers), plus a __TOTAL__
    row carrying corpus n and the global norm range.
    Scale: one posexplode + two map-side-combined aggregates
    — the band frame is bounded by the value RANGE, not the corpus."""
    emb = _t(spark, sf_dir, "embeddings")
    norms = (
        emb.select(
            "vec_id", F.posexplode("embedding").alias("dim", "x")
        )
        .select(
            "vec_id",
            F.round(F.col("x").cast("double") * 1e6, 0)
            .cast("long")
            .alias("c_e6"),
        )
        .groupBy("vec_id")
        .agg(
            F.round(F.sqrt(F.sum(F.col("c_e6") * F.col("c_e6"))), 0)
            .cast("long")
            .alias("norm_e6")
        )
    )
    bands = (
        norms.groupBy(
            F.expr("norm_e6 div 100000").cast("long").alias("band")
        )
        .agg(
            F.count("*").cast("long").alias("n_vectors"),
            F.min("norm_e6").cast("long").alias("min_norm_e6"),
            F.max("norm_e6").cast("long").alias("max_norm_e6"),
        )
        .select(
            F.concat(F.lit("band_"), F.lpad(F.col("band").cast("string"), 3, "0"))
            .alias("band"),
            "n_vectors",
            "min_norm_e6",
            "max_norm_e6",
        )
    )
    total = norms.agg(
        F.lit("__TOTAL__").alias("band"),
        F.count("*").cast("long").alias("n_vectors"),
        F.min("norm_e6").cast("long").alias("min_norm_e6"),
        F.max("norm_e6").cast("long").alias("max_norm_e6"),
    )
    return bands.unionByName(total).orderBy("band")


def q294_residual_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESIDUAL product quantization — PQ trained on the coarse-stage
    residuals x − centroid(cell(x)) rather than raw vectors (Jégou
    et al. 2011 §IV.A: the configuration IVFADC actually ships, because
    residuals concentrate around 0 and the same codebook budget buys
    more precision): coarse stage = the stored label cells with exact
    fixed-point e6 centroids (q276's inverted lists), residual
    components are EXACT integer differences of two e6 longs, and the
    PQ train/assign is the q263 chain re-run on them (m=4 × k=4,
    exact-BIGINT L2 argmin, ties → smaller code). Graded per vector:
    the 4 residual codes, residual quantization error, the raw-PQ error
    twin (q263's), and the constant corpus-level gain_ppm =
    (Σraw − Σres)/Σraw — measured ~1.9% here, HONESTLY small because
    label cells are only weakly geometric on this corpus (q279's
    finding; with k-means coarse cells the residual gain is the whole
    point of IVFADC). Scale: two posexplode passes, cell-keyed +
    (sub, dim)-keyed joins, constant-size codebooks, map-side-combined
    aggregates — same linear shape as q263 plus one broadcastable
    centroid join."""
    emb = _t(spark, sf_dir, "embeddings")
    _comps, _cent, rawbest = _pq_assign(emb)
    raw = rawbest.groupBy("vec_id").agg(
        F.sum("m.dist").cast("long").alias("err_raw_e12")
    )
    lcomps = emb.select(
        "vec_id",
        "label",
        F.pmod("vec_id", F.lit(4)).cast("long").alias("seed"),
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id",
        "label",
        "seed",
        F.floor(F.col("dim") / 16).cast("long").alias("sub"),
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1e6, 0).cast("long").alias("c_e6"),
    )
    lcent = lcomps.groupBy("label", "dim").agg(
        F.round(F.sum("c_e6").cast("double") / F.count("*"), 0)
        .cast("long")
        .alias("lc_e6")
    )
    rcomps = lcomps.join(lcent, ["label", "dim"]).select(
        "vec_id",
        "seed",
        "sub",
        "dim",
        (F.col("c_e6") - F.col("lc_e6")).alias("r_e6"),
    )
    rcent = (
        rcomps.groupBy("sub", "seed", "dim")
        .agg(
            F.round(F.sum("r_e6").cast("double") / F.count("*"), 0)
            .cast("long")
            .alias("cent_e6")
        )
        .withColumnRenamed("seed", "cand")
    )
    rd = (
        rcomps.drop("seed")
        .join(rcent, ["sub", "dim"])
        .groupBy("vec_id", "sub", "cand")
        .agg(
            F.sum(
                (F.col("r_e6") - F.col("cent_e6"))
                * (F.col("r_e6") - F.col("cent_e6"))
            )
            .cast("long")
            .alias("dist")
        )
    )
    best = rd.groupBy("vec_id", "sub").agg(
        F.min(F.struct(F.col("dist"), F.col("cand"))).alias("m")
    )
    res = best.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("sub") == s, F.col("m.cand")))
            .cast("long")
            .alias(f"code{s}")
            for s in range(4)
        ],
        F.sum("m.dist").cast("long").alias("err_res_e12"),
    )
    both = res.join(raw, "vec_id")
    gain = both.agg(
        F.round(
            F.lit(1e6)
            * (F.sum("err_raw_e12") - F.sum("err_res_e12"))
            / F.sum("err_raw_e12"),
            0,
        )
        .cast("long")
        .alias("gain_ppm")
    )
    return (
        both.crossJoin(F.broadcast(gain))
        .select(
            "vec_id",
            "code0",
            "code1",
            "code2",
            "code3",
            "err_res_e12",
            "err_raw_e12",
            "gain_ppm",
        )
        .orderBy("vec_id")
    )


def q301_ndcg_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the RRF hybrid retriever — the graded-relevance
    ranking metric (Järvelin & Kekäläinen 2002) every retrieval eval
    reports next to MRR (q227) and recall (q108): take q182's fused
    top-10 AS the system ranking, define relevance as membership in the
    exact cosine top-10 for the same probe (binary — the q108
    convention), and compute DCG = Σ rel_i·w_i with the position
    discounts w_i = round(1e6/log2(i+1)) as e6 integers (per-term
    rounding, the q181 float discipline — log2 of small integers, 1-ulp
    both engines, then everything downstream is exact longs); IDCG is
    the same 10 discounts (10 relevant docs exist), so
    ndcg_e4 = round(1e4·DCG/IDCG) is a ratio of exact integers. Graded
    per rank row with the two constants — the eval the q182 fusion
    would be tuned against. Scale: everything operates on the 10-row
    fused frame + a broadcast 10-row relevance set; the only corpus
    passes are q182's own."""
    from pyspark.sql import Window

    fused = q182_rrf_hybrid(spark, sf_dir)
    rel = (
        cosine_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=11)
        .filter(F.col("vec_id") != 0)
        .limit(10)
        .select(F.col("vec_id").alias("doc_id"), F.lit(1).alias("__rel"))
    )
    w = Window.orderBy(F.col("rrf_e6").desc(), "doc_id")
    ranked = (
        fused.select("doc_id", "rrf_e6")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .join(F.broadcast(rel), "doc_id", "left")
        .select(
            "rank",
            "doc_id",
            "rrf_e6",
            F.coalesce("__rel", F.lit(0)).cast("long").alias("relevant"),
            F.round(F.lit(1e6) / F.log2(F.col("rank") + 1), 0)
            .cast("long")
            .alias("__w"),
        )
    )
    tot = ranked.agg(
        F.sum(F.col("relevant") * F.col("__w")).cast("long").alias("dcg_e6"),
        F.sum("__w").cast("long").alias("__idcg"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "rank",
            "doc_id",
            "rrf_e6",
            "relevant",
            "dcg_e6",
            F.round(F.lit(1e4) * F.col("dcg_e6") / F.col("__idcg"), 0)
            .cast("long")
            .alias("ndcg_e4"),
        )
        .orderBy("rank")
    )


_Q300_ITERS = 3


def q300_kmeans_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-MEANS-trained IVF cells — the production fix q279's cell-health
    audit predicted (label cells are only weakly geometric, so coarse
    pruning loses recall; a real inverted file trains its coarse
    quantizer with Lloyd iterations): seed k=4 centroids from the
    vec_id%4 means (the q96/q263 seed convention), run
    ``_Q300_ITERS`` Lloyd iterations (E-step: exact-e12 argmin
    assignment, ties → smaller cell; M-step: fixed-point e6 means;
    centroids localCheckpoint'd per iteration — q292's lineage policy),
    store the final assignment as the inverted lists, then answer the
    vec-0 probe at n_probe=2 with exact re-ranking and grade recall@10
    against the corpus-wide exact top-10 — WITH the label-cell twin
    (same probe width, same re-rank, q276's stored cells) as a constant
    comparison column, so the query itself states whether training the
    coarse quantizer bought recall. A cluster that empties simply drops
    out (both engines agree — group-by semantics). Scale: each Lloyd
    iteration is one k-fan component join + two map-side-combined
    aggregates with broadcast-size centroids; the probe is cell-pruned;
    only the ground-truth audit is a corpus pass (sampled in
    production)."""
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    # r16 (guide §2.4/§5, scan-audit worklist): comps feeds the seed
    # centroids, BOTH halves of every Lloyd iteration, the stored
    # assignment, the query vector and the ground-truth frame — the lazy
    # form re-planned the scan+posexplode for each (21 scans of
    # embeddings in the audited plan). Pin one materialization; every
    # downstream number is the same exact integer.
    comps = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1e6, 0).cast("long").alias("c_e6"),
    ).localCheckpoint(eager=False)

    def assign(cent: DataFrame) -> DataFrame:
        return (
            comps.join(cent, "dim")
            .groupBy("vec_id", "cl")
            .agg(
                F.sum(
                    (F.col("c_e6") - F.col("ce_e6"))
                    * (F.col("c_e6") - F.col("ce_e6"))
                ).alias("__d")
            )
            .groupBy("vec_id")
            .agg(F.min(F.struct(F.col("__d"), F.col("cl"))).alias("__m"))
            .select("vec_id", F.col("__m.cl").alias("cl"))
        )

    cent = (
        comps.select(
            F.pmod("vec_id", F.lit(4)).cast("long").alias("cl"), "dim", "c_e6"
        )
        .groupBy("cl", "dim")
        .agg(
            F.round(F.sum("c_e6").cast("double") / F.count("*"), 0)
            .cast("long")
            .alias("ce_e6")
        )
    )
    for _i in range(_Q300_ITERS):
        asn = assign(cent)
        cent = (
            comps.join(asn, "vec_id")
            .groupBy("cl", "dim")
            .agg(
                F.round(F.sum("c_e6").cast("double") / F.count("*"), 0)
                .cast("long")
                .alias("ce_e6")
            )
            .localCheckpoint()
        )
    cells = assign(cent)
    qc = comps.filter(F.col("vec_id") == 0).select(
        "dim", F.col("c_e6").alias("q_e6")
    )
    crank = (
        cent.join(F.broadcast(qc), "dim")
        .groupBy("cl")
        .agg(
            F.sum(
                (F.col("ce_e6") - F.col("q_e6"))
                * (F.col("ce_e6") - F.col("q_e6"))
            )
            .cast("long")
            .alias("__cd")
        )
        .orderBy("__cd", "cl")
        .limit(2)
        .select("cl")
    )
    cand = (
        cells.join(F.broadcast(crank), "cl", "left_semi")
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
    )
    exact = (
        comps.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qc), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (F.col("c_e6") - F.col("q_e6"))
                * (F.col("c_e6") - F.col("q_e6"))
            )
            .cast("long")
            .alias("exact_e12")
        )
    )
    # ground truth is consumed three times (ex10, trained-cell top,
    # label-cell twin top): pin it too (r16)
    exact = exact.localCheckpoint(eager=False)
    ex10 = (
        exact.orderBy("exact_e12", "vec_id")
        .limit(10)
        .select("vec_id", F.lit(1).alias("__h"))
    )
    top = (
        exact.join(cand, "vec_id", "left_semi")
        .orderBy("exact_e12", "vec_id")
        .limit(10)
    )
    hits = top.join(F.broadcast(ex10), "vec_id", "left").select(
        "vec_id",
        "exact_e12",
        F.coalesce("__h", F.lit(0)).cast("long").alias("hit_exact"),
    )
    rec = hits.agg(
        (F.sum("hit_exact") * 1000).cast("long").alias("recall_at_10_e4")
    )
    ncand = cand.agg(F.count("*").cast("long").alias("n_candidates"))
    # the stored-label-cell twin at the same probe width + re-rank
    lcent = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("dim", "x"))
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            F.round(F.col("x").cast("double") * 1e6, 0)
            .cast("long")
            .alias("c_e6"),
        )
        .groupBy("label", "dim")
        .agg(
            F.round(F.sum("c_e6").cast("double") / F.count("*"), 0)
            .cast("long")
            .alias("lce_e6")
        )
    )
    lrank = (
        lcent.join(F.broadcast(qc), "dim")
        .groupBy("label")
        .agg(
            F.sum(
                (F.col("lce_e6") - F.col("q_e6"))
                * (F.col("lce_e6") - F.col("q_e6"))
            )
            .cast("long")
            .alias("__cd")
        )
        .orderBy("__cd", "label")
        .limit(2)
        .select("label")
    )
    lcand = (
        emb.join(F.broadcast(lrank), "label", "left_semi")
        .filter(F.col("vec_id") != 0)
        .select("vec_id")
    )
    ltop = (
        exact.join(lcand, "vec_id", "left_semi")
        .orderBy("exact_e12", "vec_id")
        .limit(10)
    )
    lrec = (
        ltop.join(F.broadcast(ex10), "vec_id", "left")
        .agg(
            (F.sum(F.coalesce("__h", F.lit(0))) * 1000)
            .cast("long")
            .alias("recall_label_e4")
        )
    )
    w = Window.orderBy("exact_e12", "vec_id")
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(rec))
        .crossJoin(F.broadcast(ncand))
        .crossJoin(F.broadcast(lrec))
        .select(
            "rank",
            "vec_id",
            "exact_e12",
            "hit_exact",
            "recall_at_10_e4",
            "n_candidates",
            "recall_label_e4",
        )
        .orderBy("rank")
    )


_Q296_BLK = 128  # max members per hubness block (cells sub-shard past this)


def q296_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUBNESS audit of the cell-blocked kNN graph (Radovanović et al.
    2010) — the vector-search QA metric that catches degenerate
    embedding spaces: in high-dimensional or badly-normalized spaces a
    few "hub" vectors appear in everyone's top-k while antihubs appear
    in no one's, and retrieval quality collapses. Build the 3-NN graph
    WITHIN each stored label cell (the q92/q279 inverted lists — the
    within-cell pair expansion is bounded by cell size, the LSH
    max_bucket posture, never corpus²), distances exact e12 integers,
    ties → neighbor id; then grade the k-occurrence distribution:
    in-degree → vector count + share ppm. A healthy graph concentrates
    near in-degree k; a heavy right tail = hubs. Scale: cells are
    SUB-SHARDED into content-addressed blocks of ≤ ``_Q296_BLK``
    members (md5(vec_id) % ceil(m/cap) — the q240 semdedup_scaled move:
    with a FIXED cell count, within-cell pairs grow as m², 14.4×
    measured at the 10× replica before blocking; block-local pairs are
    Σ(m/b)²·b ≈ m·cap = linear, and at the graded SFs every cell
    resolves to ONE block so the graded graph is exactly the unblocked
    one), then one (label, blk, dim)-keyed self-join, one per-source
    rank window, one map-side-combined in-degree aggregate; the
    histogram frame is bounded by the max in-degree."""
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")
    blk = emb.select(
        "vec_id",
        "label",
        (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 7),
                16,
                10,
            ).cast("long")
            % F.expr(
                f"CAST((count(*) OVER (PARTITION BY label) + {_Q296_BLK - 1})"
                f" div {_Q296_BLK} AS BIGINT)"
            )
        ).alias("blk"),
    )
    comps = (
        emb.select("vec_id", F.posexplode("embedding").alias("dim", "x"))
        .select(
            "vec_id",
            F.col("dim").cast("long").alias("dim"),
            F.round(F.col("x").cast("double") * 1e6, 0)
            .cast("long")
            .alias("c_e6"),
        )
        .join(blk, "vec_id")
        # r16 (guide §2.4/§5): both sides of the block self-join read
        # this frame — lazily composed, each side re-ran the explode +
        # block-assignment window (6 scans of embeddings in the audited
        # plan). Pin it once.
        .localCheckpoint(eager=False)
    )
    a = comps.select(
        F.col("vec_id").alias("src"),
        "label",
        "blk",
        "dim",
        F.col("c_e6").alias("ca"),
    )
    b = comps.select(
        F.col("vec_id").alias("dst"),
        "label",
        "blk",
        "dim",
        F.col("c_e6").alias("cb"),
    )
    pairs = (
        a.join(b, ["label", "blk", "dim"])
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(
            F.sum((F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb")))
            .cast("long")
            .alias("d_e12")
        )
    )
    w3 = Window.partitionBy("src").orderBy("d_e12", "dst")
    knn = pairs.withColumn("__r", F.row_number().over(w3)).filter(
        F.col("__r") <= 3
    )
    indeg = (
        emb.select("vec_id")
        .join(
            knn.groupBy("dst").agg(F.count("*").cast("long").alias("__ind")),
            emb.vec_id == F.col("dst"),
            "left",
        )
        .select(F.coalesce("__ind", F.lit(0)).cast("long").alias("in_degree"))
        # consumed by the corpus-count row AND the histogram — pin so
        # the kNN-graph chain runs once (r16)
        .localCheckpoint(eager=False)
    )
    tot = indeg.agg(F.count("*").cast("long").alias("__N"))
    return (
        indeg.groupBy("in_degree")
        .agg(F.count("*").cast("long").alias("n_vectors"))
        .crossJoin(F.broadcast(tot))
        .select(
            "in_degree",
            "n_vectors",
            F.round(F.lit(1e6) * F.col("n_vectors") / F.col("__N"), 0)
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("in_degree")
    )


def q291_hamming_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY sign-quantized ANN (Charikar 2002 SimHash for dense
    vectors / the 1-bit tier of the compression ladder: float32 → int8
    q95 → PQ q263 → 1 bit/dim here, a 32× memory cut): binarize each
    64-dim embedding by component sign, pack the bits into TWO BIGINT
    words (32 bits each — 2^63 would overflow the signed top bit in one
    word), and answer "nearest to vec 0" by Hamming distance = popcount
    of the XOR'd words — integer-exact in both engines (Spark
    ``bit_count``/duckdb ``BIT_COUNT`` both count two's-complement set
    bits). Top-10 by (hamming, vec_id) with the q108/q276 audit:
    per-row hit flag against the EXACT e12 integer-L2 top-10 plus the
    constant recall@10 (e4). This is the coarsest, fastest serving tier
    — a billion packed codes fit in 16 GB and a probe is two XORs + two
    popcounts per vector, the prefilter binary-rescoring systems run
    before PQ/exact re-rank. Scale: the pack is one narrow map; the
    scan is embarrassingly parallel with a broadcast 1-row query; only
    the ground-truth audit touches full vectors (sampled in
    production, exactly like q276's)."""
    from pyspark.sql import Window

    emb = _t(spark, sf_dir, "embeddings")

    def pack(lo: int):
        return F.expr(
            f"aggregate(sequence({lo}, {lo + 31}), CAST(0 AS BIGINT), "
            f"(acc, i) -> acc + IF(element_at(embedding, i + 1) > 0, "
            f"shiftleft(CAST(1 AS BIGINT), i - {lo}), CAST(0 AS BIGINT)))"
        )

    # r16 (guide §2.4/§5, scan-audit worklist): codes feeds the query
    # row AND the scan, comps the query components AND the ground
    # truth, hits the recall row AND the graded readout — lazily
    # composed q291 planned 8 scans of embeddings (each re-running the
    # 64-step pack fold). Pin the reused frames; same exact integers.
    codes = emb.select(
        "vec_id", pack(0).alias("h_lo"), pack(32).alias("h_hi")
    ).localCheckpoint(eager=False)
    q = codes.filter(F.col("vec_id") == 0).select(
        F.col("h_lo").alias("q_lo"), F.col("h_hi").alias("q_hi")
    )
    ham = (
        codes.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                F.bit_count(F.col("h_lo").bitwiseXOR(F.col("q_lo")))
                + F.bit_count(F.col("h_hi").bitwiseXOR(F.col("q_hi")))
            )
            .cast("long")
            .alias("hamming"),
        )
    )
    top = ham.orderBy("hamming", "vec_id").limit(10)
    comps = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim", "x")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("x").cast("double") * 1e6, 0).cast("long").alias("c_e6"),
    ).localCheckpoint(eager=False)
    qc = comps.filter(F.col("vec_id") == 0).select(
        "dim", F.col("c_e6").alias("q_e6")
    )
    exact = (
        comps.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qc), "dim")
        .groupBy("vec_id")
        .agg(
            F.sum(
                (F.col("c_e6") - F.col("q_e6"))
                * (F.col("c_e6") - F.col("q_e6"))
            )
            .cast("long")
            .alias("exact_e12")
        )
    )
    ex10 = (
        exact.orderBy("exact_e12", "vec_id")
        .limit(10)
        .select("vec_id", F.lit(1).alias("__h"))
    )
    hits = top.join(F.broadcast(ex10), "vec_id", "left").select(
        "vec_id",
        "hamming",
        F.coalesce("__h", F.lit(0)).cast("long").alias("hit_exact"),
    ).localCheckpoint(eager=False)
    rec = hits.agg(
        (F.sum("hit_exact") * 1000).cast("long").alias("recall_at_10_e4")
    )
    w = Window.orderBy("hamming", "vec_id")
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(rec))
        .select("rank", "vec_id", "hamming", "hit_exact", "recall_at_10_e4")
        .orderBy("rank")
    )


QUERIES = {
    "q291_hamming_ann": q291_hamming_ann,
    "q294_residual_pq": q294_residual_pq,
    "q296_knn_hubness": q296_knn_hubness,
    "q300_kmeans_ivf_recall": q300_kmeans_ivf_recall,
    "q301_ndcg_rrf": q301_ndcg_rrf,
    "q182_rrf_hybrid": q182_rrf_hybrid,
    "q263_product_quantization": q263_product_quantization,
    "q268_dim_variance_prune": q268_dim_variance_prune,
    "q273_embedding_norm_audit": q273_embedding_norm_audit,
    "q274_pq_adc_search": q274_pq_adc_search,
    "q276_ivfpq_search": q276_ivfpq_search,
    "q278_ivfpq_probe_sweep": q278_ivfpq_probe_sweep,
    "q279_ivf_cell_balance": q279_ivf_cell_balance,
    "q285_pq_codebook_refine": q285_pq_codebook_refine,
    "q207_semdedup": q207_semdedup,
    "q218_mmr_rerank": q218_mmr_rerank,
    "q240_semdedup_scaled": q240_semdedup_scaled,
    "q253_jl_projection": q253_jl_projection,
    "q259_ann_recall_curve": q259_ann_recall_curve,
    "q235_split_embedding_drift": q235_split_embedding_drift,
    "q39_similarity_topk": q39_similarity_topk,
    "q42_similarity_join": q42_similarity_join,
    "q57_ann_bucketed": q57_ann_bucketed,
    "q58_multimodal_decode": q58_multimodal_decode,
    "q59_embedding_neardup": q59_embedding_neardup,
    "q79_frame_sample": q79_frame_sample,
    "q86_knn_join": q86_knn_join,
    "q87_label_centroid": q87_label_centroid,
    "q91_centroid_assign": q91_centroid_assign,
    "q92_ivf_topk": q92_ivf_topk,
    "q95_quantize_int8": q95_quantize_int8,
    "q96_kmeans_step": q96_kmeans_step,
    "q99_normalize_matryoshka": q99_normalize_matryoshka,
    "q108_ann_recall": q108_ann_recall,
}

#: q263's codebook/assignment chain + the per-(sub, cand) query lookup
#: table — the shared WITH-prefix for every PQ/ADC oracle (q274 serves
#: corpus-wide; llm.py's q276/q278 append the IVF coarse probe to it)
_PQ_SQL = """
WITH comps AS MATERIALIZED (
  SELECT vec_id, CAST(vec_id % 4 AS BIGINT) AS seed,
         CAST(FLOOR((generate_subscripts(embedding, 1) - 1) / 16) AS BIGINT) AS sub,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
cent AS MATERIALIZED (
  SELECT sub, seed AS cand, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS cent_e6
  FROM comps GROUP BY sub, seed, dim
),
d AS (
  SELECT a.vec_id, a.sub, c.cand,
         CAST(SUM((a.c_e6 - c.cent_e6) * (a.c_e6 - c.cent_e6)) AS BIGINT) AS dist
  FROM comps a JOIN cent c ON c.sub = a.sub AND c.dim = a.dim
  GROUP BY 1, 2, 3
),
codes AS MATERIALIZED (
  SELECT vec_id, sub, cand FROM (
    SELECT vec_id, sub, cand,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, cand) AS rn
    FROM d
  ) WHERE rn = 1
),
qc AS (SELECT sub, dim, c_e6 AS q_e6 FROM comps WHERE vec_id = 0),
tq AS MATERIALIZED (
  SELECT c.sub, c.cand,
         CAST(SUM((q.q_e6 - c.cent_e6) * (q.q_e6 - c.cent_e6)) AS BIGINT) AS qd
  FROM qc q JOIN cent c ON c.sub = q.sub AND c.dim = q.dim
  GROUP BY 1, 2
)"""

#: the IVFADC+R coarse stage as a WITH-continuation of _PQ_SQL: stored
#: label cells, exact-integer centroid ranking for query vec 0, and the
#: exact-L2 ground-truth frames the recall audit reads
_IVF_COARSE_SQL = """,
lcomps AS MATERIALIZED (
  SELECT vec_id, label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
lcent AS MATERIALIZED (
  SELECT label, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce_e6
  FROM lcomps GROUP BY label, dim
),
crank AS MATERIALIZED (
  SELECT label, ROW_NUMBER() OVER (ORDER BY cd, label) AS pr FROM (
    SELECT l.label,
           CAST(SUM((l.ce_e6 - q.q_e6) * (l.ce_e6 - q.q_e6)) AS BIGINT) AS cd
    FROM lcent l JOIN qc q ON q.dim = l.dim
    GROUP BY l.label
  )
),
exall AS MATERIALIZED (
  SELECT a.vec_id,
         CAST(SUM((a.c_e6 - q.q_e6) * (a.c_e6 - q.q_e6)) AS BIGINT) AS exact_e12
  FROM comps a JOIN qc q ON q.dim = a.dim
  WHERE a.vec_id <> 0
  GROUP BY a.vec_id
),
ex10 AS MATERIALIZED (
  SELECT vec_id FROM exall ORDER BY exact_e12, vec_id LIMIT 10
)"""


def _ivfpq_probe_sql(np_: int) -> str:
    """Per-probe-width continuation for the q276/q278 oracles: probed
    cell members, their ADC shortlist-50, and the exact re-rank top-10
    — the same IVFADC+R stages as _ivfpq_rerank."""
    return f""",
cand{np_} AS (
  SELECT e.vec_id FROM embeddings e
  WHERE e.label IN (SELECT label FROM crank WHERE pr <= {np_})
    AND e.vec_id <> 0
),
adc{np_} AS (
  SELECT k.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_e12
  FROM codes k JOIN tq t ON t.sub = k.sub AND t.cand = k.cand
  WHERE k.vec_id IN (SELECT vec_id FROM cand{np_})
  GROUP BY k.vec_id
),
short{np_} AS (
  SELECT vec_id, adc_e12 FROM adc{np_} ORDER BY adc_e12, vec_id LIMIT 50
),
rr{np_} AS (
  SELECT s.vec_id, s.adc_e12, x.exact_e12
  FROM short{np_} s JOIN exall x USING (vec_id)
  ORDER BY x.exact_e12, s.vec_id LIMIT 10
)"""


ORACLES = {
    # seed means + 3 unrolled Lloyd iterations + final assignment;
    # n_probe=2 exact-re-rank probe for BOTH trained and label cells
    "q300_kmeans_ivf_recall": """
WITH comps AS MATERIALIZED (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0)
              AS BIGINT) AS c_e6
  FROM embeddings
),
cent0 AS (
  SELECT CAST(vec_id % 4 AS BIGINT) AS cl, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce
  FROM comps GROUP BY 1, 2
),
asn1 AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d, cl) AS rn
    FROM (SELECT a.vec_id, c.cl,
                 CAST(SUM((a.c_e6 - c.ce) * (a.c_e6 - c.ce)) AS BIGINT) AS d
          FROM comps a JOIN cent0 c USING (dim) GROUP BY 1, 2)
  ) WHERE rn = 1
),
cent1 AS MATERIALIZED (
  SELECT s.cl, a.dim,
         CAST(ROUND(CAST(SUM(a.c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce
  FROM comps a JOIN asn1 s USING (vec_id) GROUP BY 1, 2
),
asn2 AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d, cl) AS rn
    FROM (SELECT a.vec_id, c.cl,
                 CAST(SUM((a.c_e6 - c.ce) * (a.c_e6 - c.ce)) AS BIGINT) AS d
          FROM comps a JOIN cent1 c USING (dim) GROUP BY 1, 2)
  ) WHERE rn = 1
),
cent2 AS MATERIALIZED (
  SELECT s.cl, a.dim,
         CAST(ROUND(CAST(SUM(a.c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce
  FROM comps a JOIN asn2 s USING (vec_id) GROUP BY 1, 2
),
asn3 AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d, cl) AS rn
    FROM (SELECT a.vec_id, c.cl,
                 CAST(SUM((a.c_e6 - c.ce) * (a.c_e6 - c.ce)) AS BIGINT) AS d
          FROM comps a JOIN cent2 c USING (dim) GROUP BY 1, 2)
  ) WHERE rn = 1
),
cent3 AS MATERIALIZED (
  SELECT s.cl, a.dim,
         CAST(ROUND(CAST(SUM(a.c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce
  FROM comps a JOIN asn3 s USING (vec_id) GROUP BY 1, 2
),
cells AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl, ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d, cl) AS rn
    FROM (SELECT a.vec_id, c.cl,
                 CAST(SUM((a.c_e6 - c.ce) * (a.c_e6 - c.ce)) AS BIGINT) AS d
          FROM comps a JOIN cent3 c USING (dim) GROUP BY 1, 2)
  ) WHERE rn = 1
),
qc AS (SELECT dim, c_e6 AS q FROM comps WHERE vec_id = 0),
crank AS (
  SELECT cl FROM (
    SELECT c.cl, CAST(SUM((c.ce - q.q) * (c.ce - q.q)) AS BIGINT) AS cd
    FROM cent3 c JOIN qc q USING (dim) GROUP BY 1
  ) ORDER BY cd, cl LIMIT 2
),
cand AS (
  SELECT vec_id FROM cells
  WHERE cl IN (SELECT cl FROM crank) AND vec_id <> 0
),
exact AS MATERIALIZED (
  SELECT a.vec_id,
         CAST(SUM((a.c_e6 - q.q) * (a.c_e6 - q.q)) AS BIGINT) AS exact_e12
  FROM comps a JOIN qc q USING (dim) WHERE a.vec_id <> 0 GROUP BY a.vec_id
),
ex10 AS (SELECT vec_id FROM exact ORDER BY exact_e12, vec_id LIMIT 10),
top AS (
  SELECT vec_id, exact_e12 FROM exact
  WHERE vec_id IN (SELECT vec_id FROM cand)
  ORDER BY exact_e12, vec_id LIMIT 10
),
hits AS (
  SELECT vec_id, exact_e12,
         CASE WHEN vec_id IN (SELECT vec_id FROM ex10)
              THEN 1 ELSE 0 END AS hit_exact
  FROM top
),
rec AS (SELECT CAST(SUM(hit_exact) * 1000 AS BIGINT) AS recall_at_10_e4
        FROM hits),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates FROM cand),
lcomps AS (
  SELECT label, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0)
              AS BIGINT) AS c_e6
  FROM embeddings
),
lcent AS (
  SELECT label, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce
  FROM lcomps GROUP BY 1, 2
),
lrank AS (
  SELECT label FROM (
    SELECT c.label, CAST(SUM((c.ce - q.q) * (c.ce - q.q)) AS BIGINT) AS cd
    FROM lcent c JOIN qc q USING (dim) GROUP BY 1
  ) ORDER BY cd, label LIMIT 2
),
lcand AS (
  SELECT vec_id FROM embeddings
  WHERE label IN (SELECT label FROM lrank) AND vec_id <> 0
),
ltop AS (
  SELECT vec_id FROM exact
  WHERE vec_id IN (SELECT vec_id FROM lcand)
  ORDER BY exact_e12, vec_id LIMIT 10
),
lrec AS (
  SELECT CAST(SUM(CASE WHEN vec_id IN (SELECT vec_id FROM ex10)
                       THEN 1 ELSE 0 END) * 1000 AS BIGINT)
           AS recall_label_e4
  FROM ltop
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY exact_e12, vec_id) AS BIGINT)
         AS rank,
       vec_id, exact_e12, CAST(hit_exact AS BIGINT) AS hit_exact,
       recall_at_10_e4, n_candidates, recall_label_e4
FROM hits CROSS JOIN rec CROSS JOIN nc CROSS JOIN lrec
ORDER BY rank
""",
    # block-local 3-NN graph (md5 sub-sharding, 1 block/cell at graded
    # SFs), exact e12 distances, k-occurrence histogram with ppm shares
    "q296_knn_hubness": f"""
WITH blk AS MATERIALIZED (
  SELECT vec_id, label,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(vec_id AS VARCHAR)), 1, 7))
              AS BIGINT)
           % ((COUNT(*) OVER (PARTITION BY label) + {_Q296_BLK - 1})
              // {_Q296_BLK}) AS b
  FROM embeddings
),
comps AS MATERIALIZED (
  SELECT e.vec_id, k.label, k.b,
         CAST(generate_subscripts(e.embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(e.embedding) AS DOUBLE), 0)
              AS BIGINT) AS c_e6
  FROM embeddings e JOIN blk k ON k.vec_id = e.vec_id
),
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         CAST(SUM((a.c_e6 - b.c_e6) * (a.c_e6 - b.c_e6)) AS BIGINT) AS d_e12
  FROM comps a
  JOIN comps b ON b.label = a.label AND b.b = a.b AND b.dim = a.dim
              AND b.vec_id <> a.vec_id
  GROUP BY 1, 2
),
knn AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src ORDER BY d_e12, dst) AS r
    FROM pairs
  ) WHERE r <= 3
),
indeg AS (
  SELECT e.vec_id, CAST(COALESCE(k.ind, 0) AS BIGINT) AS in_degree
  FROM embeddings e
  LEFT JOIN (SELECT dst, COUNT(*) AS ind FROM knn GROUP BY dst) k
    ON k.dst = e.vec_id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM indeg)
SELECT in_degree, CAST(COUNT(*) AS BIGINT) AS n_vectors,
       CAST(ROUND(1e6 * COUNT(*) / tot.n, 0) AS BIGINT) AS share_ppm
FROM indeg CROSS JOIN tot
GROUP BY in_degree, tot.n
ORDER BY in_degree
""",
    # raw-PQ chain + residual-PQ chain (coarse label centroids, exact
    # integer residuals), per-vector codes/errors, constant gain_ppm
    "q294_residual_pq": """
WITH comps AS MATERIALIZED (
  SELECT vec_id, label, CAST(vec_id % 4 AS BIGINT) AS seed,
         CAST(FLOOR((generate_subscripts(embedding, 1) - 1) / 16) AS BIGINT)
           AS sub,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0)
              AS BIGINT) AS c_e6
  FROM embeddings
),
cent AS MATERIALIZED (
  SELECT sub, seed AS cand, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce
  FROM comps GROUP BY 1, 2, 3
),
d AS (
  SELECT a.vec_id, a.sub, c.cand,
         CAST(SUM((a.c_e6 - c.ce) * (a.c_e6 - c.ce)) AS BIGINT) AS dist
  FROM comps a JOIN cent c ON c.sub = a.sub AND c.dim = a.dim
  GROUP BY 1, 2, 3
),
rawbest AS MATERIALIZED (
  SELECT vec_id, sub, dist FROM (
    SELECT vec_id, sub, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, cand) AS rn
    FROM d
  ) WHERE rn = 1
),
raw AS (
  SELECT vec_id, CAST(SUM(dist) AS BIGINT) AS err_raw_e12
  FROM rawbest GROUP BY vec_id
),
lcent AS MATERIALIZED (
  SELECT label, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS lc
  FROM comps GROUP BY 1, 2
),
rcomps AS MATERIALIZED (
  SELECT c.vec_id, c.seed, c.sub, c.dim, c.c_e6 - l.lc AS r_e6
  FROM comps c JOIN lcent l ON l.label = c.label AND l.dim = c.dim
),
rcent AS MATERIALIZED (
  SELECT sub, seed AS cand, dim,
         CAST(ROUND(CAST(SUM(r_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce
  FROM rcomps GROUP BY 1, 2, 3
),
rd AS (
  SELECT a.vec_id, a.sub, c.cand,
         CAST(SUM((a.r_e6 - c.ce) * (a.r_e6 - c.ce)) AS BIGINT) AS dist
  FROM rcomps a JOIN rcent c ON c.sub = a.sub AND c.dim = a.dim
  GROUP BY 1, 2, 3
),
resbest AS MATERIALIZED (
  SELECT vec_id, sub, cand, dist FROM (
    SELECT vec_id, sub, cand, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, cand) AS rn
    FROM rd
  ) WHERE rn = 1
),
res AS (
  SELECT vec_id,
         CAST(MAX(CASE WHEN sub = 0 THEN cand END) AS BIGINT) AS code0,
         CAST(MAX(CASE WHEN sub = 1 THEN cand END) AS BIGINT) AS code1,
         CAST(MAX(CASE WHEN sub = 2 THEN cand END) AS BIGINT) AS code2,
         CAST(MAX(CASE WHEN sub = 3 THEN cand END) AS BIGINT) AS code3,
         CAST(SUM(dist) AS BIGINT) AS err_res_e12
  FROM resbest GROUP BY vec_id
),
gain AS (
  SELECT CAST(ROUND(1e6 * (SUM(err_raw_e12) - SUM(err_res_e12))
                    / SUM(err_raw_e12), 0) AS BIGINT) AS gain_ppm
  FROM res JOIN raw USING (vec_id)
)
SELECT res.vec_id, code0, code1, code2, code3, err_res_e12, err_raw_e12,
       gain_ppm
FROM res JOIN raw USING (vec_id) CROSS JOIN gain
ORDER BY vec_id
""",
    # identical sign-pack into two 32-bit words, XOR+popcount hamming,
    # exact-e12 L2 top-10 audit with recall@10
    "q291_hamming_ann": """
WITH codes AS MATERIALIZED (
  SELECT vec_id,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(0, 31),
           i -> CASE WHEN embedding[i + 1] > 0
                THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS h_lo,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(32, 63),
           i -> CASE WHEN embedding[i + 1] > 0
                THEN (1::BIGINT << (i - 32)) ELSE 0::BIGINT END)) AS BIGINT)
           AS h_hi
  FROM embeddings
),
q AS (SELECT h_lo AS q_lo, h_hi AS q_hi FROM codes WHERE vec_id = 0),
ham AS (
  SELECT vec_id,
         CAST(BIT_COUNT(XOR(h_lo, q_lo)) + BIT_COUNT(XOR(h_hi, q_hi))
              AS BIGINT) AS hamming
  FROM codes CROSS JOIN q WHERE vec_id <> 0
),
top AS (SELECT vec_id, hamming FROM ham ORDER BY hamming, vec_id LIMIT 10),
comps AS MATERIALIZED (
  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0)
              AS BIGINT) AS c_e6
  FROM embeddings
),
qc AS (SELECT dim, c_e6 AS q_e6 FROM comps WHERE vec_id = 0),
exact AS (
  SELECT a.vec_id,
         CAST(SUM((a.c_e6 - q.q_e6) * (a.c_e6 - q.q_e6)) AS BIGINT)
           AS exact_e12
  FROM comps a JOIN qc q USING (dim) WHERE a.vec_id <> 0 GROUP BY a.vec_id
),
ex10 AS (SELECT vec_id FROM exact ORDER BY exact_e12, vec_id LIMIT 10),
hits AS (
  SELECT t.vec_id, t.hamming,
         CASE WHEN t.vec_id IN (SELECT vec_id FROM ex10)
              THEN 1 ELSE 0 END AS hit_exact
  FROM top t
),
rec AS (SELECT CAST(SUM(hit_exact) * 1000 AS BIGINT) AS recall_at_10_e4
        FROM hits)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY hamming, vec_id) AS BIGINT) AS rank,
       vec_id, hamming, CAST(hit_exact AS BIGINT) AS hit_exact,
       recall_at_10_e4
FROM hits CROSS JOIN rec
ORDER BY rank
""",
    # Lloyd M-step over the q263 assignment: re-estimated codebooks,
    # before/after quantization error, codeword shift
    "q285_pq_codebook_refine": _PQ_SQL
    + """,
assigned AS MATERIALIZED (
  SELECT vec_id, sub, cand, dist FROM (
    SELECT vec_id, sub, cand, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist, cand) AS rn
    FROM d
  ) WHERE rn = 1
),
newcent AS MATERIALIZED (
  SELECT a.sub, a.cand, c.dim,
         CAST(ROUND(CAST(SUM(c.c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS new_e6
  FROM assigned a JOIN comps c ON c.vec_id = a.vec_id AND c.sub = a.sub
  GROUP BY 1, 2, 3
),
eb AS (
  SELECT sub, cand, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         CAST(SUM(dist) AS BIGINT) AS err_before_e12
  FROM assigned GROUP BY 1, 2
),
ea AS (
  SELECT a.sub, a.cand,
         CAST(SUM((c.c_e6 - n.new_e6) * (c.c_e6 - n.new_e6)) AS BIGINT)
           AS err_after_e12
  FROM assigned a
  JOIN comps c ON c.vec_id = a.vec_id AND c.sub = a.sub
  JOIN newcent n ON n.sub = a.sub AND n.cand = a.cand AND n.dim = c.dim
  GROUP BY 1, 2
),
sh AS (
  SELECT n.sub, n.cand,
         CAST(SUM((n.new_e6 - o.cent_e6) * (n.new_e6 - o.cent_e6)) AS BIGINT)
           AS shift_e12
  FROM newcent n
  JOIN cent o ON o.sub = n.sub AND o.cand = n.cand AND o.dim = n.dim
  GROUP BY 1, 2
)
SELECT eb.sub, eb.cand, eb.n_vectors, eb.err_before_e12, ea.err_after_e12,
       sh.shift_e12
FROM eb JOIN ea USING (sub, cand) JOIN sh USING (sub, cand)
ORDER BY sub, cand
""",
    # IVFADC+R composed: L2 cell probe (2 cells) -> ADC shortlist-50 ->
    # exact re-rank top-10, recall audited vs the exact corpus top-10
    "q276_ivfpq_search": _PQ_SQL
    + _IVF_COARSE_SQL
    + _ivfpq_probe_sql(2)
    + """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY exact_e12, vec_id) AS BIGINT) AS rank,
       vec_id, adc_e12, exact_e12,
       CAST(CASE WHEN vec_id IN (SELECT vec_id FROM ex10)
                 THEN 1 ELSE 0 END AS BIGINT) AS hit_exact,
       (SELECT CAST(SUM(CASE WHEN r.vec_id IN (SELECT vec_id FROM ex10)
                             THEN 1 ELSE 0 END) * 1000 AS BIGINT)
        FROM rr2 r) AS recall_at_10_e4
FROM rr2
ORDER BY rank
""",
    # the same composition swept over n_probe ∈ {1, 2, 4}
    "q278_ivfpq_probe_sweep": _PQ_SQL
    + _IVF_COARSE_SQL
    + "".join(_ivfpq_probe_sql(p) for p in (1, 2, 4))
    + "\nSELECT * FROM (\n"
    + "\nUNION ALL\n".join(
        f"""SELECT CAST({p} AS BIGINT) AS n_probe,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{p}) AS n_candidates,
       (SELECT CAST(SUM(CASE WHEN vec_id IN (SELECT vec_id FROM ex10)
                             THEN 1 ELSE 0 END) * 1000 AS BIGINT)
        FROM rr{p}) AS recall_at_10_e4"""
        for p in (1, 2, 4)
    )
    + "\n) ORDER BY n_probe\n",
    # per-cell load + geometric coherence, __TOTAL__ carries the
    # max-over-mean load factor and the global dispersion
    "q279_ivf_cell_balance": """
WITH lcomps AS (
  SELECT vec_id, label,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
lcent AS (
  SELECT label, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS ce_e6
  FROM lcomps GROUP BY label, dim
),
pv AS (
  SELECT a.vec_id, a.label,
         CAST(SUM((a.c_e6 - l.ce_e6) * (a.c_e6 - l.ce_e6)) AS BIGINT) AS d2
  FROM lcomps a JOIN lcent l ON l.label = a.label AND l.dim = a.dim
  GROUP BY a.vec_id, a.label
),
cells AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(ROUND(SUM(d2) / COUNT(*), 0) AS BIGINT) AS md
  FROM pv GROUP BY label
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(MAX(n) AS BIGINT) AS mx
  FROM cells
),
gmd AS (SELECT CAST(ROUND(SUM(d2) / COUNT(*), 0) AS BIGINT) AS md FROM pv)
SELECT cell, n_vectors, share_ppm, mean_dist_e12, load_factor_e3 FROM (
  SELECT 'cell_' || CAST(label AS VARCHAR) AS cell, n AS n_vectors,
         CAST(ROUND(1e6 * n / tot.nt, 0) AS BIGINT) AS share_ppm,
         md AS mean_dist_e12,
         CAST(NULL AS BIGINT) AS load_factor_e3
  FROM cells, tot
  UNION ALL
  SELECT '__TOTAL__', nt, CAST(1000000 AS BIGINT), gmd.md,
         CAST(ROUND(1e3 * mx * k / nt, 0) AS BIGINT)
  FROM tot, gmd
) ORDER BY cell
""",
    # 4-lookup ADC sums + exact-L2 audit, top-10
    "q274_pq_adc_search": _PQ_SQL
    + """,
adc AS (
  SELECT k.vec_id, CAST(SUM(t.qd) AS BIGINT) AS adc_e12
  FROM codes k JOIN tq t ON t.sub = k.sub AND t.cand = k.cand
  WHERE k.vec_id <> 0
  GROUP BY k.vec_id
),
ex AS (
  SELECT a.vec_id,
         CAST(SUM((a.c_e6 - q.q_e6) * (a.c_e6 - q.q_e6)) AS BIGINT) AS exact_e12
  FROM comps a JOIN qc q ON q.dim = a.dim
  WHERE a.vec_id <> 0
  GROUP BY a.vec_id
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY adc_e12, vec_id) AS BIGINT) AS rank,
       vec_id, adc_e12, exact_e12
FROM adc JOIN ex USING (vec_id)
QUALIFY rank <= 10
ORDER BY rank
""",
    # exact BIGINT norm² over e6 components, IEEE sqrt, 0.1-unit bands
    "q273_embedding_norm_audit": """
WITH comps AS (
  SELECT vec_id,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
norms AS (
  SELECT vec_id,
         CAST(ROUND(SQRT(SUM(c_e6 * c_e6)), 0) AS BIGINT) AS norm_e6
  FROM comps GROUP BY vec_id
),
bands AS (
  SELECT 'band_' || LPAD(CAST(norm_e6 // 100000 AS VARCHAR), 3, '0') AS band,
         CAST(COUNT(*) AS BIGINT) AS n_vectors,
         CAST(MIN(norm_e6) AS BIGINT) AS min_norm_e6,
         CAST(MAX(norm_e6) AS BIGINT) AS max_norm_e6
  FROM norms GROUP BY 1
)
SELECT band, n_vectors, min_norm_e6, max_norm_e6 FROM (
  SELECT * FROM bands
  UNION ALL
  SELECT '__TOTAL__', CAST(COUNT(*) AS BIGINT), CAST(MIN(norm_e6) AS BIGINT),
         CAST(MAX(norm_e6) AS BIGINT)
  FROM norms
) ORDER BY band
""",
    # same e6 quantization, fixed-point codebooks, exact integer L2
    # argmin (ties -> smaller code), exact error sum
    "q263_product_quantization": """
WITH comps AS (
  SELECT vec_id, CAST(vec_id % 4 AS BIGINT) AS seed,
         CAST(FLOOR((generate_subscripts(embedding, 1) - 1) / 16) AS BIGINT) AS sub,
         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
cent AS (
  SELECT sub, seed AS cand, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS cent_e6
  FROM comps GROUP BY sub, seed, dim
),
d AS (
  SELECT a.vec_id, a.sub, c.cand,
         CAST(SUM((a.c_e6 - c.cent_e6) * (a.c_e6 - c.cent_e6)) AS BIGINT) AS dist
  FROM comps a JOIN cent c ON c.sub = a.sub AND c.dim = a.dim
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, sub, cand, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                            ORDER BY dist, cand) AS rn
  FROM d
)
SELECT vec_id,
       CAST(MAX(CASE WHEN sub = 0 THEN cand END) AS BIGINT) AS code0,
       CAST(MAX(CASE WHEN sub = 1 THEN cand END) AS BIGINT) AS code1,
       CAST(MAX(CASE WHEN sub = 2 THEN cand END) AS BIGINT) AS code2,
       CAST(MAX(CASE WHEN sub = 3 THEN cand END) AS BIGINT) AS code3,
       CAST(SUM(dist) AS BIGINT) AS err_e12
FROM best WHERE rn = 1
GROUP BY vec_id ORDER BY vec_id
""",
    # exact integer variance numerator, floor-divided by n^2 (int128
    # internally); same (var desc, dim) total order
    "q268_dim_variance_prune": """
WITH comps AS (
  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
agg AS (
  SELECT dim, COUNT(*) AS n, SUM(c_e6) AS s1, SUM(c_e6 * c_e6) AS s2
  FROM comps GROUP BY dim
),
v AS (
  SELECT dim,
         CAST((n * s2 - s1 * s1) // (n * n) AS BIGINT) AS var_e12
  FROM agg
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY var_e12 DESC, dim) AS BIGINT) AS rank,
       dim, var_e12
FROM v QUALIFY rank <= 16
ORDER BY rank
""",
    # identical literal sign matrix, index-order fold, 0.25 scale, e6
    "q253_jl_projection": (lambda signs: f"""
WITH s AS (SELECT {signs} AS S)
SELECT vec_id,
       ARRAY_TO_STRING(LIST_TRANSFORM(GENERATE_SERIES(1, 16), j ->
         CAST(ROUND(1000000.0 * 0.25 *
           LIST_AGGREGATE(LIST_TRANSFORM(GENERATE_SERIES(1, 64),
             i -> S[j][i] * CAST(embedding[i] AS DOUBLE)), 'sum'),
           0) AS BIGINT)), ',') AS proj_e6
FROM embeddings, s
ORDER BY vec_id
""")(str(_jl_signs()).replace('(', '[').replace(')', ']')),
    # same md5 split, fixed-point centroids, exact integer squared L2
    "q235_split_embedding_drift": """
WITH s AS (
  SELECT embedding,
         CASE WHEN CAST(CONCAT('0x', SUBSTR(MD5(CAST(vec_id AS VARCHAR)),
                   1, 7)) AS BIGINT) % 100 < 10 THEN 'test'
              WHEN CAST(CONCAT('0x', SUBSTR(MD5(CAST(vec_id AS VARCHAR)),
                   1, 7)) AS BIGINT) % 100 < 90 THEN 'train'
              ELSE 'val' END AS split
  FROM embeddings
), comps AS (
  SELECT split, generate_subscripts(embedding, 1) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0)
              AS BIGINT) AS c_e6
  FROM s
), cent AS (
  SELECT split, dim,
         CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
           AS centroid_e6
  FROM comps GROUP BY split, dim
)
SELECT a.split AS split_a, b.split AS split_b,
       CAST(COUNT(*) AS BIGINT) AS n_dims,
       CAST(SUM((a.centroid_e6 - b.centroid_e6)
                * (a.centroid_e6 - b.centroid_e6)) AS BIGINT) AS dist2_e12
FROM cent a JOIN cent b ON a.dim = b.dim AND a.split < b.split
GROUP BY 1, 2 ORDER BY 1, 2
""",
    "q79_frame_sample": """
WITH f AS (
  SELECT doc_id, text,
         UNNEST(GENERATE_SERIES(0, CAST(CEIL(LENGTH(text) / 64.0) AS BIGINT) - 1)) AS fi
  FROM documents
  WHERE regexp_matches(text, '^[\x20-\x7e]*$')
)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       CAST(LENGTH(SUBSTR(text, CAST(fi AS INT) * 64 + 1, 64)) AS INT) AS frame_len,
       MD5(SUBSTR(text, CAST(fi AS INT) * 64 + 1, 64)) AS frame_md5
FROM f
WHERE fi % 2 = 0
ORDER BY doc_id, frame_idx
LIMIT 500
""",
    "q87_label_centroid": """
WITH comps AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         -- CAST component to DOUBLE: duckdb's DECIMAL * FLOAT stays
         -- float32 while Spark promotes to double before multiplying
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
)
SELECT label, dim, COUNT(*) AS n_vecs,
       CAST(SUM(c_e6) AS BIGINT) AS sum_e6,
       -- CAST to DOUBLE first: DECIMAL/BIGINT division is decimal-typed,
       -- double division matches the Spark side bit-for-bit
       CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS centroid_e6
FROM comps
GROUP BY label, dim
ORDER BY label, dim
""",
    "q95_quantize_int8": """
WITH s AS (
  SELECT vec_id, embedding,
         LIST_MAX(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) AS scale
  FROM embeddings
)
SELECT vec_id,
       CAST(ROUND(1000000.0 * scale, 0) AS BIGINT) AS scale_e6,
       ARRAY_TO_STRING(LIST_TRANSFORM(embedding,
         x -> CAST(CASE WHEN scale = 0 THEN 0
                        ELSE ROUND(127.0 * CAST(x AS DOUBLE) / scale, 0)
                   END AS INT)), ',') AS codes
FROM s
ORDER BY vec_id
""",
    "q99_normalize_matryoshka": """
WITH s AS (
  SELECT vec_id, embedding[1:16] AS v FROM embeddings
),
n AS (
  SELECT vec_id, v,
         SQRT(LIST_AGGREGATE(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(v)),
              i -> CAST(v[i] AS DOUBLE) * CAST(v[i] AS DOUBLE)), 'sum')) AS nrm
  FROM s
)
SELECT vec_id,
       CAST(ROUND(1000000.0 * nrm, 0) AS BIGINT) AS norm_e6,
       ARRAY_TO_STRING(LIST_TRANSFORM(v,
         x -> CAST(CASE WHEN nrm = 0 THEN 0
                        ELSE ROUND(1000000.0 * CAST(x AS DOUBLE) / nrm, 0)
                   END AS BIGINT)), ',') AS unit_e6
FROM n
ORDER BY vec_id
""",
}
