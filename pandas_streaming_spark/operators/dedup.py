"""Deduplication family for large-scale training-data pipelines.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a documents
table (SURVEY.md §2.9). Everything is built-in expression composition —
md5-hex hashing keeps signatures bit-identical to a duckdb SQL oracle, so
even the *near*-dup operators are hash-match gradable (rare: most LSH
impls are impl-defined).

Scale notes (100 TB):
- exact_dedup: one shuffle on the 128-bit content hash; with AQE the
  post-shuffle partitions coalesce. Never collects.
- minhash/LSH: signature build is a narrow map (no shuffle); candidate
  generation shuffles on (band_id, band_hash) — docs only meet if they
  collide in a band, which is the whole point of LSH (no O(n²) pair scan).
- ngram_jaccard_pairs is the exact-verification stage: run it on LSH
  candidates at scale, not on the full cross product (the full version
  here is for small-table oracle grading).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pandas_streaming_spark.functions import shingles_of, tokens


def _exploded_shingles(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, shingle) rows; tokens materialized first so the shingle
    lambda reads a bound column instead of re-splitting the text per
    element (interpreted HOFs don't share subexpressions)."""
    return df.select(F.col(id_col), tokens(text_col).alias("__t")).select(
        F.col(id_col), F.explode(shingles_of(F.col("__t"), k)).alias("__sh")
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop rows whose ``text_col`` md5 collides (keep one arbitrary row).

    For deterministic grading prefer aggregating counts by hash instead of
    relying on which duplicate survives.
    """
    return df.withColumn("__h", F.md5(F.col(text_col))).dropDuplicates(["__h"]).drop("__h")


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: array of ``n_hashes`` integer minima over
    k-word shingles.

    Plan: explode shingles to rows, ONE codegen'd md5 per shingle, split
    the digest into two 28-bit ints, and derive the i-th hash as
    ``h1 + i*h2`` (Kirsch–Mitzenmacher universal family — max value
    < 2^32, so no int64 overflow and no modulo). One groupBy(doc) with
    n_hashes min() aggregates (map-side combined — the shuffle carries one
    row per doc). Earlier form hashed md5(shingle+salt) n_hashes times:
    correct, but n_hashes× the digest cost per shingle; the pure
    array-expression form (functions.minhash_sig) is ~10× slower still
    because higher-order array functions are interpreted, not codegen'd.
    """
    sh = _exploded_shingles(df, id_col, text_col, k)
    m = F.md5(F.col("__sh"))
    hashed = sh.select(
        F.col(id_col),
        F.conv(F.substring(m, 1, 7), 16, 10).cast("long").alias("__h1"),
        F.conv(F.substring(m, 8, 7), 16, 10).cast("long").alias("__h2"),
    )
    agg = hashed.groupBy(id_col).agg(
        *[
            F.min(F.col("__h1") + F.lit(i) * F.col("__h2")).alias(f"__mh{i}")
            for i in range(n_hashes)
        ]
    )
    return agg.select(
        F.col(id_col),
        F.array(*[F.col(f"__mh{i}") for i in range(n_hashes)]).alias("signature"),
    )


def banded_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """The banded MinHash table ``(id, band, band_hash)`` — the LSH
    *index* shape a crawl pipeline persists so new shards can probe it
    without recomputing the corpus (q309 rides it incrementally; q50's
    pair enumeration is a groupBy over it). Row-local per doc: the
    band rows of a union of tables equal the union of each table's
    band rows, which is what makes incremental ingest exact."""
    rows = n_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n_hashes, k)
    return sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("signature", b * rows + i + 1)
                                    for i in range(rows)
                                ],
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.band_hash")


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    max_bucket: int | None = 64,
    log_dropped: bool = False,
) -> DataFrame:
    """LSH banding: docs sharing any band (n_hashes/bands rows per band)
    become candidate pairs (a < b).

    Plan: one signature pass, shuffle on (band, band_hash) into buckets
    (collect_list bounded by bucket size — LSH's whole point is that
    buckets stay small), expand pairs inside each bucket, distinct. This
    avoids the naive self-join, which would recompute the signature
    pipeline on both sides and shuffle the banded table twice.

    ``max_bucket`` drops buckets with more members than the cap before
    pair expansion. A degenerate band (empty/boilerplate docs all hashing
    equal) otherwise produces O(bucket²) pairs in ONE task — the classic
    LSH failure mode at corpus scale. Members of a dropped bucket are
    near-identical to thousands of others, so production pipelines drop
    (or exact-hash) them rather than enumerate the quadratic pair set.
    Set ``max_bucket=None`` to disable. ``log_dropped=True`` runs one
    extra count job and logs how many buckets the cap removed.
    """
    banded = banded_table(df, id_col, text_col, n_hashes, bands, k)
    buckets = (
        banded.groupBy("band", "band_hash")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket is not None:
        if log_dropped:
            import logging

            n_dropped = buckets.filter(F.size("ids") > max_bucket).count()
            if n_dropped:
                logging.getLogger(__name__).info(
                    "lsh_candidate_pairs: dropped %d buckets over max_bucket=%d",
                    n_dropped,
                    max_bucket,
                )
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    # all ordered pairs within a bucket: for each position i, pair ids[i]
    # with every later element (arrays are tiny — bucket-sized)
    pair_structs = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size("ids")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 32,
) -> DataFrame:
    """Per-doc SimHash as an ``n_bits``-char bitstring.

    Near-dups differ in few bits; at scale, group on bit-prefix blocks
    (pigeonhole) to find low-Hamming-distance pairs without a pair scan.

    Plan: explode tokens, codegen'd md5, one groupBy(doc) with n_bits
    conditional-sum aggregates (map-side combined) — same rationale as
    :func:`minhash_signatures` vs the interpreted array-fold form
    (functions.simhash_bits).
    """
    # one md5 per token covers 32 bits (one hex char per bit); wider
    # fingerprints hash again with a block seed — without this, substring
    # past the 32-char digest is empty and bits 33+ silently freeze at -1
    # (every doc identical in the tail — found by the r4 simhash audit).
    n_blocks = (n_bits + 31) // 32
    hashed = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__t")
    ).select(
        F.col(id_col),
        *[
            F.md5(
                F.col("__t") if blk == 0 else F.concat_ws("|", "__t", F.lit(str(blk)))
            ).alias(f"__h{blk}")
            for blk in range(n_blocks)
        ],
    )
    bit_aggs = [
        F.sum(
            F.when(
                F.substring(f"__h{j // 32}", j % 32 + 1, 1).rlike("[89a-f]"), 1
            ).otherwise(-1)
        ).alias(f"__b{j}")
        for j in range(n_bits)
    ]
    agg = hashed.groupBy(id_col).agg(*bit_aggs)
    bits = [
        F.when(F.col(f"__b{j}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(n_bits)
    ]
    return agg.select(F.col(id_col), F.concat(*bits).alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over distinct k-word shingles. Returns
    (id_a, id_b, common, na, nb, jaccard).

    Two plans, one contract:

    - ``candidates=None`` (brute): every pair sharing at least one
      shingle, via the classic inverted-index self-join — pairs are
      generated per shingle then aggregated, no cross product, but the
      pair count still grows QUADRATICALLY with duplicate shingle mass
      (measured 16.2x wall at a 10x replica). This is the ground-truth
      form the audits (lsh_audit, q109, q238) need.
    - ``candidates=(id_a, id_b frame)``: the exact computation is
      SCOPED to the given pairs — both shingle streams join THROUGH the
      candidate list (fan-out = |candidates| x shingles-per-doc), the
      q272 plan. This is the production verify stage: LSH proposes,
      this disposes, and the cost tracks the candidate mass (3.4x at
      the same 10x replica), not the shingle-collision square. At
      100 TB always pass candidates.
    """
    sh = _exploded_shingles(df, id_col, text_col, k).select(id_col, "__sh").distinct().withColumnRenamed("__sh", "sh")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    if candidates is not None:
        common = (
            candidates.select("id_a", "id_b")
            .join(sh.select(F.col(id_col).alias("id_a"), "sh"), "id_a")
            .join(sh.select(F.col(id_col).alias("id_b"), "sh"), ["id_b", "sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("common"))
        )
    else:
        a, b = sh.alias("a"), sh.alias("b")
        common = (
            a.join(b, on=[F.col("a.sh") == F.col("b.sh"), F.col(f"a.{id_col}") < F.col(f"b.{id_col}")])
            .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
            .agg(F.count("*").alias("common"))
        )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "common",
            "na",
            "nb",
            (F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_audit(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    max_bucket: int | None = 64,
) -> DataFrame:
    """Candidate-quality audit for the LSH dedup path: precision and
    recall of :func:`lsh_candidate_pairs` against the exact
    :func:`ngram_jaccard_pairs` ground truth at ``threshold`` — the
    dedup-side twin of similarity.ann_recall (a determinism-graded LSH
    can silently lose recall to a banding/capping bug; this measures it
    inside the engine, deterministically).

    One row: ``n_candidates``, ``n_truth``, ``n_hits`` (candidate ∩
    truth), ``precision_e4`` (hits/candidates), ``recall_e4``
    (hits/truth) in basis points; NULL ratio when the denominator is 0.

    Both sides shingle with the same ``k``, so the minhash bands
    approximate Jaccard over exactly the truth's shingle space. Cost is
    one LSH pass plus one inverted-index join — audit-scale work; at
    corpus scale run it on a deterministic sample (sampling.deterministic_sample)
    rather than the full corpus.
    """
    cand = lsh_candidate_pairs(
        df, id_col, text_col, n_hashes, bands, k, max_bucket
    ).select("id_a", "id_b")
    truth = ngram_jaccard_pairs(df, id_col, text_col, k, threshold).select(
        "id_a", "id_b"
    )
    return _precision_recall(cand, truth)


def _precision_recall(cand: DataFrame, truth: DataFrame) -> DataFrame:
    """One-row precision/recall report over two (id_a, id_b) pair sets.

    r16: each side is consumed twice (the hits join and its own count);
    pinning both with lazy localCheckpoints was measured and REVERTED —
    q109 read 3.38→4.09 s median at sf0.1 in interleaved A/B, because
    the one-job form runs the cand and truth chains as PARALLEL branches
    on idle cores and the pins serialize them behind materialization
    barriers. The duplicate work is real but branch-parallel; see
    OPTIMIZATION_r16.md for the measurement."""
    hits = cand.join(truth, ["id_a", "id_b"]).select("id_a")
    bps = lambda num, den: F.when(  # noqa: E731 - inline ratio helper
        F.col(den) > 0, F.round(F.lit(10000.0) * F.col(num) / F.col(den), 0)
    ).cast("long")
    return (
        cand.agg(F.count("*").alias("n_candidates"))
        .crossJoin(truth.agg(F.count("*").alias("n_truth")))
        .crossJoin(hits.agg(F.count("*").alias("n_hits")))
        .select(
            "n_candidates",
            "n_truth",
            "n_hits",
            bps("n_hits", "n_candidates").alias("precision_e4"),
            bps("n_hits", "n_truth").alias("recall_e4"),
        )
    )


def simhash_audit(
    df: DataFrame,
    threshold: float = 0.5,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 16,
    k: int = 3,
    max_rows: int = 50_000,
) -> DataFrame:
    """SimHash-side quality audit completing the dedup-audit family
    (MinHash-LSH: :func:`lsh_audit`; embeddings: similarity.ann_recall):
    precision/recall of pairs within Hamming distance ``max_hamming`` on
    the :func:`simhash_fingerprints` bitstrings, against the exact
    Jaccard-at-``threshold`` ground truth.

    The candidate scan here is the audit-scale all-pairs comparison
    (broadcast-nested-loop on the fingerprint table — fingerprints are
    tiny). At corpus scale generate candidates with bit-prefix blocks
    (pigeonhole: distance ≤ d pairs share at least one of d+1 prefix
    blocks) and audit on a deterministic sample instead. ``max_rows``
    makes an accidental corpus-scale call fail fast instead of running
    the O(n²) join (ADVICE r4) — sample first (operators.sampling
    ``deterministic_sample``) and raise the cap deliberately.
    """
    n = df.count()
    if n > max_rows:
        raise ValueError(
            f"simhash_audit is an all-pairs audit: {n} rows > max_rows="
            f"{max_rows}. Audit a deterministic sample, or raise max_rows "
            "knowingly."
        )
    fp = simhash_fingerprints(df, id_col, text_col, n_bits)
    # pack the bitstring into 32-bit longs so the pair scan's Hamming is
    # bit_count(xor) per block instead of n_bits substring compares —
    # measured the difference between "minutes" and "stuck for half an
    # hour" on the round-7 10x axis (50k rows x 64 chars x 2.5e9 pairs)
    n_blocks = (n_bits + 31) // 32
    packs = [
        F.conv(F.substring("simhash", blk * 32 + 1, 32), 2, 10)
        .cast("long")
        .alias(f"__p{blk}")
        for blk in range(n_blocks)
    ]
    # r16: the fingerprint chain fed BOTH sides of the all-pairs join
    # lazily (two corpus scans + two simhash passes); pin the tiny
    # packed table once (guide §2.4/§5)
    packed = fp.select(F.col(id_col), *packs).localCheckpoint(eager=False)
    a = packed.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"__p{b}").alias(f"__a{b}") for b in range(n_blocks)],
    )
    b = packed.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"__p{b}").alias(f"__b{b}") for b in range(n_blocks)],
    )
    hamming = sum(
        F.bit_count(F.col(f"__a{blk}").bitwiseXOR(F.col(f"__b{blk}")))
        for blk in range(n_blocks)
    )
    cand = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("__ham"))
        .filter(F.col("__ham") <= max_hamming)
        .select("id_a", "id_b")
    )
    truth = ngram_jaccard_pairs(df, id_col, text_col, k, threshold).select(
        "id_a", "id_b"
    )
    return _precision_recall(cand, truth)


def dedup_against_corpus(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental dedup: flag each NEW document whose exact k-shingle
    Jaccard against ANY corpus document reaches ``threshold`` — the
    "dedup the incoming shard against everything already ingested" step
    every growing training corpus runs, where re-deduping the whole
    corpus per shard (O(corpus²)) is unaffordable but shard×corpus via
    an inverted index is one join.

    Plan: distinct shingles of both sides → inverted-index join on the
    shingle (shard side is the small stream; corpus shingle lists are
    what you'd persist between shards) → per-(new, corpus) common counts
    → Jaccard against persisted sizes → any-match flag via semi-join.
    No cross product at any point; at 100 TB feed MinHash-LSH candidate
    pairs in as a pre-filter on the join exactly like
    :func:`ngram_jaccard_pairs` documents.

    Returns ``new_df`` plus ``is_dup`` (boolean).
    """
    sh_new = (
        _exploded_shingles(new_df, id_col, text_col, k)
        .select(F.col(id_col).alias("new_id"), F.col("__sh").alias("sh"))
        .distinct()
    )
    sh_corp = (
        _exploded_shingles(corpus_df, id_col, text_col, k)
        .select(F.col(id_col).alias("corp_id"), F.col("__sh").alias("sh"))
        .distinct()
    )
    n_new = sh_new.groupBy("new_id").agg(F.count("*").alias("na"))
    n_corp = sh_corp.groupBy("corp_id").agg(F.count("*").alias("nb"))
    common = (
        sh_new.join(sh_corp, "sh")
        .groupBy("new_id", "corp_id")
        .agg(F.count("*").alias("common"))
    )
    dup_ids = (
        common.join(n_new, "new_id")
        .join(n_corp, "corp_id")
        .filter(
            F.col("common")
            / (F.col("na") + F.col("nb") - F.col("common"))
            >= threshold
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_df.join(
        dup_ids.withColumn("is_dup", F.lit(True)), id_col, "left"
    ).withColumn("is_dup", F.coalesce(F.col("is_dup"), F.lit(False)))


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_cols: tuple[str, str] = ("id_a", "id_b"),
    max_iter: int = 25,
) -> DataFrame:
    """Duplicate-cluster assignment: (``id_col``, ``component``) where
    ``component`` is the minimum node id reachable through ``pairs``.

    The step after LSH candidate generation in a corpus-dedup pipeline:
    candidate pairs form a graph; each connected component is one
    duplicate cluster; keep the canonical (min-id) member per cluster.

    Iterative min-label propagation with pointer jumping: every round a
    node takes the min among its own label, its neighbors' labels, and
    *its label's label* (the jump — every label value is itself a node,
    so the label forest halves in height per round). Neighbor + jump are
    two shuffle joins and one map-side-combined min agg per round; the
    jump term turns O(diameter) convergence into O(log diameter), and
    checkpointing the edge set keeps the candidate-pair pipeline from
    re-running every round (together: 38.7 s → 7.7 s on the sf0.1 LSH
    graph; the duckdb recursive-CTE oracle takes 52 s on the same input).
    Each round cuts lineage with ``localCheckpoint`` so the plan stays
    flat. Convergence check: labels are monotonically non-increasing, so
    the label sum (decimal — overflow-safe at any id scale) is strictly
    decreasing until the fixpoint; one scalar agg per round, no join.
    """
    a, b = pair_cols
    half = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    edges = (
        half.union(half.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # else every round re-runs the pair pipeline
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)

    def label_sum(df: DataFrame) -> object:
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]

    prev = label_sum(labels)
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.dst == labels.node).select(
            F.col("src").alias("node"), "label"
        )
        jump = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.label") == F.col("y.node"))
            .select(F.col("x.node").alias("node"), F.col("y.label").alias("label"))
        )
        new = (
            labels.unionByName(nbr)
            .unionByName(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur = label_sum(new)
        labels = new
        if cur == prev:
            break
        prev = cur
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))


def prefix_filter_simjoin(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT set-similarity self-join via prefix filtering (the
    PPJoin/AllPairs candidate-generation family — Bayardo et al. WWW'07,
    Xiao et al. WWW'08 — reconstructed from the published algorithm):
    every doc pair with k-shingle Jaccard >= ``threshold``, with NO
    probabilistic misses, without the all-shared-token pair explosion of
    a plain inverted-index join.

    Construction (all DataFrame ops, no driver loops):

    1. distinct k-word shingles per doc; per-shingle document frequency;
    2. canonical GLOBAL rarity order (df asc, shingle asc — a total
       order, so every engine ranks identically);
    3. per doc of size n, index only its PREFIX: the first
       ``n - ceil(t*n) + 1`` shingles in rarity order. Any pair with
       Jaccard >= t has intersection >= ceil(t * max(na, nb)), so
       skipping the last ceil(t*n) - 1 shingles of each doc cannot skip
       every shared shingle — two qualifying docs MUST collide on at
       least one indexed prefix shingle (the standard prefix-filter
       exactness argument);
    4. candidates = equi-join on prefix shingles (rarest shingles ->
       smallest buckets, the opposite end of the df spectrum from the
       stopword-like shingles a naive inverted index floods on), plus
       the length filter min(na, nb) >= t * max(na, nb);
    5. exact verification of candidates only: intersection counts via
       the shingle join, Jaccard = common / (na + nb - common).

    Scale shape: one shuffle on shingle for df counts, one per-doc
    window for prefix positions, candidate join keyed on rare shingles,
    verify join bounded by the candidate set. No crossJoin, no
    all-pairs stage at any size. Returns
    (id_a, id_b, common, na, nb, jaccard).
    """
    sh = (
        _exploded_shingles(df, id_col, text_col, k)
        .select(F.col(id_col), F.col("__sh"))
        .distinct()
    )
    # r15 note: a restructure that derived __n from an unbounded window
    # over the __pos partitioning (dropping the sizes aggregate) and
    # carried na/nb through the candidate set (dropping the final sizes
    # re-joins) was tried and REVERTED: interleaved A/B at sf0.1 read
    # q183 6.98->7.35 s and q208 9.06->9.71 s medians. The sizes table
    # is per-doc (tiny — AQE broadcasts both the mid join and the end
    # joins), while the window form buffers the corpus-sized ranked
    # stream a second time and widens the shuffle_hash-pinned candidate
    # and verify shuffles. The "redundant" aggregate is the cheap side.
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("__n"))
    tok_df = sh.groupBy("__sh").agg(F.count("*").alias("__df"))
    w = Window.partitionBy(id_col).orderBy("__df", "__sh")
    ranked = (
        sh.join(tok_df, "__sh")
        .withColumn("__pos", F.row_number().over(w))
        .join(sizes, id_col)
    )
    # conservative float guard: ceil(t*n) computed one too HIGH (t*n is
    # inexact in binary; e.g. 0.8*5 can land an ulp above 4.0) would
    # shorten the prefix and silently MISS a qualifying pair. Biasing the
    # argument down by an epsilon only ever lengthens the prefix — extra
    # candidates are discarded by the exact verify, missed ones are
    # unrecoverable.
    prefix = ranked.filter(
        F.col("__pos")
        <= F.col("__n")
        - F.ceil(F.lit(threshold) * F.col("__n") - F.lit(1e-9))
        + 1
    )
    a = prefix.select(
        F.col(id_col).alias("id_a"), "__sh", F.col("__n").alias("na")
    )
    b = prefix.select(
        F.col(id_col).alias("id_b"), "__sh", F.col("__n").alias("nb")
    )
    # the candidate and verification joins are pinned SHUFFLE_HASH: on
    # replica-heavy corpora the shingle/pair frames are hugely redundant,
    # so their COMPRESSED shuffle bytes look broadcast-small to AQE while
    # the in-memory hashed relation is 100x larger — observed as a
    # broadcast OOM at the 100x replica axis. An explicit join hint takes
    # precedence over AQE's broadcast conversion; dims this size were
    # never broadcast-worthy anyway (both sides are data-scaled).
    cand = (
        a.join(b.hint("shuffle_hash"), "__sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(  # same epsilon direction: never prune a borderline pair
            F.least("na", "nb")
            >= F.lit(threshold) * F.greatest("na", "nb") - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sha = sh.select(F.col(id_col).alias("id_a"), "__sh")
    shb = sh.select(F.col(id_col).alias("id_b"), "__sh")
    common = (
        cand.join(sha.hint("shuffle_hash"), "id_a")
        .join(shb.hint("shuffle_hash"), ["id_b", "__sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("nb"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    key,
    window: int,
    id_col: str = "doc_id",
) -> tuple[DataFrame, "object"]:
    """Sorted-neighborhood method (SNM) candidate generation — the
    third classic dedup blocker next to LSH (probabilistic buckets) and
    prefix filtering (exact): sort the corpus once by a blocking ``key``
    expression, then pair each record with its ``window`` successors in
    rank order. Near-duplicates whose edits don't disturb the key sort
    adjacently, so candidates = O(n * window) regardless of how hot any
    single key value is — SNM's advantage over hash blocking on skewed
    blocks.

    The global rank comes from :func:`~pandas_streaming_spark.operators.
    indexing.global_index` (range-partition + local row_number + offset
    broadcast — no single-task sort), with ``id_col`` as the tiebreak so
    the order is total. Pairing is ``window`` equi-joins folded into
    one: ranks are exploded with offsets ``1..window`` and hash-joined
    back on rank — no range join, no window-function self-scan.

    Returns ``(pairs, release)``: pairs ``(id_a, id_b)`` with
    ``id_a < id_b``, and the index pin's release hook — callers
    materialize downstream results, then call ``release()``
    (see indexing.GlobalIndex).
    """
    from pandas_streaming_spark.operators.indexing import global_index

    if window < 1:
        # F.sequence(rank+1, rank+window) with window=0 would produce a
        # DESCENDING sequence (Spark defaults the step to -1 when
        # start > stop) and yield spurious pairs instead of none
        raise ValueError(f"sorted_neighborhood_pairs: window must be >= 1, got {window}")
    keyed = df.select(F.col(id_col), key.alias("__snk"))
    gi = global_index(keyed, ["__snk", id_col], "__rank")
    idx = gi.df.select(id_col, "__rank")
    probes = idx.select(
        F.col(id_col).alias("__id_l"),
        F.explode(
            F.sequence(F.col("__rank") + 1, F.col("__rank") + window)
        ).alias("__rank"),
    )
    pairs = probes.join(
        idx.withColumnRenamed(id_col, "__id_r").hint("shuffle_hash"),
        "__rank",
    ).select(
        F.least("__id_l", "__id_r").alias("id_a"),
        F.greatest("__id_l", "__id_r").alias("id_b"),
    )
    return pairs, gi.release


def capped_claimants(
    banded: DataFrame, cap: int, id_col: str = "doc_id"
) -> DataFrame:
    """Per LSH bucket, the ``cap`` smallest ids — the bucket's CLAIMANT
    set (r15, VERDICT r14 item 1: q308's min-id bucket-claim semantics
    generalized from one claimant to ``cap``). A pure function of the
    bucket's final membership SET, which is what makes the capped
    kernel incrementally maintainable: top-cap-by-min is a semilattice
    (``topcap(topcap(base) ∪ delta) == topcap(base ∪ delta)``), so an
    index holding only claimants can absorb any shard split and land on
    the same final state."""
    w = Window.partitionBy("band", "band_hash").orderBy(id_col)
    return (
        banded.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def capped_candidate_pairs(
    df: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """The CAPPED LSH candidate kernel, batch form (the from-scratch
    twin q312's incremental MERGE is graded against): a pair (a, b),
    a < b, is a candidate iff some bucket contains BOTH and ``a`` is
    among that bucket's ``cap`` smallest ids. Per-bucket pair count is
    <= cap * members — LINEAR in bucket depth, closing the degenerate-
    corpus exposure of the uncapped kernel (VERDICT r14 'what's wrong'
    1: a boilerplate-heavy bucket of depth B costs O(B^2) pairs
    uncapped, O(cap*B) here) while staying a deterministic set function
    (unlike ``max_bucket``, which DROPS hot buckets entirely and so
    breaks the incremental-union identity). Recall cost: only pairs
    whose smaller endpoint is dethroned in EVERY shared bucket are
    lost; near-dup clusters keep their min-id spine (every member still
    pairs with the cluster's smallest ids), which is exactly what
    connected-components clustering consumes."""
    banded = banded_table(df, id_col, text_col, n_hashes, bands, k)
    cl = capped_claimants(banded, cap, id_col)
    return (
        cl.alias("c")
        .join(banded.alias("m"), ["band", "band_hash"])
        .filter(F.col(f"c.{id_col}") < F.col(f"m.{id_col}"))
        .select(
            F.col(f"c.{id_col}").alias("id_a"),
            F.col(f"m.{id_col}").alias("id_b"),
        )
        .distinct()
    )


class CappedLshIndex:
    """PERSISTED cap-bounded LSH index with deterministic min-id
    dethroning — the production incremental near-dup state a crawl
    pipeline ships (r15, VERDICT r14 item 1: q309's uncapped index was
    exact but its bucket depth grew with duplication density; this one
    is exact FOR THE CAPPED KERNEL and its probe cost is O(cap) per
    band row no matter how degenerate the corpus).

    Four KeyedUpsertSink tables under one base_dir, committed
    ATOMICALLY per ingest through a SinkTransactionLog (streaming/
    txn.py, r15) — a writer crash anywhere in ingest leaves either the
    whole shard or none of it, never pairs without their justifying
    claimant or claimants without their members backfill source:

    * ``members``  (band, band_hash, doc_id) — full bucket membership,
      insert-only. Read ONLY for buckets with a claimant ENTRANT (the
      backfill join below); never scanned on the probe path.
    * ``claims``   (band, band_hash, doc_id) — the current claimant
      sets, <= cap rows per bucket, maintained by MERGE WITH DELETE:
      a dethroned claimant is TOMBSTONED (min-id dethroning is
      permanent — the claimant threshold only ever tightens — so no
      resurrection case exists).
    * ``cands``    (band, band_hash, id_a, id_b) — per-bucket candidate
      pairs, id_a always the justifying claimant; MERGE WITH DELETE:
      dethroning id_a in a bucket tombstones exactly that bucket's
      (id_a, *) rows, leaving the same pair alive via other buckets.
    * ``scores``   (id_a, id_b) -> exact-Jaccard jac_e4, insert-only
      (scores are immutable facts; the left-anti against it makes each
      pair's verify run ONCE ever).

    Ingest cost per shard: O(shard band rows * cap) probe pairs +
    O(entrant-bucket memberships) backfill + O(dethroned pair rows)
    deletes + delta-sized verify — every term bounded by shard size or
    by cap, never by corpus bucket depth. The final live-candidate set
    provably equals :func:`capped_candidate_pairs` over the union of
    all ingested docs (the semilattice argument in
    :func:`capped_claimants`; pinned as a set identity in
    tests/test_round15.py), so grading against the from-scratch batch
    chain is exact under any shard split."""

    _MEMBER_SCHEMA = "band int, band_hash string, doc_id long, __step long"
    _CLAIM_SCHEMA = (
        "band int, band_hash string, doc_id long, __step long, __del boolean"
    )
    _CAND_SCHEMA = (
        "band int, band_hash string, id_a long, id_b long, "
        "__step long, __del boolean"
    )
    _SCORE_SCHEMA = "id_a long, id_b long, jac_e4 long, __step long"

    def __init__(
        self,
        base_dir: str,
        cap: int,
        n_hashes: int = 8,
        bands: int = 4,
        k: int = 3,
    ) -> None:
        from pandas_streaming_spark.streaming.txn import SinkTransactionLog

        self.cap, self.n_hashes, self.bands, self.k = cap, n_hashes, bands, k
        # r15: the four tables live under ONE transaction log and every
        # ingest commits them ATOMICALLY — sequential per-sink commits
        # left a torn index if the writer died mid-ingest (pairs whose
        # justifying claimant never landed; members missing, so a later
        # entrant's backfill silently missed pairs). Now a crash
        # anywhere in ingest leaves either the full shard or none of it.
        self.log = SinkTransactionLog(base_dir)
        self.members = self.log.table(
            "members", ["band", "band_hash", "doc_id"], ["__step"], 8
        )
        self.claims = self.log.table(
            "claims", ["band", "band_hash", "doc_id"], ["__step"], 8,
            tombstone_col="__del",
        )
        self.cands = self.log.table(
            "cands", ["band", "band_hash", "id_a", "id_b"], ["__step"], 8,
            tombstone_col="__del",
        )
        self.scores = self.log.table(
            "scores", ["id_a", "id_b"], ["__step"], 8
        )

    def _read_or(self, sink, spark, ddl: str) -> DataFrame:
        if sink.versions():
            return sink.read(spark)
        return spark.createDataFrame([], ddl)

    def ingest(
        self,
        batch_df: DataFrame,
        step: int,
        docs_lookup: DataFrame,
        torn: str | None = None,
    ) -> None:
        """Absorb one shard: band row-locally, maintain claimant sets,
        emit/retract candidate pairs, exact-verify only never-scored
        pairs (shingles scoped to their endpoints via ``docs_lookup``,
        the q309 delta-sized verify). All four tables commit in ONE
        transaction (streaming/txn.py), so a writer crash anywhere in
        the ingest leaves either the whole shard or none of it —
        ``torn`` injects exactly those crashes for the graded q313
        lifecycle: ``"staged"`` dies before the tx record (nothing
        visible, re-ingest re-does the shard), ``"committed"`` dies
        right after it (recover() promotes, re-ingest is skipped by the
        group's batch fence)."""
        spark = batch_df.sparkSession
        bucket = ["band", "band_hash"]
        nb = banded_table(
            batch_df, n_hashes=self.n_hashes, bands=self.bands, k=self.k
        ).localCheckpoint(eager=True)
        dirty = nb.select(*bucket).distinct()
        oc = (
            self._read_or(self.claims, spark, self._CLAIM_SCHEMA)
            .select(*bucket, "doc_id")
            .join(dirty, bucket, "left_semi")
            .localCheckpoint(eager=True)
        )
        # distinct: a re-ingested doc appearing in both the stored
        # claimant set and the batch must not occupy two top-cap slots
        new_claim = capped_claimants(
            oc.unionByName(nb).distinct(), self.cap
        ).localCheckpoint(eager=True)
        entrants = new_claim.join(oc, bucket + ["doc_id"], "left_anti")
        dethroned = oc.join(new_claim, bucket + ["doc_id"], "left_anti")
        # probe: every batch member pairs with each CURRENT claimant
        # below it — O(cap) per band row, bucket depth never read
        probe = (
            new_claim.alias("c")
            .join(nb.alias("m"), bucket)
            .filter(F.col("c.doc_id") < F.col("m.doc_id"))
            .select(
                *bucket,
                F.col("c.doc_id").alias("id_a"),
                F.col("m.doc_id").alias("id_b"),
            )
        )
        # backfill: a NEW claimant pairs with the bucket's pre-batch
        # members — the only read of the members table, scoped to
        # entrant buckets (rare after warm-up: P(new id enters top-cap
        # of n) ~ cap/n)
        old_members = (
            self._read_or(self.members, spark, self._MEMBER_SCHEMA)
            .select(*bucket, "doc_id")
            .join(entrants.select(*bucket).distinct(), bucket, "left_semi")
        )
        backfill = (
            entrants.alias("c")
            .join(old_members.alias("m"), bucket)
            .filter(F.col("c.doc_id") < F.col("m.doc_id"))
            .select(
                *bucket,
                F.col("c.doc_id").alias("id_a"),
                F.col("m.doc_id").alias("id_b"),
            )
        )
        new_pairs = probe.unionByName(backfill).distinct().localCheckpoint(
            eager=True
        )
        # retract: dethroning id_a kills exactly its pairs in that bucket
        dead = (
            self._read_or(self.cands, spark, self._CAND_SCHEMA)
            .select(*bucket, "id_a", "id_b")
            .join(
                dethroned.withColumnRenamed("doc_id", "id_a"),
                bucket + ["id_a"],
                "left_semi",
            )
        )
        s, t, f_ = F.lit(step).cast("long"), F.lit(True), F.lit(False)
        tx = self.log.transaction(batch_id=step)
        tx.write(
            "cands",
            new_pairs.withColumn("__step", s).withColumn("__del", f_)
            .unionByName(dead.withColumn("__step", s).withColumn("__del", t)),
        )
        tx.write(
            "claims",
            entrants.withColumn("__step", s).withColumn("__del", f_)
            .unionByName(
                dethroned.withColumn("__step", s).withColumn("__del", t)
            ),
        )
        tx.write("members", nb.withColumn("__step", s))
        # delta verify: exact Jaccard ONCE per pair ever proposed
        pairs_now = new_pairs.select("id_a", "id_b").distinct()
        unscored = pairs_now.join(
            self._read_or(self.scores, spark, self._SCORE_SCHEMA),
            ["id_a", "id_b"],
            "left_anti",
        ).localCheckpoint(eager=True)
        endpoints = (
            unscored.select(F.col("id_a").alias("doc_id"))
            .union(unscored.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        sub = docs_lookup.join(endpoints, "doc_id", "left_semi")
        jac = ngram_jaccard_pairs(
            sub, k=self.k, threshold=0.0, candidates=unscored
        ).select(
            "id_a",
            "id_b",
            F.round(
                F.lit(10000.0)
                * F.col("common")
                / (F.col("na") + F.col("nb") - F.col("common")),
                0,
            ).cast("long").alias("jac_e4"),
        )
        # candidates sharing NO shingle produce no verify row: store an
        # explicit 0 so they are never re-verified. The repartition cuts
        # the verify lineage at a clean shuffle boundary: the sink's
        # localCheckpoint otherwise trips Spark's RDD-zip partition
        # mismatch on this join-of-checkpointed-frames shape (observed
        # at the 10x densified probe: 'Can't zip RDDs with unequal
        # numbers of partitions').
        scored = (
            unscored.join(jac, ["id_a", "id_b"], "left")
            .select(
                "id_a",
                "id_b",
                F.coalesce("jac_e4", F.lit(0)).cast("long").alias("jac_e4"),
                s.alias("__step"),
            )
            .repartition("id_a", "id_b")
        )
        tx.write("scores", scored)
        if torn == "staged":
            # crash sim: the writer died AFTER staging data directories
            # but BEFORE the tx record — nothing is visible, the shard
            # must be re-ingested, vacuum_orphans reclaims the files.
            tx.stage()
            return
        tx.commit(_skip_promotion=(torn == "committed"))

    def pairs(self, spark, threshold_e4: int) -> DataFrame:
        """Current verified near-dup pair snapshot: live candidates
        (across all buckets), joined to their once-computed exact
        scores, thresholded."""
        live = (
            self._read_or(self.cands, spark, self._CAND_SCHEMA)
            .select("id_a", "id_b")
            .distinct()
        )
        sc = self._read_or(self.scores, spark, self._SCORE_SCHEMA)
        return live.join(sc, ["id_a", "id_b"]).filter(
            F.col("jac_e4") >= threshold_e4
        ).select("id_a", "id_b", "jac_e4")

    def maintain(
        self, spark, keep_last: int = 1, min_age_sec: float = 1800.0
    ) -> dict:
        """Steady-state maintenance for the ingest loop (the OPTIMIZE +
        expire_snapshots pass a crawl pipeline schedules between
        shards): compact every index table THROUGH the transaction log
        (version numbers stay serialized — a bare compact would race
        in-flight promotions), then expire old snapshots with age-based
        retention so concurrent readers pinned within the window stay
        whole, and reclaim stage-crash orphans. Each micro-batch merge
        writes its dirty buckets with task parallelism, so un-maintained
        long streams accumulate O(ingests × parallelism) files;
        compaction restores O(num_buckets) per table. Claims/cands keep
        their tombstones (dethroning retractions are permanent facts the
        snapshot semantics need — no retention predicate applies).
        Returns {table: (files_before, files_after)} plus
        ``{"vacuumed": dirs_removed}``."""
        out: dict = {}
        for name in ("members", "claims", "cands", "scores"):
            out[name] = self.log.compact(spark, name)
        out["vacuumed"] = self.log.vacuum(
            keep_last=keep_last, min_age_sec=min_age_sec
        )
        return out

    def close(self) -> None:
        self.log.close()
