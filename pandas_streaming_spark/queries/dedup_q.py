"""Near-duplicate detection pipeline queries split out of `llm`
(round 6, VERDICT r5 item 8): MinHash signatures, LSH candidate
pairs, SimHash, n-gram Jaccard verification, dedup clustering,
chunk-level dedup, incremental shard-vs-corpus dedup, fuzzy pairs,
and the LSH/SimHash recall audits.

Same house rules and oracle discipline as the parent module.
"""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pandas_streaming_spark.operators.dedup import (
    connected_components,
    lsh_audit,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    prefix_filter_simjoin,
    simhash_audit,
    simhash_fingerprints,
)
from pandas_streaming_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q49_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = minhash_signatures(_t(spark, sf_dir, "documents"), n_hashes=8, k=3)
    return (
        sig.select("doc_id", F.concat_ws("|", "signature").alias("sig"))
        .orderBy("doc_id")
        .limit(100)
    )


def q50_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), n_hashes=8, bands=4, k=3, max_bucket=64
    ).orderBy("id_a", "id_b")


def q51_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        simhash_fingerprints(_t(spark, sf_dir, "documents"), n_bits=16)
        .orderBy("doc_id")
        .limit(100)
    )


def q52_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard verification ON LSH CANDIDATES, top-20 by
    similarity — the SURVEY row's "exact overlap on candidates", now
    literally that plan (VERDICT r11 item 2): q50's banded LSH proposes
    pairs, and the exact shingle intersection is computed by joining
    both shingle streams THROUGH the candidate list (q272's scoped
    form, 3.4x at the 10x replica) instead of the all-co-shingle-pairs
    inverted-index self-join (16.2x — duplicate shingle mass grows the
    pair count quadratically; that brute form remains available as
    ``ngram_jaccard_pairs(candidates=None)`` and is what the q109/q238
    audits grade against). The oracle re-derives the identical
    candidate set in SQL, so both engines score the same pairs;
    tests pin candidates ⊇ the brute top-20 at the graded SFs, so the
    visible top-20 is unchanged by the scoping there.

    The candidate generator runs at bands=8, rows=1 (each of the 8
    minhash components is its own band) — the HIGH-RECALL blocking a
    verify stage wants: per-pair miss probability (1-j)^8 (~1e-12 at
    the j≈0.97 pairs the top-20 is made of) vs the q50 retrieval
    config's (1-j²)^4 banding, whose max_bucket cap measurably dropped
    a 0.976-jaccard pair at sf0.001. Candidate mass stays bounded by
    the same max_bucket=64 cap (289/342 pairs at sf0.001/sf0.01 vs
    160/184 for 4x2)."""
    docs = _t(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(docs, n_hashes=8, bands=8, k=3, max_bucket=64)
    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.0, candidates=cands)
    jac_e4 = F.round(
        F.lit(10000.0) * F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        0,
    ).cast("long")
    return (
        pairs.select("id_a", "id_b", jac_e4.alias("jac_e4"))
        .orderBy(F.col("jac_e4").desc(), "id_a", "id_b")
        .limit(20)
    )


def q272_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash CALIBRATION — the measurement behind q238's threshold
    sweep: for every LSH candidate pair, the 8-component signature
    agreement (the similarity the sketch CLAIMS, an unbiased Jaccard
    estimator) against the exact shingle Jaccard, bucketed by agreement
    count. The table answers "when the sketch says 6/8, what is the
    true similarity?" — the estimator-bias readout that sizes n_hashes
    for a production dedup run. est_bp = matches·1250 is EXACT (8
    components divide 1e4 evenly); the true side is the q52 rounded
    ratio of exact integers, averaged per bucket as a rounded ratio of
    exact sums. Scale: candidates come from the banded LSH join
    (max_bucket-capped, q50's plan), signatures ride one map-side-
    combined min-aggregate, and the exact side reuses the inverted-
    index join — every stage shuffle-keyed, no all-pairs. The exact
    side is CANDIDATE-SCOPED: the shingle streams join through the
    candidate list (fan-out = |candidates|·shingles-per-doc), NOT the
    full inverted-index pair join — the all-co-shingle-pairs form
    measured 7.6× at the 10× replica (q52's flood: duplicate shingle
    mass grows pair counts quadratically, q52 alone probes 16.2×); the
    scoped form probes 3.4×, tracking the candidate mass itself (q50
    probes 2.8× on the same replica — true-duplicate pair growth is a
    property of the DATA, bounded by max_bucket, not of this plan)."""
    from pandas_streaming_spark.operators.dedup import _exploded_shingles

    docs = _t(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(
        docs, n_hashes=8, bands=4, k=3, max_bucket=64
    ).localCheckpoint(eager=False)
    sigs = minhash_signatures(docs, n_hashes=8, k=3)
    est = (
        cands.join(
            sigs.select(
                F.col("doc_id").alias("id_a"), F.col("signature").alias("__sa")
            ),
            "id_a",
        )
        .join(
            sigs.select(
                F.col("doc_id").alias("id_b"), F.col("signature").alias("__sb")
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(
                F.filter(
                    F.zip_with("__sa", "__sb", lambda x, y: x == y),
                    lambda b: b,
                )
            )
            .cast("long")
            .alias("matches"),
        )
    )
    shd = _exploded_shingles(docs, "doc_id", "text", 3).distinct()
    sz = shd.groupBy("doc_id").agg(F.count("*").alias("__n"))
    cm = (
        cands.join(
            shd.select(F.col("doc_id").alias("id_a"), "__sh"), "id_a"
        )
        .join(shd.select(F.col("doc_id").alias("id_b"), "__sh"), ["id_b", "__sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__common"))
    )
    jac = (
        cands.join(cm, ["id_a", "id_b"], "left")
        .join(sz.select(F.col("doc_id").alias("id_a"), F.col("__n").alias("__na")), "id_a")
        .join(sz.select(F.col("doc_id").alias("id_b"), F.col("__n").alias("__nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.coalesce(
                F.round(
                    F.lit(1e4)
                    * F.col("__common")
                    / (F.col("__na") + F.col("__nb") - F.col("__common")),
                    0,
                ).cast("long"),
                F.lit(0),
            ).alias("__jac_bp"),
        )
    )
    per = est.join(jac, ["id_a", "id_b"]).select("matches", "__jac_bp")
    return (
        per.groupBy("matches")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum("__jac_bp") / F.count("*"), 0)
            .cast("long")
            .alias("mean_true_bp"),
        )
        .select(
            "matches",
            (F.col("matches") * 1250).cast("long").alias("est_bp"),
            "n_pairs",
            "mean_true_bp",
        )
        .orderBy("matches")
    )


# ---------------------------------------------------------------------------
# Text-analysis extras
# ---------------------------------------------------------------------------


def q183_prefix_filter_simjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join at Jaccard >= 0.6 over 3-word shingles,
    via PPJoin-style prefix filtering (operators/dedup.py
    prefix_filter_simjoin): only each doc's rarest
    ``n - ceil(t*n) + 1`` shingles are indexed, so the candidate join
    runs on the small-bucket end of the shingle df spectrum — unlike
    LSH (q50) there are no probabilistic misses, and unlike the plain
    inverted index (q52) the join never floods on stopword-like
    shingles. The duckdb oracle is the brute-force inverted-index form:
    any candidate the prefix filter missed (or extra pair it invented)
    hash-mismatches the full pair list. jac_e6 is ROUND over the same
    IEEE division both engines compute on identical integers."""
    pairs = prefix_filter_simjoin(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.6
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.col("common").cast("long").alias("n_common"),
            (F.col("na") + F.col("nb") - F.col("common"))
            .cast("long")
            .alias("n_union"),
            F.round(F.lit(1e6) * F.col("jaccard"), 0)
            .cast("long")
            .alias("jac_e6"),
        )
        .orderBy("id_a", "id_b")
    )


def q193_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood dedup (operators/dedup.py
    sorted_neighborhood_pairs): block by sorting on the first 16 chars
    of the text (doc_id tiebreak), pair each doc with its 5 rank-
    successors via the distributed global_index (no single-task sort),
    then verify candidates with EXACT 3-word-shingle Jaccard — the
    threshold is the integer cross-multiplication ``10*common >=
    6*union`` so no float division is graded. The oracle mirrors the
    SAME SNM semantics with a ROW_NUMBER window (small-data plan): what
    is graded is the deterministic blocking+verification pipeline, not
    SNM's recall (a blocker, like LSH, can miss pairs whose edits hit
    the key prefix — recall vs brute force is q109/q52's axis).
    Scale: candidates are O(n*window) by construction — skew-immune
    where hash blocking floods on hot keys; one range exchange for the
    rank, hash joins for pairing and verification."""
    from pandas_streaming_spark.operators.dedup import (
        _exploded_shingles,
        sorted_neighborhood_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    cand, release = sorted_neighborhood_pairs(
        d, key=F.substring("text", 1, 16), window=5
    )
    sh = (
        _exploded_shingles(d, "doc_id", "text", 3)
        .select("doc_id", F.col("__sh").alias("sh"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("__n"))
    common = (
        cand.join(
            sh.select(F.col("doc_id").alias("id_a"), "sh").hint(
                "shuffle_hash"
            ),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), "sh").hint(
                "shuffle_hash"
            ),
            ["id_b", "sh"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("__n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("__n").alias("nb")),
            "id_b",
        )
        .filter(
            10 * F.col("common")
            >= 6 * (F.col("na") + F.col("nb") - F.col("common"))
        )
        .select(
            "id_a",
            "id_b",
            F.col("common").cast("long").alias("n_common"),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
        )
        .orderBy("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    release()
    return out


def q189_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level (span) dedup accounting — the Lee et al. 2022
    'deduplicating training data' shape, at 5-gram granularity: a token
    position is DUPLICATED if at least one 5-gram covering it also
    occurs in some OTHER document. Per doc: token count, covered
    (duplicated) token count, clean remainder — the exact bookkeeping a
    substring-dedup pass needs before cutting spans. Distinct from
    doc-level (q38/q50) and chunk-level (q104) dedup: the unit is the
    token span.

    Plan: positional 5-shingles (narrow explode), cross-doc-duplicated
    shingle set via one countDistinct aggregate, one shingle-keyed join
    back (shuffle-hash pinned — replica corpora make every shingle
    'duplicated', the q183 compressed-broadcast trap), positions
    covered via a 5-wide sequence explode + per-doc distinct. All
    integers; no all-pairs stage anywhere."""
    d = _t(spark, sf_dir, "documents")
    base = d.select("doc_id", F.split("text", " ").alias("__t"))
    sh = base.select(
        "doc_id",
        F.size("__t").alias("n_tokens"),
        F.explode(
            F.expr(
                "transform(IF(size(__t) >= 5, sequence(1, size(__t) - 4),"
                " CAST(array() AS array<int>)),"
                " i -> struct(i AS pos,"
                " concat_ws(' ', slice(__t, i, 5)) AS sh))"
            )
        ).alias("g"),
    ).select("doc_id", "n_tokens", F.col("g.pos").alias("pos"), F.col("g.sh").alias("sh"))
    dup = (
        sh.groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("sh")
    )
    covered = (
        sh.join(dup.hint("shuffle_hash"), "sh")
        .select(
            "doc_id",
            F.explode(F.expr("sequence(pos, pos + 4)")).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_tokens"))
    )
    sizes = base.select("doc_id", F.size("__t").alias("n_tokens"))
    return (
        sizes.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_dup_tokens", F.lit(0)).cast("long").alias("n_dup_tokens"),
            (F.col("n_tokens") - F.coalesce("n_dup_tokens", F.lit(0)))
            .cast("long")
            .alias("n_clean_tokens"),
        )
        .orderBy("doc_id")
    )


def q82_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster sizes: LSH candidate pairs (q50's graph) →
    connected components (iterative hash-to-min) → per-cluster doc count
    for clusters of ≥2 docs."""
    docs = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, n_hashes=8, bands=4, k=3, max_bucket=64)
    cc = connected_components(docs, pairs)
    return (
        cc.groupBy("component")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy("component")
    )


# Denylist terms that actually occur in the synthetic vocabulary — kept in
# the Java-regex ∩ RE2 subset so both engines compute the same match set.
REDACT_PATTERN = r"\b(key|hash|secret|token)\b"


def q104_chunk_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup pipeline v2 composing the round-3 ops:
    scrub (redaction rewrite) → content-defined chunking → corpus-wide
    chunk-hash dedup rate per source. The storage-dedup view of the
    corpus: how much of each source is redundant at CDC-chunk
    granularity. One narrow scrub+chunk pass, a doc_id join for the
    source label, one aggregation."""
    from pandas_streaming_spark.operators.text import cdc_chunks

    docs = _t(spark, sf_dir, "documents")
    scrubbed = docs.select(
        "doc_id",
        F.regexp_replace("text", REDACT_PATTERN, "[MASKED]").alias("text"),
    )
    chunks = cdc_chunks(scrubbed, k=3, divisor=8)
    labeled = chunks.join(docs.select("doc_id", "source"), "doc_id")
    return (
        labeled.groupBy("source")
        .agg(
            F.count("*").alias("n_chunks"),
            F.countDistinct("chunk_md5").alias("n_distinct"),
        )
        .select(
            "source",
            "n_chunks",
            "n_distinct",
            F.round(
                F.lit(10000.0) * (F.col("n_chunks") - F.col("n_distinct"))
                / F.col("n_chunks"),
                0,
            )
            .cast("long")
            .alias("dup_e4"),
        )
        .orderBy("source")
    )


def q238_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup blocker TUNING curve — q109 measures one operating point;
    this sweeps the LSH candidate set's precision/recall against exact
    Jaccard truth at τ ∈ {0.50, 0.70, 0.90} in ONE pass (the curve a
    dedup engineer reads before picking a threshold). Truth membership
    is the integer cross-multiplication ``common·100 ≥ τ%·union`` (no
    float in the predicate); the joined truth∪candidate frame is
    localCheckpointed once and three tiny aggregates read it. Scale:
    one LSH pass + one inverted-index join — the q109 audit cost,
    amortized over every threshold."""
    from pandas_streaming_spark.operators.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs, k=3, threshold=0.0).select(
        "id_a", "id_b", "common", "na", "nb"
    )
    cand = lsh_candidate_pairs(
        docs, n_hashes=8, bands=4, k=3, max_bucket=64
    ).select("id_a", "id_b", F.lit(1).alias("__c"))
    j = (
        truth.join(cand, ["id_a", "id_b"], "full_outer")
        .select(
            F.coalesce("common", F.lit(0)).alias("c"),
            (
                F.coalesce("na", F.lit(0))
                + F.coalesce("nb", F.lit(0))
                - F.coalesce("common", F.lit(0))
            ).alias("un"),
            F.coalesce("__c", F.lit(0)).alias("is_cand"),
        )
        .localCheckpoint(eager=False)
    )
    out = None
    for tau in (50, 70, 90):
        in_truth = (F.col("c") > 0) & (
            F.col("c") * 100 >= F.lit(tau) * F.col("un")
        )
        row = j.agg(
            F.sum(F.when(in_truth, 1).otherwise(0)).cast("long").alias("n_truth"),
            F.sum("is_cand").cast("long").alias("n_cand"),
            F.sum(F.when(in_truth & (F.col("is_cand") == 1), 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
        ).select(
            F.lit(tau).cast("long").alias("tau_pct"),
            "n_truth",
            "n_cand",
            "n_hits",
            F.when(
                F.col("n_cand") > 0,
                F.round(F.lit(1e4) * F.col("n_hits") / F.col("n_cand"), 0)
                .cast("long"),
            ).alias("precision_bp"),
            F.when(
                F.col("n_truth") > 0,
                F.round(F.lit(1e4) * F.col("n_hits") / F.col("n_truth"), 0)
                .cast("long"),
            ).alias("recall_bp"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("tau_pct")


def q109_lsh_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-side quality audit (twin of q108): precision/recall of the
    q50 LSH candidate pairs vs exact 3-shingle Jaccard >= 0.5 ground
    truth. Floors pinned by tests/test_operators.py::test_lsh_audit."""
    return lsh_audit(
        _t(spark, sf_dir, "documents"),
        threshold=0.5, n_hashes=8, bands=4, k=3, max_bucket=64,
    )


def q110_simhash_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-side quality audit (third of the family with q108/q109):
    precision/recall of Hamming<=6 pairs on 64-bit block-seeded
    fingerprints vs exact Jaccard>=0.5 truth. The 64-bit form also
    regression-pins the block-seeding fix (bits 33+ froze constant
    before r4 — every doc identical in the tail).

    Audited on the deterministic ``doc_id % 4 == 1`` sample (round 7):
    the audit is O(n²) by design (that is what max_rows guards), and the
    10x correctness axis put 50 000 rows — 10 identical replicas per
    text — through the pair scan, which is audit-abuse, not audit-scale.
    The static modulo keeps the sample scale-proportional and identical
    in both engines at every axis (replica key offsets are ≡ 0 mod 4,
    so each replica contributes the same id class)."""
    return simhash_audit(
        _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 1),
        threshold=0.5, max_hamming=6, n_bits=64, k=3,
    )


def q113_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental shard-vs-corpus dedup (operators/dedup.py
    ``dedup_against_corpus``): the "new shard" (doc_id % 5 == 0) is
    exact-Jaccard-deduped against the already-ingested corpus (the other
    80%) through one inverted-index join — the O(shard × matches) plan a
    growing corpus runs per ingest instead of re-deduping itself
    (O(corpus²)). Graded on per-source kept/dup counts."""
    from pandas_streaming_spark.operators.dedup import dedup_against_corpus

    docs = _t(spark, sf_dir, "documents")
    shard = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    flagged = dedup_against_corpus(shard, corpus, k=3, threshold=0.5)
    return (
        flagged.groupBy("source")
        .agg(
            F.count("*").alias("n_new"),
            F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup"),
            F.sum(F.when(F.col("is_dup"), 0).otherwise(1))
            .cast("long")
            .alias("n_kept"),
        )
        .orderBy("source")
    )


def q127_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (the short-string counterpart of the
    shingle dedup family): near-identical part names within Levenshtein
    distance 4, blocked on the first token. The load-bearing scale move
    is DISTINCT-FIRST — edit distance runs on the distinct-value table
    (data-independent cardinality: the name vocabulary), never the row
    table; row-level impact is recovered by multiplying the duplicate
    counts. Levenshtein is exact and engine-identical, so the output is
    integer-deterministic with no rounding policy needed."""
    p = _t(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count("*").alias("cnt"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("cnt").alias("cnt_a"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("cnt").alias("cnt_b"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk"),
    )
    return (
        a.join(b, ["blk"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("int")
        )
        .filter(F.col("dist") <= 4)
        .select(
            "name_a",
            "name_b",
            "dist",
            (F.col("cnt_a") * F.col("cnt_b")).cast("long").alias("row_pairs"),
        )
        .orderBy("name_a", "name_b")
    )


def q247_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution scoring — Fellegi–Sunter-shape agreement
    weights over SORTED-NEIGHBORHOOD candidates (the ER pipeline's two
    halves: a linear candidate generator + a field-wise match scorer):
    customers sorted by (acctbal cents, custkey), each paired with its
    5 rank successors via the distributed global_index
    (operators/dedup.sorted_neighborhood_pairs — O(n·window), skew-
    immune, no single-task sort), then every candidate pair scored with
    integer agreement weights: same nation +40, same market segment
    +30, account balance within $5.00 +30; a pair is a MATCH at score ≥
    70. Graded as the score histogram (score, n_pairs, is_match) — the
    calibration table an ER engineer reads to set the threshold. All
    comparisons integer; the oracle mirrors SNM with a ROW_NUMBER
    window (small-data plan, same semantics — the q193 convention)."""
    from pandas_streaming_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    pairs, release = sorted_neighborhood_pairs(
        c, key=F.col("cents"), window=5, id_col="c_custkey"
    )
    a = c.select(
        F.col("c_custkey").alias("id_a"),
        F.col("c_nationkey").alias("__na"),
        F.col("c_mktsegment").alias("__sa"),
        F.col("cents").alias("__ca"),
    )
    b = c.select(
        F.col("c_custkey").alias("id_b"),
        F.col("c_nationkey").alias("__nb"),
        F.col("c_mktsegment").alias("__sb"),
        F.col("cents").alias("__cb"),
    )
    score = (
        F.when(F.col("__na") == F.col("__nb"), 40).otherwise(0)
        + F.when(F.col("__sa") == F.col("__sb"), 30).otherwise(0)
        + F.when(
            F.abs(F.col("__ca") - F.col("__cb")) <= 500, 30
        ).otherwise(0)
    ).cast("long")
    out = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(score.alias("score"))
        .groupBy("score")
        .agg(F.count("*").cast("long").alias("n_pairs"))
        .select(
            "score",
            "n_pairs",
            (F.col("score") >= 70).cast("int").alias("is_match"),
        )
        .orderBy("score")
        .localCheckpoint(eager=True)
    )
    release()
    return out


def q249_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC containment dedup — subset detection (is doc A
    contained in doc B?), the near-dup axis Jaccard misses: a short doc
    fully embedded in a long one has high containment |A∩B|/|A| but low
    Jaccard (union is large). Candidates come from the distinct
    5-gram-shingle inverted index with a 64-doc hot-shingle cap (the
    q97 ``max_bucket`` posture — a shingle shared by >64 docs is
    boilerplate, not evidence; recall vs brute force is the q109-style
    audit axis, not this grade). Graded: ordered pairs (a ≠ b, both
    directions) sharing ≥ 3 shingles with containment ≥ 50%:
    (id_a, id_b, inter, n_a, containment_bp) — containment as a rounded
    ratio of exact integers. Scale: shuffles key on shingle then pair —
    both uniform after the cap; everything downstream is pair-sized."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= 5,
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 4),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i),
                        F.element_at("t", i + 1),
                        F.element_at("t", i + 2),
                        F.element_at("t", i + 3),
                        F.element_at("t", i + 4),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("sh"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    ok = sh.groupBy("sh").agg(F.count("*").alias("__docs")).filter(
        F.col("__docs") <= 64
    )
    shc = sh.join(ok.select("sh"), "sh")
    aa = shc.select(F.col("doc_id").alias("id_a"), "sh")
    bb = shc.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        aa.join(bb, "sh")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("inter"))
        .filter(F.col("inter") >= 3)
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a")),
            "id_a",
        )
        .withColumn(
            "containment_bp",
            F.round(F.lit(1e4) * F.col("inter") / F.col("n_a"), 0).cast("long"),
        )
        .filter(F.col("containment_bp") >= 5000)
        .select("id_a", "id_b", "inter", "n_a", "containment_bp")
        .orderBy("id_a", "id_b")
    )


def _neardup_pairs(docs: DataFrame, threshold_e4: int = 8000) -> DataFrame:
    """Shared near-dup pair frame (q284 grades the cross-source matrix;
    q286 the per-source retention): q50's production LSH candidates
    (4×2 banding, max_bucket=64) verified by the candidate-scoped exact
    Jaccard (q52's plan), kept at rounded jac_e4 ≥ threshold. At a 0.8
    threshold the 4×2 banding's per-pair miss is (1−j²)⁴ ≤ 1.7% — the
    retrieval operating point; the oracle re-derives the identical
    candidate set so the grade is parity-exact regardless."""
    cands = lsh_candidate_pairs(docs, **_PAIRS_KERNEL)
    pairs = ngram_jaccard_pairs(
        docs, k=_PAIRS_KERNEL["k"], threshold=0.0, candidates=cands
    )
    jac_e4 = F.round(
        F.lit(10000.0)
        * F.col("common")
        / (F.col("na") + F.col("nb") - F.col("common")),
        0,
    ).cast("long")
    return pairs.select("id_a", "id_b", jac_e4.alias("jac_e4")).filter(
        F.col("jac_e4") >= threshold_e4
    )


_PAIRS_SCHEMA = "id_a long, id_b long, jac_e4 long"

# The exact kernel parameters _neardup_pairs runs with — single source
# of truth shared by the candidate generator AND the artifact tag.
_PAIRS_KERNEL = {"n_hashes": 8, "bands": 4, "k": 3, "max_bucket": 64}

# Algorithm-version token baked into every verified-pairs artifact tag
# (ADVICE r13): derived from the kernel parameter tuple, so ANY change
# to the candidate generator's knobs maps to a fresh artifact directory
# instead of silently serving stale pairs to the six report-family
# consumers. Bump the leading "a2" literal for changes the parameter
# tuple can't see (e.g. a different hash family or verify predicate).
_PAIRS_ALGO_V = "a2-" + "".join(
    f"{k[0]}{v}" for k, v in sorted(_PAIRS_KERNEL.items())
)


def _corpus_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the documents table: absolute path + file
    sizes + mtimes (dir-of-parquet replicas included), so a regenerated
    or rescaled corpus maps to a DIFFERENT artifact directory and
    staleness is structurally impossible."""
    import hashlib
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    if os.path.isdir(p):
        # ADVICE r13: size alone let a regenerated same-size replica
        # serve a stale pair table — include mtime_ns per part file for
        # parity with the single-file branch below.
        def _part(n: str) -> str:
            st = os.stat(os.path.join(p, n))
            return f"{n}:{st.st_size}:{st.st_mtime_ns}"

        sig = ";".join(
            _part(n) for n in sorted(os.listdir(p)) if n.endswith(".parquet")
        )
    else:
        st = os.stat(p)
        sig = f"{st.st_size}:{st.st_mtime_ns}"
    return hashlib.md5(f"{os.path.abspath(p)}|{sig}".encode()).hexdigest()[:16]


def verified_pairs(
    spark: SparkSession, sf_dir: str, threshold_e4: int = 8000
) -> DataFrame:
    """The MATERIALIZED verified near-dup pair table — computed once per
    corpus, served from storage by every report-family consumer
    (q284 source matrix, q286 retention, q287 size histogram, q295
    datacard, q298 epoch allocation, q299 cohesion).

    VERDICT r12 item 2: each of those six entries used to re-derive the
    MinHash → banded-LSH → exact-Jaccard chain from scratch — correct
    but wasteful by construction; at 100 TB the verified pair frame is
    exactly the artifact a curation run materializes once and every
    downstream panel joins against. First call per artifact tag —
    corpus fingerprint (path + per-file sizes + mtimes, both
    single-file and dir-of-parquet shapes) + threshold + the
    ``_PAIRS_ALGO_V`` kernel-version token (ADVICE r13: a changed
    minhash/banding/verify kernel must never serve pairs computed by
    the old one) — computes ``_neardup_pairs`` and
    commits it through :class:`KeyedUpsertSink` — the repo's
    manifest/MERGE machinery (streaming/upsert.py): bucketed immutable
    parquet + atomic manifest/HEAD commit, so a concurrent first call
    is safe (second commit of batch 0 is skipped idempotently) and a
    crash mid-write leaves no readable partial state. Later calls read
    the committed snapshot — the pair chain appears ONCE in the
    combined lineage of the whole report family. The sink's keyed MERGE
    is also the production incremental path: a new crawl shard batches
    its (id_a, id_b, jac_e4) rows into the same table (q113's
    shard-vs-corpus posture) instead of recomputing the corpus.
    Oracles are unchanged — they re-derive the full chain in SQL, so
    the stored artifact is re-graded against first principles on every
    sweep."""
    import os
    import shutil

    from pandas_streaming_spark.streaming.replay import SCRATCH
    from pandas_streaming_spark.streaming.upsert import KeyedUpsertSink

    root = os.path.join(SCRATCH, "verified_pairs")
    os.makedirs(root, exist_ok=True)
    tag = f"{_corpus_fingerprint(sf_dir)}-t{threshold_e4}-{_PAIRS_ALGO_V}"
    base = os.path.join(root, tag)
    sink = KeyedUpsertSink(
        base, key_cols=["id_a", "id_b"], seq_cols=["jac_e4"], num_buckets=8
    )
    if not sink.versions():
        docs = load_table(spark, sf_dir, "documents")
        sink(_neardup_pairs(docs, threshold_e4), batch_id=0)
        # GC: artifacts of regenerated/rescaled corpora never get read
        # again (their fingerprint is dead) — keep the 8 newest, but
        # NEVER reap a dir touched within the last 30 minutes (ADVICE
        # r13): a concurrent session mid-build, or holding a lazy
        # DataFrame over a just-read artifact, must not lose its
        # parquet files out from under it.
        import time

        now = time.time()
        dirs = sorted(
            (d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))),
            key=lambda d: os.path.getmtime(os.path.join(root, d)),
        )
        for stale in dirs[:-8]:
            full = os.path.join(root, stale)
            if now - os.path.getmtime(full) < 1800:
                continue
            shutil.rmtree(full, ignore_errors=True)
    # ADVICE r14: reading an artifact never bumps the dir mtime by
    # itself, so the 30-minute GC guard above only protected WRITERS —
    # a session holding a lazy DataFrame over a valid-but-hours-old tag
    # outside the newest-8 could still lose its parquet mid-plan.
    # Touch the dir on EVERY read/tag-hit so "recently read" and
    # "recently written" are the same thing to the guard.
    try:
        os.utime(base)
    except OSError:
        pass
    try:
        return sink.read(spark).select("id_a", "id_b", "jac_e4")
    except ValueError:
        # a corpus with zero qualifying pairs commits an empty manifest
        return spark.createDataFrame([], _PAIRS_SCHEMA)


def q284_source_neardup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source NEAR-DUP CONTAMINATION MATRIX — which sources copy
    from each other (the provenance/licensing audit a corpus governance
    pass runs; q231's token-set overlap is the distributional view,
    this counts actual near-duplicate DOCUMENT pairs): near-dup pairs
    at jac ≥ 0.8 (LSH-proposed, exactly verified — _neardup_pairs),
    each attributed to its unordered source pair, with the pair count
    and mean similarity (rounded ratio of exact integer sums). The
    diagonal (source_a == source_b) is within-source duplication; the
    off-diagonal is cross-source copying. Scale: everything rides the
    bucketed LSH + candidate-scoped verify; the source attribution is
    two id-keyed joins against a (doc_id, source) projection."""
    docs = _t(spark, sf_dir, "documents")
    nd = verified_pairs(spark, sf_dir, 8000)
    s = docs.select("doc_id", "source")
    m = (
        nd.join(
            s.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")),
            "id_a",
        )
        .join(
            s.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")),
            "id_b",
        )
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
            "jac_e4",
        )
    )
    return (
        m.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.sum("jac_e4") / F.count("*"), 0)
            .cast("long")
            .alias("mean_jac_e4"),
        )
        .orderBy("source_a", "source_b")
    )


def q286_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup RETENTION — the survivorship-bias readout a
    curation report ships next to its dedup stage (a source that loses
    30% to near-dup removal was probably scraped twice; one that loses
    nothing may be under-crawled): apply the pairwise keep-smallest
    rule (a doc is removed iff it is the LARGER id of any qualifying
    near-dup pair — the greedy form; q82's connected-components
    canonicalization is the exhaustive variant) and report per source:
    docs, removed, retained, retention in ppm. Scale: the removal set
    is one distinct projection of the pair frame; retention is one
    map-side-combined aggregate after a left join."""
    docs = _t(spark, sf_dir, "documents")
    nd = verified_pairs(spark, sf_dir, 8000)
    removed = nd.select(F.col("id_b").alias("doc_id")).distinct().withColumn(
        "__rm", F.lit(1)
    )
    return (
        docs.select("doc_id", "source")
        .join(removed, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.coalesce("__rm", F.lit(0))).cast("long").alias("n_removed"),
        )
        .select(
            "source",
            "n_docs",
            "n_removed",
            (F.col("n_docs") - F.col("n_removed")).cast("long").alias("n_retained"),
            F.round(
                F.lit(1e6) * (F.col("n_docs") - F.col("n_removed")) / F.col("n_docs"),
                0,
            )
            .cast("long")
            .alias("retention_ppm"),
        )
        .orderBy("source")
    )


def q287_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE DISTRIBUTION — "how duplicated is this
    corpus" as one histogram (the third panel of the dedup report next
    to q284's source matrix and q286's retention): connected components
    over the VERIFIED near-dup pairs (jac ≥ 0.8 — q82 clusters the raw
    LSH candidates; this clusters what the exact verify confirmed),
    bucketed by cluster size with doc shares in ppm, plus a __TOTAL__
    row carrying the corpus DUPLICATION FACTOR in e3 (docs per
    canonical document = N / #components — the multiplier dedup will
    reclaim). Scale: pointer-jumping CC is O(log diameter) rounds of
    shuffle joins; the histogram frame is bounded by the largest
    cluster size, not the corpus."""
    from pandas_streaming_spark.operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents")
    nd = verified_pairs(spark, sf_dir, 8000).select("id_a", "id_b")
    cc = connected_components(docs, nd)
    sizes = cc.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters")
    )
    tot = sizes.agg(
        F.sum("cluster_size").cast("long").alias("__N"),
        F.count("*").cast("long").alias("__comp"),
    )
    per = hist.crossJoin(F.broadcast(tot)).select(
        F.concat(
            F.lit("size_"),
            F.lpad(F.col("cluster_size").cast("string"), 3, "0"),
        ).alias("bucket"),
        "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).cast("long").alias("n_docs"),
        F.round(
            F.lit(1e6) * F.col("cluster_size") * F.col("n_clusters") / F.col("__N"),
            0,
        )
        .cast("long")
        .alias("share_ppm"),
        F.lit(None).cast("long").alias("dup_factor_e3"),
    )
    total = tot.select(
        F.lit("__TOTAL__").alias("bucket"),
        F.col("__comp").alias("n_clusters"),
        F.col("__N").alias("n_docs"),
        F.lit(1000000).cast("long").alias("share_ppm"),
        F.round(F.lit(1e3) * F.col("__N") / F.col("__comp"), 0)
        .cast("long")
        .alias("dup_factor_e3"),
    )
    return per.unionByName(total).orderBy("bucket")


def q299_cluster_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster COHESION audit — the fourth dedup-report panel
    (q284 source matrix, q286 retention, q287 size histogram): for each
    connected component of the verified (≥ 0.8) pair graph, edge
    density 2e/(m(m−1)) in ppm — a cohesion near 1e6 means the cluster
    is a clique (true re-uploads of one document); a low cohesion on a
    big cluster means a CHAIN of borderline pairs glued by transitivity
    (the threshold artifact where A≈B≈C but A≉C — exactly the clusters
    a keep-one-per-component rule over-deletes from). Graded per
    cluster size (≥ 2): cluster count, total verified edges, and the
    mean per-cluster cohesion (integer ppm, rounded per cluster then
    averaged — deterministic both engines). Scale: pointer-jumping CC +
    one edge→component join + two map-side-combined aggregates; the
    output frame is bounded by the largest cluster size."""
    from pandas_streaming_spark.operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents")
    nd = verified_pairs(spark, sf_dir, 8000).select("id_a", "id_b")
    cc = connected_components(docs, nd)
    sizes = cc.groupBy("component").agg(F.count("*").cast("long").alias("m"))
    edges = (
        nd.join(
            cc.select(F.col("doc_id").alias("id_a"), "component"), "id_a"
        )
        .groupBy("component")
        .agg(F.count("*").cast("long").alias("e"))
    )
    per = (
        sizes.filter(F.col("m") >= 2)
        .join(edges, "component")
        .select(
            "m",
            "e",
            F.round(
                F.lit(1e6) * 2 * F.col("e") / (F.col("m") * (F.col("m") - 1)),
                0,
            )
            .cast("long")
            .alias("__coh"),
        )
    )
    return (
        per.groupBy(F.col("m").alias("cluster_size"))
        .agg(
            F.count("*").cast("long").alias("n_clusters"),
            F.sum("e").cast("long").alias("n_edges"),
            F.round(F.sum("__coh") / F.count("*"), 0)
            .cast("long")
            .alias("mean_cohesion_ppm"),
        )
        .orderBy("cluster_size")
    )


QUERIES = {
    "q299_cluster_cohesion": q299_cluster_cohesion,
    "q284_source_neardup_matrix": q284_source_neardup_matrix,
    "q286_dedup_retention": q286_dedup_retention,
    "q287_dup_cluster_histogram": q287_dup_cluster_histogram,
    "q272_minhash_calibration": q272_minhash_calibration,
    "q247_entity_resolution": q247_entity_resolution,
    "q249_containment_dedup": q249_containment_dedup,
    "q49_minhash_signatures": q49_minhash_signatures,
    "q50_lsh_candidate_pairs": q50_lsh_candidate_pairs,
    "q51_simhash": q51_simhash,
    "q52_ngram_jaccard": q52_ngram_jaccard,
    "q183_prefix_filter_simjoin": q183_prefix_filter_simjoin,
    "q193_sorted_neighborhood": q193_sorted_neighborhood,
    "q189_duplicated_spans": q189_duplicated_spans,
    "q82_dedup_clusters": q82_dedup_clusters,
    "q104_chunk_dedup_pipeline": q104_chunk_dedup_pipeline,
    "q109_lsh_audit": q109_lsh_audit,
    "q238_dedup_threshold_sweep": q238_dedup_threshold_sweep,
    "q110_simhash_audit": q110_simhash_audit,
    "q113_incremental_dedup": q113_incremental_dedup,
    "q127_fuzzy_pairs": q127_fuzzy_pairs,
}

ORACLES = {
    # SNM by (cents, custkey) rank, neighbor pairs within 5 ranks,
    # identical integer agreement weights and >= 70 match rule
    "q247_entity_resolution": """
WITH c AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS cents
  FROM customer
),
rn AS (
  SELECT c_custkey,
         ROW_NUMBER() OVER (ORDER BY cents, c_custkey) AS rn
  FROM c
),
cand AS (
  SELECT LEAST(a.c_custkey, b.c_custkey) AS id_a,
         GREATEST(a.c_custkey, b.c_custkey) AS id_b
  FROM rn a JOIN rn b ON b.rn - a.rn BETWEEN 1 AND 5
),
scored AS (
  SELECT CAST(
           (CASE WHEN ca.c_nationkey = cb.c_nationkey THEN 40 ELSE 0 END)
         + (CASE WHEN ca.c_mktsegment = cb.c_mktsegment THEN 30 ELSE 0 END)
         + (CASE WHEN ABS(ca.cents - cb.cents) <= 500 THEN 30 ELSE 0 END)
         AS BIGINT) AS score
  FROM cand JOIN c ca ON ca.c_custkey = cand.id_a
            JOIN c cb ON cb.c_custkey = cand.id_b
)
SELECT score, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(score >= 70 AS INT) AS is_match
FROM scored GROUP BY score ORDER BY score
""",
    # same distinct 5-gram shingles, 64-doc hot cap, >=3 shared,
    # containment vs the LEFT side's size, >= 50%
    "q249_containment_dedup": """
WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 4, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                     || t[i+3] || ' ' || t[i+4])) AS sh
  FROM t
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
ok AS (SELECT sh FROM (SELECT sh, COUNT(*) AS d FROM sh GROUP BY sh)
       WHERE d <= 64),
shc AS (SELECT s.doc_id, s.sh FROM sh s JOIN ok USING (sh)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT id_a, id_b, inter, sizes.n AS n_a,
       CAST(ROUND(1e4 * inter / sizes.n, 0) AS BIGINT) AS containment_bp
FROM inter JOIN sizes ON sizes.doc_id = inter.id_a
WHERE ROUND(1e4 * inter / sizes.n, 0) >= 5000
ORDER BY id_a, id_b
""",
    # SNM mirrored with the window form (small-data plan, same
    # semantics): rank by (16-char key, doc_id), neighbor pairs within
    # 5 ranks, exact 3-shingle Jaccard by integer cross-multiplication
    "q193_sorted_neighborhood": """
WITH rn AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY SUBSTR(text, 1, 16), doc_id) AS rn
  FROM documents
), cand AS (
  SELECT LEAST(a.doc_id, b.doc_id) AS id_a,
         GREATEST(a.doc_id, b.doc_id) AS id_b
  FROM rn a JOIN rn b ON b.rn - a.rn BETWEEN 1 AND 5
), toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks
), sz AS (
  SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS common
  FROM cand c
  JOIN sh x ON x.doc_id = c.id_a
  JOIN sh y ON y.doc_id = c.id_b AND y.sh = x.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b,
       CAST(i.common AS BIGINT) AS n_common,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b
FROM inter i
JOIN sz sa ON sa.doc_id = i.id_a
JOIN sz sb ON sb.doc_id = i.id_b
WHERE 10 * i.common >= 6 * (sa.n + sb.n - i.common)
ORDER BY id_a, id_b
""",
    # positional 5-shingle grammar local to this oracle: llm._SHINGLES5
    # deliberately drops positions, which span coverage needs
    "q189_duplicated_spans": """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents
), sh AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 4, 0)),
                i -> STRUCT_PACK(pos := i,
                     sh := t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                           || t[i+3] || ' ' || t[i+4]))) AS g
  FROM toks
), flat AS (
  SELECT doc_id, g.pos AS pos, g.sh AS sh FROM sh
), dup AS (
  SELECT sh FROM flat GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2
), covered AS (
  SELECT doc_id, COUNT(*) AS n_dup FROM (
    SELECT DISTINCT doc_id, p
    FROM flat JOIN dup USING (sh),
         UNNEST(GENERATE_SERIES(pos, pos + 4)) AS u(p)
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(LEN(t.t) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup_tokens,
       CAST(LEN(t.t) - COALESCE(c.n_dup, 0) AS BIGINT) AS n_clean_tokens
FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id
ORDER BY t.doc_id
""",
    "q127_fuzzy_pairs": """
WITH names AS (
  SELECT p_name, COUNT(*) AS cnt, SPLIT_PART(p_name, ' ', 1) AS blk
  FROM part GROUP BY p_name
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(LEVENSHTEIN(a.p_name, b.p_name) AS INT) AS dist,
       CAST(a.cnt * b.cnt AS BIGINT) AS row_pairs
FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
WHERE LEVENSHTEIN(a.p_name, b.p_name) <= 4
ORDER BY name_a, name_b
""",
}
