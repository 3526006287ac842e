"""Q74–Q76: reproducible dataset-curation operators (sampling, splitting,
per-source capping) over the documents/embeddings tables.

These grade operators/sampling.py: content-addressed md5 bucketing means
the duckdb oracle computes the *identical* sample membership — something
seeded-RNG sampling can never offer across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.functions import hb_sql
from pandas_streaming_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
    hash_split,
    stratified_sample,
)

_BUCKET_SQL = (
    "CAST(CONCAT('0x', SUBSTR(MD5(CAST({id} AS VARCHAR)), 1, 7)) AS BIGINT) % 100"
)


def q74_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        deterministic_sample(docs, "doc_id", pct=20)
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


def q75_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        hash_split(emb, "vec_id", {"train": 80, "val": 10, "test": 10})
        .groupBy("split")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("label").alias("n_labels"),
            F.sum("label").cast("long").alias("sum_label"),
        )
        .orderBy("split")
    )


def q76_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        cap_per_group(docs, "source", "doc_id", n=50)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("source")
    )


def q83_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing rates per language: keep 100% of 'en', 50% of 'de',
    25% of 'es', 10% of everything else (operators.sampling
    .stratified_sample — content-addressed, so the oracle computes the
    identical membership)."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = stratified_sample(
        docs, "doc_id", "lang", {"en": 100, "de": 50, "es": 25}, default_pct=10
    )
    return (
        mixed.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
        .orderBy("lang")
    )


def q85_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop packing map (operators.text.pack_sequences):
    512-token training sequences packed per source shard."""
    from pandas_streaming_spark.operators.text import pack_sequences

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(F.split("text", " "))
    )
    return pack_sequences(
        docs, "doc_id", "n_tok", budget=512, partition_by="source"
    ).orderBy("source", "doc_id")


def q80_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build, the engine's flagship composition:
    exact-dedup (keep lowest doc_id per content hash) → length gate →
    50% reproducible sample → per-lang corpus stats. Each stage is the
    production operator; one narrow chain + two shuffles total (dedup
    window, final agg)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    gated = deduped.filter((F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000))
    sampled = deterministic_sample(gated, "doc_id", pct=50)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        )
        .orderBy("lang")
    )


def q186_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe GROUP-level train/val/test split: the split key is
    the md5 bucket of the ``source`` (domain) rather than the row id, so
    every document of one source lands in one split — the standard
    defense against near-duplicate leakage across splits (same-domain
    pages are correlated; a row-level split like q75 puts siblings in
    train AND test). Reuses operators/sampling.hash_split verbatim with
    the group column as the id — co-assignment falls out of hash
    determinism, no extra machinery. The result carries an in-query
    leakage AUDIT row (sources spanning >1 split — structurally zero,
    and the oracle re-derives it): a split tool that cannot prove its
    own leakage-freedom is not a leakage-safe split tool. Scale: one
    narrow md5 projection + one aggregate; no shuffle on the fact rows
    beyond the groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    s = hash_split(docs, "source", {"train": 80, "val": 10, "test": 10})
    per_split = s.groupBy("split").agg(
        F.countDistinct("source").alias("n_sources"),
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    leak = (
        s.groupBy("source")
        .agg(F.countDistinct("split").alias("__k"))
        .agg(
            F.sum(F.when(F.col("__k") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_sources")
        )
        .select(
            F.lit("zz_leaked_sources").alias("split"),
            "n_sources",
            F.lit(0).cast("long").alias("n_docs"),
            F.lit(0).cast("long").alias("sum_chars"),
        )
    )
    return per_split.unionByName(leak).orderBy("split")


# round-9 rebalance: the 5-stage pipeline moved to pipeline.py;
# re-exported for compatibility
from pandas_streaming_spark.queries.pipeline import (  # noqa: F401,E402
    _pipeline_stages,
    q208_curation_pipeline,
    run_curation_pipeline,
)


def q196_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative-pair generation for contrastive training
    (anchor, k=3 negatives per doc): negatives are drawn by CONTENT-FREE
    hash indexing — negative j for (anchor rank i, draw k) is
    ``md5(i:k) mod (N-1)``, shifted past i so a doc never pairs with
    itself — over the distributed global rank
    (operators/indexing.global_index; doc_id order, no single-task
    sort). Seeded-RNG sampling could never grade cross-engine; md5
    arithmetic makes the duckdb oracle compute IDENTICAL pair
    membership (same contract as q74's content-addressed sampling).
    The corpus size N rides a 1-row broadcast; pairing is one hash join
    back on rank. Graded as the full (anchor_doc_id, draw, neg_doc_id)
    list. Scale: output is k·N rows by construction; the join key is
    the dense rank, so the exchange is uniform — no hot key no matter
    how skewed doc_ids are."""
    from pandas_streaming_spark.operators.indexing import global_index

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    gi = global_index(d, ["doc_id"], "rank")
    idx = gi.df
    n = idx.agg(F.count("*").cast("long").alias("__n"))
    draws = (
        idx.join(F.broadcast(n))
        .select(
            F.col("doc_id").alias("anchor_doc_id"),
            F.col("rank"),
            F.col("__n"),
            F.explode(F.sequence(F.lit(0), F.lit(2))).alias("draw"),
        )
        .withColumn(
            "__h",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("rank").cast("string"),
                            F.col("draw").cast("string"),
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long"),
        )
        .withColumn("__j0", F.pmod(F.col("__h"), F.col("__n") - 1))
        .withColumn(
            "rank_neg",
            F.when(F.col("__j0") >= F.col("rank"), F.col("__j0") + 1).otherwise(
                F.col("__j0")
            ),
        )
    )
    out = (
        draws.join(
            idx.select(
                F.col("rank").alias("rank_neg"),
                F.col("doc_id").alias("neg_doc_id"),
            ).hint("shuffle_hash"),
            "rank_neg",
        )
        .select("anchor_doc_id", "draw", "neg_doc_id")
        .orderBy("anchor_doc_id", "draw")
        .localCheckpoint(eager=True)
    )
    gi.release()
    return out


def q203_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining — adjacent-bigram lift (the PMI ranking
    statistic) with support >= 5. PMI = ln(c_xy*N / (c_x*c_y)) needs a
    transcendental, so the GRADE carries the exact integer FRACTION
    instead: ``lift_num = c_xy * N`` and ``lift_den = c_x * c_y`` (ln is
    monotone, so consumers rank by cross-multiplying fractions — no
    float ever enters the contract; same exactness move as q194's
    TV-distance numerator). Plan: one token explode for unigram counts,
    one adjacent-pair explode (zip of the two slice views — no
    positional self-join) for bigram counts, the corpus size on a 1-row
    broadcast, two vocabulary-sized hash joins to attach c_x/c_y. At
    graded scales c_xy*N tops out ~1e13 (500x inside int64); at 100 TB
    the products move to decimal(38,0) like q194."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    uni = (
        d.select(F.explode(t).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    n = uni.agg(F.sum("c").cast("long").alias("__n"))
    bg = (
        d.select(
            F.explode(
                F.arrays_zip(
                    F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias(
                        "w1"
                    ),
                    F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias(
                        "w2"
                    ),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    return (
        bg.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), "w2")
        .join(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_xy",
            "c_x",
            "c_y",
            (F.col("c_xy") * F.col("__n")).cast("long").alias("lift_num"),
            (F.col("c_x") * F.col("c_y")).cast("long").alias("lift_den"),
        )
        .orderBy("w1", "w2")
    )


def q206_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch detector — the first gate every
    experimentation platform runs before reading a metric: users are
    hash-split 50/50 into arms (the q75 md5-bucket assignment, so
    membership is content-addressed and both engines compute it
    identically), and per event_type the arm counts are screened with
    the two-arm chi-square ``(n_a - n_b)^2 / (n_a + n_b)`` — graded as
    its exact integer NUMERATOR against ``16 * (n_a + n_b)``
    (chi-square > 16 ~ p < 6e-5, the standard SRM alarm), so no
    division or float threshold enters the contract (q194/q203's
    integer-fraction move). Scale: one map-side-combined aggregate over
    5 groups; the hash assignment is a per-row expression."""
    from pandas_streaming_spark.operators.sampling import hash_bucket

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", hash_bucket("user_id", 2).alias("arm")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
        .select(
            "event_type",
            "n_a",
            "n_b",
            ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b")))
            .cast("long")
            .alias("srm_num"),
            (
                (F.col("n_a") - F.col("n_b"))
                * (F.col("n_a") - F.col("n_b"))
                > 16 * (F.col("n_a") + F.col("n_b"))
            ).alias("srm_alarm"),
        )
        .orderBy("event_type")
    )


def q258_packing_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-budget TUNING curve (the q238 move applied to q209/q239:
    one operating point generalized to the curve an engineer reads
    before fixing the sequence length): whole-doc next-fit packing at
    budgets 128/256/512/1024 tokens, graded per budget as total bins,
    packed tokens, capacity, and padding waste in bp — the
    waste-vs-context-length trade every training-infra team tunes.
    Oversized solo docs can push tokens past capacity (waste can go
    negative at small budgets) — deterministic on both engines, part of
    the readout. Scale: one doc-length aggregate feeds four pack_bins
    passes (each O(n) partition-stream scans); everything after is
    4 rows."""
    from pandas_streaming_spark.operators.text import pack_bins

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    ).localCheckpoint(eager=False)
    outs = []
    for budget in (128, 256, 512, 1024):
        packed = pack_bins(
            docs, "doc_id", "n_tok", budget=budget, partition_by="source"
        )
        per_src = packed.groupBy("source").agg(
            F.sum("n_tok").cast("long").alias("toks"),
            (F.max("bin") + 1).cast("long").alias("bins"),
        )
        outs.append(
            per_src.agg(
                F.lit(budget).cast("long").alias("budget"),
                F.sum("bins").cast("long").alias("n_bins"),
                F.sum("toks").cast("long").alias("n_tokens"),
                (F.sum("bins") * budget).cast("long").alias("capacity"),
                F.round(
                    F.lit(1e4)
                    * (F.sum("bins") * budget - F.sum("toks"))
                    / (F.sum("bins") * budget),
                    0,
                )
                .cast("long")
                .alias("waste_bp"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("budget")


def q209_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document next-fit bin packing (operators/text.pack_bins):
    512-token bins per source shard, docs never split — the SFT-side
    twin of q85's concat-and-chop. Graded per source: docs, tokens,
    bins used, and utilization in basis points (tokens may exceed
    bins*budget only via oversized solo docs). The oracle walks the
    definitional recurrence as a recursive CTE."""
    from pandas_streaming_spark.operators.text import pack_bins

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    packed = pack_bins(docs, "doc_id", "n_tok", budget=512, partition_by="source")
    return (
        packed.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            (F.max("bin") + 1).cast("long").alias("n_bins"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_bins",
            F.round(
                F.lit(1e4) * F.col("n_tokens") / (F.col("n_bins") * 512), 0
            )
            .cast("long")
            .alias("util_bp"),
        )
        .orderBy("source")
    )


def q216_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source resampling weights (the multilingual /
    multi-domain mixing move: weight ∝ n^alpha with alpha=0.5 flattens
    the source distribution): per-source doc counts -> sqrt in exact
    integer micro-units FIRST (sqrt is a correctly-rounded IEEE op both
    engines agree on; rounding to int immediately means the cross-source
    SUM is exact integer arithmetic, immune to float accumulation
    order) -> weight in ppm as the rounded ratio of two exact integers.
    Scale: one map-side-combined count per source + a broadcast-sized
    weight frame."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_toks")
    )
    s = n.select(
        "source",
        "n_toks",
        F.round(F.lit(1e6) * F.sqrt(F.col("n_toks")), 0)
        .cast("long")
        .alias("s_e6"),
    )
    tot = s.agg(F.sum("s_e6").alias("__tot"))
    return (
        s.join(F.broadcast(tot))
        .select(
            "source",
            "n_toks",
            "s_e6",
            F.round(F.lit(1e6) * F.col("s_e6") / F.col("__tot"), 0)
            .cast("long")
            .alias("w_ppm"),
        )
        .orderBy("source")
    )


def q217_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit — the measurement that justifies
    q186's group-level split: distinct 5-gram leakage from test into
    train under (a) the leakage-safe BY-SOURCE split and (b) a naive
    BY-ROW split, same 80/10/10 hash buckets. One row per strategy:
    distinct test grams, how many also occur in train, leakage in ppm
    (rounded ratio of exact integers). Scale: each side is one distinct
    over the gram stream + a gram-keyed semi-join — the q90
    decontamination plan applied to the split audit. The token array is
    MATERIALIZED into a column before shingling (round 11: `shingles`
    over raw text inlines split(text) into every element_at — k=5 means
    ~250 re-splits per doc in the interpreted HOF, measured >560 s for
    one pass at 100×; `shingles_of` over the materialized array brought
    it back to the linear gram-shuffle cost)."""
    from pandas_streaming_spark.functions import shingles_of, tokens

    docs = load_table(spark, sf_dir, "documents")

    def audit(split_col: str, label: str) -> DataFrame:
        s = hash_split(docs, split_col, {"train": 80, "val": 10, "test": 10})
        grams = s.select(
            "split", tokens(F.col("text")).alias("__t")
        ).select("split", F.explode(shingles_of(F.col("__t"), 5)).alias("g"))
        train_g = (
            grams.filter(F.col("split") == "train").select("g").distinct()
        )
        test_g = grams.filter(F.col("split") == "test").select("g").distinct()
        leaked = test_g.join(train_g, "g", "left_semi")
        n_test = test_g.agg(F.count("*").cast("long").alias("n_test_grams"))
        n_leak = leaked.agg(F.count("*").cast("long").alias("n_leaked"))
        return (
            n_test.join(n_leak)
            .select(
                F.lit(label).alias("strategy"),
                "n_test_grams",
                "n_leaked",
                F.round(
                    F.lit(1e6) * F.col("n_leaked") / F.col("n_test_grams"), 0
                )
                .cast("long")
                .alias("leak_ppm"),
            )
        )

    return (
        audit("source", "by_source")
        .unionByName(audit("doc_id", "by_doc"))
        .orderBy("strategy")
    )


def q222_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the temperature-flattened corpus MIX — q216's n^0.5
    weights turned into an actual per-source quota and a deterministic
    pick: quota_s = round(target · w_ppm/1e6) docs (target = 40% of the
    corpus), members chosen by (md5(doc_id), doc_id) rank within the
    source — content-addressed, so the oracle computes IDENTICAL
    membership and a re-run after ingesting more data keeps prior picks
    stable within each source's rank prefix. Graded per source: quota,
    docs kept (min(quota, available)), tokens kept. Scale: one weight
    frame broadcast back onto the docs, one per-source rank window."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    n = docs.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("n_toks"),
        F.count("*").cast("long").alias("n_docs"),
    )
    s = n.select(
        "source",
        "n_docs",
        F.round(F.lit(1e6) * F.sqrt(F.col("n_toks")), 0)
        .cast("long")
        .alias("s_e6"),
    )
    tot = s.agg(F.sum("s_e6").alias("__tot"))
    target = docs.agg(
        F.round(F.count("*") * 0.4, 0).cast("long").alias("__target")
    )
    quotas = (
        s.join(F.broadcast(tot))
        .join(F.broadcast(target))
        .select(
            "source",
            F.round(
                F.col("__target") * F.col("s_e6") / F.col("__tot"), 0
            )
            .cast("long")
            .alias("quota"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    picked = (
        docs.join(F.broadcast(quotas), "source")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("quota"))
    )
    return (
        picked.groupBy("source", "quota")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("n_tok").cast("long").alias("toks_kept"),
        )
        .select("source", "quota", "n_kept", "toks_kept")
        .orderBy("source")
    )


def q230_stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified BALANCED k-fold assignment (cross-validation's
    fold-builder): within each language stratum, docs are ranked by
    (md5(doc_id), doc_id) — content-addressed, ingest-order-free — and
    fold = (rank−1) mod 5. Unlike hash-mod folds (q75's split family),
    rank-mod GUARANTEES per-stratum balance: max−min fold size ≤ 1 by
    construction, and the query carries that audit as a column the
    oracle re-derives (a fold tool that can't prove its own balance
    isn't a balanced fold tool — the q186 audit-row discipline).
    Scale: one rank window per stratum + two tiny aggregates."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    folded = docs.select(
        "lang",
        ((F.row_number().over(w) - 1) % 5).cast("long").alias("fold"),
    )
    per = folded.groupBy("lang", "fold").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    wl = Window.partitionBy("lang")
    return per.select(
        "lang",
        "fold",
        "n_docs",
        (F.max("n_docs").over(wl) - F.min("n_docs").over(wl))
        .cast("long")
        .alias("lang_spread"),
    ).orderBy("lang", "fold")


def q231_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-diagnostics source-overlap matrix: exact token-set Jaccard
    between source domains — "which domains duplicate each other's
    vocabulary", the corpus-level sibling of the doc-level dedup family.
    Distinct (source, token) first, so the self-join runs on the
    VOCABULARY-reduced frame (|sources|·|vocab| rows max, not corpus
    rows); top-10 most-similar pairs by e4 Jaccard with full tie-break.
    Scale: one distinct + one token-keyed join over source-token sets —
    at real corpora cap tokens to the per-source top-K vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count("*").cast("long").alias("n"))
    a = st.select(F.col("source").alias("src_a"), "tok")
    b = st.select(F.col("source").alias("src_b"), "tok")
    common = (
        a.join(b, "tok")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    na = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "src_a")
        .join(nb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            (F.col("na") + F.col("nb") - F.col("n_common")).alias("n_union"),
            F.round(
                F.lit(1e4)
                * F.col("n_common")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                0,
            )
            .cast("long")
            .alias("jac_e4"),
        )
        .orderBy(F.col("jac_e4").desc(), "src_a", "src_b")
        .limit(10)
    )


def q234_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization across groups — the batch-effect
    correction move (map every segment's score distribution onto the
    GLOBAL quantiles, so segments become comparable): per-segment rank
    r of n_s maps to global rank ⌈r·N/n_s⌉−1 (pure integer-derived
    arithmetic, exact in a double's mantissa to N~2^26), and the
    normalized value is the global order statistic at that rank —
    looked up via the DISTRIBUTED global rank
    (operators/indexing.global_index: range exchange + per-partition
    window, no single-task sort). Graded per segment: n, plain mean,
    normalized mean (exact-cent ratios). The global_index pin is
    released after the result materializes (the q180/q196 contract)."""
    from pyspark.sql import Window

    from pandas_streaming_spark.operators.indexing import global_index

    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        "c_custkey",
    )
    ws = Window.partitionBy("c_mktsegment").orderBy("cents", "c_custkey")
    ranked = c.select(
        "c_mktsegment",
        "cents",
        F.row_number().over(ws).cast("long").alias("__r"),
        F.count("*")
        .over(Window.partitionBy("c_mktsegment"))
        .cast("long")
        .alias("__ns"),
    )
    gi = global_index(c, ["cents", "c_custkey"], "__g")
    glob = gi.df.select(
        F.col("__g").cast("long").alias("__gt"),
        F.col("cents").alias("norm_cents"),
    )
    n = glob.agg(F.count("*").cast("long").alias("__n"))
    mapped = (
        ranked.join(F.broadcast(n))
        .withColumn(
            "__gt",
            (
                F.ceil(F.col("__r") * F.col("__n") / F.col("__ns")) - 1
            ).cast("long"),
        )
        .join(glob.hint("shuffle_hash"), "__gt")
    )
    out = (
        mapped.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("cents") / F.count("*"), 0)
            .cast("long")
            .alias("mean_cents"),
            F.round(F.sum("norm_cents") / F.count("*"), 0)
            .cast("long")
            .alias("norm_mean_cents"),
        )
        .orderBy("c_mktsegment")
        .localCheckpoint(eager=True)
    )
    gi.release()
    return out


def q266_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch allocation (the Muennighoff et al. 2023
    question: when the mixing weights ask a source for more tokens than
    it has, how many EPOCHS of it does the run repeat?): q216's n^0.5
    temperature weights turned into a per-source token budget — total
    budget = 30% of corpus tokens, target_s = the exact integer
    ``floor(total·3·w_ppm / 10^7)`` — and graded as unique tokens used
    (min(avail, target)), repeated tokens (the overflow the run must
    re-epoch), and epochs in exact centi-epochs ``floor(100·target /
    avail)``. Everything after the one corpus token count is integer
    arithmetic on a |sources| frame (w_ppm rides the q216 sqrt-then-
    round-then-ratio rule both engines agree on). Scale: one map-side-
    combined per-source aggregate + a 1-row broadcast total."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_toks")
    )
    s = n.select(
        "source",
        "n_toks",
        F.round(F.lit(1e6) * F.sqrt(F.col("n_toks")), 0)
        .cast("long")
        .alias("__s_e6"),
    )
    tot = s.agg(
        F.sum("__s_e6").cast("long").alias("__tot_s"),
        F.sum("n_toks").cast("long").alias("__tot_n"),
    )
    j = s.join(F.broadcast(tot)).select(
        "source",
        "n_toks",
        F.round(F.lit(1e6) * F.col("__s_e6") / F.col("__tot_s"), 0)
        .cast("long")
        .alias("w_ppm"),
        F.col("__tot_n"),
    )
    # integral `div`, not floor-of-double-division: at real corpus sizes
    # (1e12 tokens) tn·3·w_ppm exceeds 2^53 and the double quotient can
    # floor wrong; long div stays exact to the int64 limit
    target = F.expr("(__tot_n * 3 * w_ppm) div 10000000").cast("long")
    return j.select(
        "source",
        "n_toks",
        "w_ppm",
        target.alias("target_toks"),
        F.least(F.col("n_toks"), target).cast("long").alias("unique_toks"),
        F.greatest(F.lit(0), target - F.col("n_toks"))
        .cast("long")
        .alias("repeated_toks"),
        (target * 100).cast("long").alias("__t100"),
    ).select(
        "source",
        "n_toks",
        "w_ppm",
        "target_toks",
        "unique_toks",
        "repeated_toks",
        F.expr("__t100 div n_toks").cast("long").alias("epochs_x100"),
    ).orderBy("source")


def q280_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced SHARD MANIFEST for N=8 data-loader workers — the
    assignment a distributed trainer computes before the first step (an
    unbalanced shard makes every gradient step wait for the fattest
    worker): docs ranked by (token count desc, doc_id), then dealt
    SERPENTINE over 16 positions (0..7 then 7..0 — the folded
    round-robin that cancels the size gradient a plain modulo deal
    leaves: consecutive size-ranked docs land on mirrored workers, so
    each pair of passes gives every shard one big + one small). Graded:
    per-shard doc/token counts and token share in ppm, plus a __TOTAL__
    row carrying the max-minus-min token imbalance in ppm of the mean —
    the number the manifest is rebuilt to minimize. Everything integer:
    serpentine position is pure modular arithmetic on the rank.
    Scale: one window over the doc-count-sized (doc, tokens) frame;
    at real scale the rank comes from q180's two-phase global index."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("toks")
    )
    w = Window.orderBy(F.col("toks").desc(), "doc_id")
    dealt = toks.withColumn("__r", F.row_number().over(w)).select(
        "doc_id",
        "toks",
        F.expr(
            "CAST(CASE WHEN (__r - 1) % 16 < 8 THEN (__r - 1) % 16 "
            "ELSE 15 - ((__r - 1) % 16) END AS BIGINT)"
        ).alias("shard"),
    )
    cells = dealt.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
    )
    tot = cells.agg(
        F.sum("n_tokens").cast("long").alias("__T"),
        F.sum("n_docs").cast("long").alias("__D"),
        F.count("*").cast("long").alias("__k"),
        F.max("n_tokens").cast("long").alias("__mx"),
        F.min("n_tokens").cast("long").alias("__mn"),
    )
    per = cells.crossJoin(F.broadcast(tot)).select(
        F.concat(F.lit("shard_"), F.col("shard").cast("string")).alias("shard"),
        "n_docs",
        "n_tokens",
        F.round(F.lit(1e6) * F.col("n_tokens") / F.col("__T"), 0)
        .cast("long")
        .alias("share_ppm"),
        F.lit(None).cast("long").alias("imbalance_ppm"),
    )
    total = tot.select(
        F.lit("__TOTAL__").alias("shard"),
        F.col("__D").alias("n_docs"),
        F.col("__T").alias("n_tokens"),
        F.lit(1000000).cast("long").alias("share_ppm"),
        F.round(
            F.lit(1e6) * (F.col("__mx") - F.col("__mn")) * F.col("__k")
            / F.col("__T"),
            0,
        )
        .cast("long")
        .alias("imbalance_ppm"),
    )
    return per.unionByName(total).orderBy("shard")


def q281_interleave_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic STRIDE-INTERLEAVED training order across sources —
    the data-loader schedule that turns q216-style mixing weights into
    an actual document SEQUENCE (stride scheduling: source s's r-th doc
    runs at virtual time (2r−1)/(2·n_s), so each source's docs spread
    evenly through the epoch instead of arriving in source-sized
    blocks; a shuffled-concat order would put early training entirely
    on one source). Virtual time rides an exact integer key:
    ``(2r−1)·1e9 div n_s`` (both engines integral-divide int64; r ≤ 1e7
    keeps the product in range), ties broken (source, doc_id). Graded:
    the first 40 positions of the epoch — the interleaving is visible
    as source alternation — with each row's source, doc_id, in-source
    rank and the integer virtual-time key. Scale: one per-source rank
    window + a TakeOrdered-40 over the keyed frame; no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    keyed = (
        docs.select("source", "doc_id")
        .withColumn("r", F.row_number().over(w).cast("long"))
        .withColumn(
            "n_s", F.count("*").over(Window.partitionBy("source")).cast("long")
        )
        .select(
            "source",
            "doc_id",
            "r",
            F.expr("CAST((2 * r - 1) * 1000000000 div n_s AS BIGINT)").alias(
                "vt_key"
            ),
        )
    )
    first = keyed.orderBy("vt_key", "source", "doc_id").limit(40)
    wp = Window.orderBy("vt_key", "source", "doc_id")
    return (
        first.withColumn("position", F.row_number().over(wp).cast("long"))
        .select("position", "source", "doc_id", "r", "vt_key")
        .orderBy("position")
    )


def q283_truncation_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window TRUNCATION-LOSS audit — what a fixed sequence
    budget (C=256 tokens) silently throws away, per source: docs over
    budget, tokens lost (Σ max(toks−C, 0)), and the loss share in ppm.
    The q239/q258 packing entries optimize HOW to cut; this measures
    WHAT a naive truncate-at-C policy costs per source — the number
    that decides whether a source needs chunking (q84) instead of
    truncation. All exact integers except the rounded ppm ratios.
    Scale: one narrow map (token count per doc) + a map-side-combined
    per-source aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    budget = 256
    t = docs.select(
        "source", F.size(F.split("text", " ")).cast("long").alias("toks")
    )
    return (
        t.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("toks") > budget).cast("long"))
            .cast("long")
            .alias("n_truncated"),
            F.sum("toks").cast("long").alias("n_tokens"),
            F.sum(F.greatest(F.col("toks") - budget, F.lit(0)))
            .cast("long")
            .alias("tokens_lost"),
        )
        .select(
            "source",
            "n_docs",
            "n_truncated",
            "n_tokens",
            "tokens_lost",
            F.round(F.lit(1e6) * F.col("tokens_lost") / F.col("n_tokens"), 0)
            .cast("long")
            .alias("loss_ppm"),
            F.round(F.lit(1e6) * F.col("n_truncated") / F.col("n_docs"), 0)
            .cast("long")
            .alias("truncated_ppm"),
        )
        .orderBy("source")
    )


_DSIR_B = 256  # hashed-feature buckets (Xie et al. 2023 use 10k; 256 keeps
# every bucket populated at the grading corpus so the estimator is exercised)


def _dsir_doc_scores(docs: DataFrame) -> DataFrame:
    """Shared DSIR scoring chain (q289 grades the per-source resampling
    table; q302 grades the score's classifier quality): md5-bucket
    features, add-one target/raw bucket models, per-doc half-bit
    integer log-ratio sums. Returns (doc_id, source, lang, __s)."""
    words = docs.select(
        "doc_id",
        "source",
        "lang",
        (F.col("lang") == "en").cast("long").alias("__tgt"),
        F.explode(F.split("text", " ")).alias("__w"),
    ).select(
        "doc_id",
        "source",
        "lang",
        "__tgt",
        (
            F.conv(F.substring(F.md5("__w"), 1, 7), 16, 10).cast("long")
            % _DSIR_B
        ).alias("__b"),
    )
    bc = words.groupBy("__b").agg(
        F.sum("__tgt").cast("long").alias("__ct"),
        F.count("*").cast("long").alias("__cr"),
    # _DSIR_B rows, consumed by tots AND the weight table — lazily each
    # re-ran the corpus-wide model fit (r16, guide §2.4/§5)
    ).localCheckpoint(eager=False)
    tots = bc.agg(
        F.sum("__ct").alias("__st"), F.sum("__cr").alias("__sr")
    ).select(
        F.expr(hb_sql(f"(__st + {_DSIR_B})")).alias("__qt"),
        F.expr(hb_sql(f"(__sr + {_DSIR_B})")).alias("__qr"),
    )
    w = bc.crossJoin(F.broadcast(tots)).select(
        "__b",
        (
            F.expr(hb_sql("(__ct + 1)"))
            - F.col("__qt")
            - F.expr(hb_sql("(__cr + 1)"))
            + F.col("__qr")
        )
        .cast("long")
        .alias("__whb"),
    )
    return (
        words.join(F.broadcast(w), "__b")
        .groupBy("doc_id", "source", "lang")
        .agg(F.sum("__whb").cast("long").alias("__s"))
    )


def q289_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al. 2023),
    the hashed-n-gram importance estimator modern pretraining pipelines
    use to up-weight target-domain-like documents: featurize every word
    into one of ``_DSIR_B`` md5 buckets (content-addressed, so the duckdb
    oracle computes IDENTICAL features), fit two unigram bucket models —
    target = the ``lang = 'en'`` slice (the "trusted domain"), raw = the
    whole corpus — with add-one smoothing, and score each document by
    the bag-of-features log-likelihood ratio Σ_w [log p_tgt(b(w)) −
    log p_raw(b(w))]. All log-probs are integer HALF-BIT units
    (hb(c) = length(bin(c·c)) − 1 = floor(2·log2 c), the q275
    quantization — exact in both engines for the full BIGINT count range:
    Spark computes it via functions.hb_sql's decimal decomposition with no
    64-bit square, duckdb rides HUGEINT), so every score is an exact
    integer.
    Graded per source: docs, exact score sum, mean score (e3), and the
    resampling readout — how many docs score ABOVE the corpus-wide
    lower-median score (the deterministic analog of importance
    resampling at rate 1/2: keep the most-target-like half; a fixed
    ``> 0`` cut is degenerate when target and raw share a vocabulary,
    as this synthetic corpus does) with the selected share in ppm.
    Scale: one corpus pass for the 256-row bucket models (map-side
    combined), one scoring pass (broadcast weight table — constant size
    at any corpus), one exact-median rank pass over DOC-level rows
    (the q202/q157 exact-median convention — production would swap in
    an approx-quantile sketch for the cut point), one rollup."""
    docs = load_table(spark, sf_dir, "documents")
    # r16: the scoring chain feeds the median rank pass, the count and
    # the per-source rollup — pin the narrow doc-score frame so DSIR
    # scoring runs once (guide §2.4/§5; q289 planned 9 document scans)
    ds = (
        _dsir_doc_scores(docs)
        .select("doc_id", "source", "__s")
        .localCheckpoint(eager=False)
    )
    from pyspark.sql import Window

    wm = Window.orderBy("__s", "doc_id")
    med = (
        ds.withColumn("__rn", F.row_number().over(wm))
        .crossJoin(F.broadcast(ds.agg(F.count("*").alias("__n"))))
        .filter(F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        .select(F.col("__s").alias("__med"))
    )
    return (
        ds.crossJoin(F.broadcast(med))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__s").cast("long").alias("sum_score_hb"),
            F.sum((F.col("__s") > F.col("__med")).cast("long"))
            .cast("long")
            .alias("n_selected"),
        )
        .select(
            "source",
            "n_docs",
            "sum_score_hb",
            F.round(F.lit(1e3) * F.col("sum_score_hb") / F.col("n_docs"), 0)
            .cast("long")
            .alias("mean_score_hb_e3"),
            "n_selected",
            F.round(F.lit(1e6) * F.col("n_selected") / F.col("n_docs"), 0)
            .cast("long")
            .alias("selected_ppm"),
        )
        .orderBy("source")
    )


def q302_dsir_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC of the DSIR importance score as a TARGET-DOMAIN classifier —
    the eval that tells you whether the hashed-n-gram estimator is
    worth mixing with (Xie et al. report exactly this separability):
    score every doc with q289's chain, label en docs positive (the
    target domain the weights were fit to), and compute the
    Mann-Whitney rank-sum AUC with tie-AVERAGED ranks in doubled
    integer units (q293's convention): 2U = Σ r2(pos) − P(P+1) and
    auc_e4 = round(1e4·2U / (2·P·N)) — every intermediate an exact
    long, one final rounded ratio. On THIS synthetic corpus languages
    share a vocabulary, so the honest expectation is an AUC near 0.5
    (the score barely separates) — precisely the readout that stops a
    pipeline from shipping a useless gate; the test pins it inside
    (0.3, 0.7) while real corpora would pin >> 0.5. Scale: one global
    rank window over DOC-level rows (q202's exact-rank convention —
    production swaps a sampled AUC) + one 1-row aggregate."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    ds = _dsir_doc_scores(docs)
    w = Window.orderBy("__s")
    wt = Window.partitionBy("__s")
    r = ds.select(
        (F.col("lang") == "en").cast("long").alias("__p"),
        (F.lit(2) * F.rank().over(w) + F.count("*").over(wt) - 1)
        .cast("long")
        .alias("__r2"),
    )
    return r.agg(
        F.sum("__p").cast("long").alias("n_pos"),
        (F.count("*") - F.sum("__p")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__p") == 1, F.col("__r2")).otherwise(0))
        .cast("long")
        .alias("__sr"),
    ).select(
        "n_pos",
        "n_neg",
        (F.col("__sr") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("long")
        .alias("u2"),
        F.round(
            F.lit(1e4)
            * (F.col("__sr") - F.col("n_pos") * (F.col("n_pos") + 1))
            / (F.lit(2) * F.col("n_pos") * F.col("n_neg")),
            0,
        )
        .cast("long")
        .alias("auc_e4"),
    )


_Q297_B = 8  # data-loader batch width


def q297_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PADDING-WASTE audit of two batching strategies — the
    training-efficiency measurement behind dynamic/length-bucketed
    batching (every padded position is a FLOP spent on a pad token):
    cut the corpus into batches of ``_Q297_B`` docs (1) in arrival
    (doc_id) order and (2) in length-sorted order (toks desc, doc_id —
    the bucketed-batching strategy), pad every batch to its own max
    length, and grade per strategy: batch count, useful tokens, padded
    tokens (Σ n_i·max_i − Σ toks — exact integers), and waste ppm.
    Length-sorting collapses within-batch length variance, so its waste
    must be ≤ arrival's (pinned by test) — this table is the
    justification a pipeline attaches to its sampler choice. The
    packing family (q85/q209/q239/q258) removes padding by
    concatenation; this audits the pad-to-max regime concat can't be
    used in (e.g. contrastive/reward batches). Scale: the global
    row_number is the q280/q180 caveat — at corpus scale the rank comes
    from the global-index chain (sorted zone maps), everything after is
    one map-side-combined aggregate over batch ids."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    t = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("__toks")
    )

    def stat(order_cols, name: str) -> DataFrame:
        w = Window.orderBy(*order_cols)
        b = t.withColumn("__rn", F.row_number().over(w)).withColumn(
            "__b", F.expr(f"CAST((__rn - 1) div {_Q297_B} AS BIGINT)")
        )
        per = b.groupBy("__b").agg(
            F.count("*").alias("__n"),
            F.max("__toks").alias("__mx"),
            F.sum("__toks").alias("__s"),
        )
        return per.agg(
            F.count("*").cast("long").alias("n_batches"),
            F.sum("__s").cast("long").alias("useful_tokens"),
            (F.sum(F.col("__n") * F.col("__mx")) - F.sum("__s"))
            .cast("long")
            .alias("padded_tokens"),
        ).select(
            F.lit(name).alias("strategy"),
            "n_batches",
            "useful_tokens",
            "padded_tokens",
        )

    out = stat([F.col("doc_id")], "1_arrival").unionByName(
        stat([F.col("__toks").desc(), F.col("doc_id")], "2_length_sorted")
    )
    return out.select(
        "strategy",
        "n_batches",
        "useful_tokens",
        "padded_tokens",
        F.round(
            F.lit(1e6)
            * F.col("padded_tokens")
            / (F.col("padded_tokens") + F.col("useful_tokens")),
            0,
        )
        .cast("long")
        .alias("waste_ppm"),
    ).orderBy("strategy")


def q298_dedup_adjusted_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEDUP-ADJUSTED epoch allocation — q266's data-constrained mixing
    recomputed on the supply that SURVIVES near-dup removal (the
    composition a real run needs: mixing weights planned on raw counts
    overshoot once dedup shrinks a scraped-twice source, and the run
    silently re-epochs it): per source, raw vs deduped token supply
    (q286's pairwise keep-smallest rule over the verified ≥ 0.8 pair
    frame), q216's sqrt temperature weights over the DEDUPED supply,
    the 30% token budget target (exact integral div — the q266
    overflow-safe rule), unique/repeated tokens and exact centi-epochs,
    PLUS the naive plan's centi-epochs (targets computed on raw counts,
    then trained on the deduped supply) — the planning-error column
    this composition exists to expose. Scale: the dedup panel rides the
    bucketed LSH chain; everything after is integer arithmetic on a
    |sources| frame with 1-row broadcast totals."""
    from pandas_streaming_spark.queries.dedup_q import verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    removed = (
        verified_pairs(spark, sf_dir, 8000)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("__rm", F.lit(1))
    )
    per = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("__t"),
    ).join(removed, "doc_id", "left")
    n = per.groupBy("source").agg(
        F.sum("__t").cast("long").alias("raw_toks"),
        F.sum(F.when(F.col("__rm").isNull(), F.col("__t")).otherwise(0))
        .cast("long")
        .alias("dedup_toks"),
    )
    s = n.select(
        "*",
        F.round(F.lit(1e6) * F.sqrt(F.col("dedup_toks")), 0)
        .cast("long")
        .alias("__s_e6"),
        F.round(F.lit(1e6) * F.sqrt(F.col("raw_toks")), 0)
        .cast("long")
        .alias("__sr_e6"),
    )
    tot = s.agg(
        F.sum("__s_e6").cast("long").alias("__tot_s"),
        F.sum("dedup_toks").cast("long").alias("__tot_n"),
        F.sum("__sr_e6").cast("long").alias("__tot_sr"),
        F.sum("raw_toks").cast("long").alias("__tot_nr"),
    )
    j = s.join(F.broadcast(tot)).select(
        "source",
        "raw_toks",
        "dedup_toks",
        F.round(F.lit(1e6) * F.col("__s_e6") / F.col("__tot_s"), 0)
        .cast("long")
        .alias("w_ppm"),
        F.round(F.lit(1e6) * F.col("__sr_e6") / F.col("__tot_sr"), 0)
        .cast("long")
        .alias("__wr_ppm"),
        "__tot_n",
        "__tot_nr",
    )
    target = F.expr("(__tot_n * 3 * w_ppm) div 10000000").cast("long")
    target_raw = F.expr("(__tot_nr * 3 * __wr_ppm) div 10000000").cast("long")
    return (
        j.select(
            "source",
            "raw_toks",
            "dedup_toks",
            "w_ppm",
            target.alias("target_toks"),
            target_raw.alias("__tr"),
        )
        .select(
            "source",
            "raw_toks",
            "dedup_toks",
            "w_ppm",
            "target_toks",
            F.least(F.col("dedup_toks"), F.col("target_toks"))
            .cast("long")
            .alias("unique_toks"),
            F.greatest(F.lit(0), F.col("target_toks") - F.col("dedup_toks"))
            .cast("long")
            .alias("repeated_toks"),
            F.expr("(target_toks * 100) div greatest(dedup_toks, 1)")
            .cast("long")
            .alias("epochs_x100"),
            F.expr("(__tr * 100) div greatest(dedup_toks, 1)")
            .cast("long")
            .alias("epochs_naive_x100"),
        )
        .orderBy("source")
    )


QUERIES = {
    "q289_dsir_importance": q289_dsir_importance,
    "q297_padding_waste": q297_padding_waste,
    "q298_dedup_adjusted_epochs": q298_dedup_adjusted_epochs,
    "q302_dsir_auc": q302_dsir_auc,
    "q196_negative_pairs": q196_negative_pairs,
    "q280_shard_manifest": q280_shard_manifest,
    "q281_interleave_order": q281_interleave_order,
    "q283_truncation_loss": q283_truncation_loss,
    "q266_epoch_allocation": q266_epoch_allocation,
    "q209_pack_bins": q209_pack_bins,
    "q258_packing_size_sweep": q258_packing_size_sweep,
    "q217_split_leakage": q217_split_leakage,
    "q222_temperature_mix": q222_temperature_mix,
    "q230_stratified_kfold": q230_stratified_kfold,
    "q231_source_overlap": q231_source_overlap,
    "q234_quantile_normalize": q234_quantile_normalize,
    "q216_temperature_weights": q216_temperature_weights,
    "q203_pmi_collocations": q203_pmi_collocations,
    "q206_srm_check": q206_srm_check,
    "q186_group_split": q186_group_split,
    "q74_deterministic_sample": q74_deterministic_sample,
    "q75_hash_split": q75_hash_split,
    "q76_cap_per_source": q76_cap_per_source,
    "q83_stratified_sample": q83_stratified_sample,
    "q85_pack_sequences": q85_pack_sequences,
    "q80_corpus_pipeline": q80_corpus_pipeline,
}

_LEAK_ONE = """
SELECT '{label}' AS strategy,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM tg_{label}) AS n_test_grams,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM tg_{label}
        WHERE g IN (SELECT g FROM trg_{label})) AS n_leaked,
       CAST(ROUND(1e6 * (SELECT COUNT(*) FROM tg_{label}
                         WHERE g IN (SELECT g FROM trg_{label}))
                  / (SELECT COUNT(*) FROM tg_{label}), 0) AS BIGINT)
         AS leak_ppm
"""

_LEAK_GRAMS = """
sp_{label} AS (
  SELECT text,
         CASE WHEN {bucket} < 10 THEN 'test'
              WHEN {bucket} < 90 THEN 'train'
              ELSE 'val' END AS split
  FROM documents
),
g_{label} AS (
  SELECT split, UNNEST(LIST_TRANSFORM(
           GENERATE_SERIES(1, GREATEST(LEN(tk) - 4, 0)),
           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' '
                || tk[i+3] || ' ' || tk[i+4])) AS g
  FROM (SELECT split, STRING_SPLIT(text, ' ') AS tk FROM sp_{label})
),
tg_{label} AS (SELECT DISTINCT g FROM g_{label} WHERE split = 'test'),
trg_{label} AS (SELECT DISTINCT g FROM g_{label} WHERE split = 'train')
"""

ORACLES = {
    # same DSIR per-doc scores; tie-averaged doubled ranks, exact
    # Mann-Whitney 2U, one e4 ratio
    "q302_dsir_auc": f"""
WITH words AS MATERIALIZED (
  SELECT doc_id, lang,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_tgt,
         CAST(CONCAT('0x', SUBSTR(MD5(word), 1, 7)) AS BIGINT) % {_DSIR_B} AS b
  FROM (SELECT doc_id, lang,
               UNNEST(STRING_SPLIT(text, ' ')) AS word
        FROM documents)
),
bc AS MATERIALIZED (
  SELECT b, CAST(SUM(is_tgt) AS BIGINT) AS ct,
         CAST(COUNT(*) AS BIGINT) AS cr
  FROM words GROUP BY b
),
tots AS (
  SELECT CAST(LENGTH(BIN(((SUM(ct) + {_DSIR_B})::HUGEINT)
                          * (SUM(ct) + {_DSIR_B}))) - 1 AS BIGINT) AS qt,
         CAST(LENGTH(BIN(((SUM(cr) + {_DSIR_B})::HUGEINT)
                          * (SUM(cr) + {_DSIR_B}))) - 1 AS BIGINT) AS qr
  FROM bc
),
w AS (
  SELECT b,
         CAST(LENGTH(BIN(((ct + 1)::HUGEINT) * (ct + 1))) - 1 AS BIGINT) - qt
         - CAST(LENGTH(BIN(((cr + 1)::HUGEINT) * (cr + 1))) - 1 AS BIGINT) + qr
           AS w_hb
  FROM bc CROSS JOIN tots
),
ds AS MATERIALIZED (
  SELECT doc_id, ANY_VALUE(lang) AS lang, CAST(SUM(w_hb) AS BIGINT) AS s
  FROM words JOIN w USING (b) GROUP BY doc_id
),
r AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p,
         CAST(2 * RANK() OVER (ORDER BY s)
              + COUNT(*) OVER (PARTITION BY s) - 1 AS BIGINT) AS r2
  FROM ds
),
agg AS (
  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(COUNT(*) - SUM(p) AS BIGINT) AS n_neg,
         CAST(SUM(CASE WHEN p = 1 THEN r2 ELSE 0 END) AS BIGINT) AS sr
  FROM r
)
SELECT n_pos, n_neg,
       CAST(sr - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       CAST(ROUND(1e4 * (sr - n_pos * (n_pos + 1))
                  / (2 * n_pos * n_neg), 0) AS BIGINT) AS auc_e4
FROM agg
""",
    # identical md5 bucket features, add-one bucket models, half-bit
    # integer log-ratio scores, per-source resampling readout
    "q289_dsir_importance": f"""
WITH words AS MATERIALIZED (
  SELECT doc_id, source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_tgt,
         CAST(CONCAT('0x', SUBSTR(MD5(word), 1, 7)) AS BIGINT) % {_DSIR_B} AS b
  FROM (SELECT doc_id, source, lang,
               UNNEST(STRING_SPLIT(text, ' ')) AS word
        FROM documents)
),
bc AS MATERIALIZED (
  SELECT b, CAST(SUM(is_tgt) AS BIGINT) AS ct,
         CAST(COUNT(*) AS BIGINT) AS cr
  FROM words GROUP BY b
),
tots AS (
  SELECT CAST(LENGTH(BIN(((SUM(ct) + {_DSIR_B})::HUGEINT)
                          * (SUM(ct) + {_DSIR_B}))) - 1 AS BIGINT) AS qt,
         CAST(LENGTH(BIN(((SUM(cr) + {_DSIR_B})::HUGEINT)
                          * (SUM(cr) + {_DSIR_B}))) - 1 AS BIGINT) AS qr
  FROM bc
),
w AS (
  SELECT b,
         CAST(LENGTH(BIN(((ct + 1)::HUGEINT) * (ct + 1))) - 1 AS BIGINT) - qt
         - CAST(LENGTH(BIN(((cr + 1)::HUGEINT) * (cr + 1))) - 1 AS BIGINT) + qr
           AS w_hb
  FROM bc CROSS JOIN tots
),
ds AS MATERIALIZED (
  SELECT doc_id, source, CAST(SUM(w_hb) AS BIGINT) AS s
  FROM words JOIN w USING (b) GROUP BY doc_id, source
),
med AS (
  SELECT s AS med FROM (
    SELECT s, ROW_NUMBER() OVER (ORDER BY s, doc_id) AS rn,
           COUNT(*) OVER () AS n
    FROM ds
  ) WHERE rn = (n + 1) // 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(s) AS BIGINT) AS sum_score_hb,
       CAST(ROUND(1e3 * SUM(s) / COUNT(*), 0) AS BIGINT) AS mean_score_hb_e3,
       CAST(SUM(CASE WHEN s > med THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       CAST(ROUND(1e6 * SUM(CASE WHEN s > med THEN 1 ELSE 0 END)
                  / COUNT(*), 0) AS BIGINT) AS selected_ppm
FROM ds CROSS JOIN med GROUP BY source ORDER BY source
""",
    # both batching orders, pad-to-batch-max accounting, exact integers
    "q297_padding_waste": f"""
WITH t AS (
  SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS toks
  FROM documents
),
arr AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // {_Q297_B} AS b, toks
  FROM t
),
srt AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY toks DESC, doc_id) - 1) // {_Q297_B}
           AS b, toks
  FROM t
),
pa AS (
  SELECT b, COUNT(*) AS n, MAX(toks) AS mx, SUM(toks) AS s
  FROM arr GROUP BY b
),
ps AS (
  SELECT b, COUNT(*) AS n, MAX(toks) AS mx, SUM(toks) AS s
  FROM srt GROUP BY b
),
u AS (
  SELECT '1_arrival' AS strategy, CAST(COUNT(*) AS BIGINT) AS n_batches,
         CAST(SUM(s) AS BIGINT) AS useful_tokens,
         CAST(SUM(n * mx) - SUM(s) AS BIGINT) AS padded_tokens
  FROM pa
  UNION ALL
  SELECT '2_length_sorted', CAST(COUNT(*) AS BIGINT),
         CAST(SUM(s) AS BIGINT), CAST(SUM(n * mx) - SUM(s) AS BIGINT)
  FROM ps
)
SELECT strategy, n_batches, useful_tokens, padded_tokens,
       CAST(ROUND(1e6 * padded_tokens
                  / (padded_tokens + useful_tokens), 0) AS BIGINT)
         AS waste_ppm
FROM u ORDER BY strategy
""",
    # serpentine deal over the (toks desc, doc_id) rank; ppm shares
    "q280_shard_manifest": """
WITH t AS (
  SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS toks
  FROM documents
),
dealt AS (
  SELECT toks,
         CAST(CASE WHEN (r - 1) % 16 < 8 THEN (r - 1) % 16
              ELSE 15 - ((r - 1) % 16) END AS BIGINT) AS shard
  FROM (SELECT doc_id, toks,
               ROW_NUMBER() OVER (ORDER BY toks DESC, doc_id) AS r
        FROM t)
),
cells AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(toks) AS BIGINT) AS n_tokens
  FROM dealt GROUP BY shard
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt, CAST(SUM(n_docs) AS BIGINT) AS dd,
         CAST(COUNT(*) AS BIGINT) AS k, CAST(MAX(n_tokens) AS BIGINT) AS mx,
         CAST(MIN(n_tokens) AS BIGINT) AS mn
  FROM cells
)
SELECT shard, n_docs, n_tokens, share_ppm, imbalance_ppm FROM (
  SELECT 'shard_' || CAST(shard AS VARCHAR) AS shard, n_docs, n_tokens,
         CAST(ROUND(1e6 * n_tokens / tot.tt, 0) AS BIGINT) AS share_ppm,
         CAST(NULL AS BIGINT) AS imbalance_ppm
  FROM cells, tot
  UNION ALL
  SELECT '__TOTAL__', dd, tt, CAST(1000000 AS BIGINT),
         CAST(ROUND(1e6 * (mx - mn) * k / tt, 0) AS BIGINT)
  FROM tot
) ORDER BY shard
""",
    # stride-scheduled virtual-time key, integral div, first 40
    "q281_interleave_order": """
WITH keyed AS (
  SELECT source, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
              AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
  FROM documents
),
vt AS (
  SELECT source, doc_id, r,
         CAST((2 * r - 1) * 1000000000 // n_s AS BIGINT) AS vt_key
  FROM keyed
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY vt_key, source, doc_id) AS BIGINT)
         AS position,
       source, doc_id, r, vt_key
FROM vt
QUALIFY position <= 40
ORDER BY position
""",
    # per-source truncation loss at C=256, exact sums + rounded ppm
    "q283_truncation_loss": """
WITH t AS (
  SELECT source, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS toks
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN toks > 256 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_truncated,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(GREATEST(toks - 256, 0)) AS BIGINT) AS tokens_lost,
       CAST(ROUND(1e6 * SUM(GREATEST(toks - 256, 0)) / SUM(toks), 0)
            AS BIGINT) AS loss_ppm,
       CAST(ROUND(1e6 * SUM(CASE WHEN toks > 256 THEN 1 ELSE 0 END)
                  / COUNT(*), 0) AS BIGINT) AS truncated_ppm
FROM t GROUP BY source ORDER BY source
""",
    # q216's sqrt-e6/ppm weight rule, 30% budget floor-divided exactly,
    # centi-epoch floor
    "q266_epoch_allocation": """
WITH n AS (
  SELECT source, CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_toks
  FROM documents GROUP BY source
),
s AS (
  SELECT source, n_toks,
         CAST(ROUND(1e6 * SQRT(n_toks), 0) AS BIGINT) AS s_e6
  FROM n
),
tot AS (
  SELECT CAST(SUM(s_e6) AS BIGINT) AS ts, CAST(SUM(n_toks) AS BIGINT) AS tn
  FROM s
),
j AS (
  SELECT source, n_toks,
         CAST(ROUND(1e6 * s_e6 / tot.ts, 0) AS BIGINT) AS w_ppm,
         tot.tn AS tn
  FROM s, tot
)
SELECT source, n_toks, w_ppm,
       CAST((tn * 3 * w_ppm) // 10000000 AS BIGINT) AS target_toks,
       CAST(LEAST(n_toks, (tn * 3 * w_ppm) // 10000000) AS BIGINT)
         AS unique_toks,
       CAST(GREATEST(0, (tn * 3 * w_ppm) // 10000000 - n_toks) AS BIGINT)
         AS repeated_toks,
       CAST(((tn * 3 * w_ppm) // 10000000) * 100 // n_toks AS BIGINT)
         AS epochs_x100
FROM j ORDER BY source
""",
    # same rank mapping ceil(r*N/n_s)-1 onto the global order statistic
    "q234_quantile_normalize": """
WITH c AS (
  SELECT c_mktsegment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents, c_custkey
  FROM customer
), ranked AS (
  SELECT c_mktsegment, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
              ORDER BY cents, c_custkey) AS BIGINT) AS r,
         CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS ns
  FROM c
), gidx AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cents, c_custkey) - 1 AS BIGINT)
           AS gt,
         cents AS norm_cents
  FROM c
), n AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM c),
mapped AS (
  SELECT ranked.c_mktsegment, ranked.cents, gidx.norm_cents
  FROM ranked CROSS JOIN n
  JOIN gidx ON gidx.gt = CAST(CEIL(1.0 * ranked.r * n.t / ranked.ns) - 1
                              AS BIGINT)
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(1.0 * SUM(cents) / COUNT(*), 0) AS BIGINT) AS mean_cents,
       CAST(ROUND(1.0 * SUM(norm_cents) / COUNT(*), 0) AS BIGINT)
         AS norm_mean_cents
FROM mapped GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    # same (md5, id) rank-mod folds; spread audit re-derived
    "q230_stratified_kfold": """
WITH folded AS (
  SELECT lang,
         CAST((ROW_NUMBER() OVER (PARTITION BY lang
               ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 5
              AS BIGINT) AS fold
  FROM documents
), per AS (
  SELECT lang, fold, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM folded GROUP BY lang, fold
)
SELECT lang, fold, n_docs,
       CAST(MAX(n_docs) OVER (PARTITION BY lang)
            - MIN(n_docs) OVER (PARTITION BY lang) AS BIGINT)
         AS lang_spread
FROM per ORDER BY lang, fold
""",
    # vocabulary-reduced token-set Jaccard between source pairs
    "q231_source_overlap": """
WITH st AS (
  SELECT DISTINCT source, tok FROM (
    SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
  )
), sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY source
), common AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common,
       CAST(na.n + nb.n - n_common AS BIGINT) AS n_union,
       CAST(ROUND(1e4 * n_common / (na.n + nb.n - n_common), 0) AS BIGINT)
         AS jac_e4
FROM common
JOIN sizes na ON na.source = src_a
JOIN sizes nb ON nb.source = src_b
ORDER BY jac_e4 DESC, src_a, src_b
LIMIT 10
""",
    # same sqrt-e6 weights -> quota -> md5-rank pick within source
    "q222_temperature_mix": """
WITH t AS (
  SELECT doc_id, source, LEN(STRING_SPLIT(text, ' ')) AS n_tok
  FROM documents
), n AS (
  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS n_toks FROM t GROUP BY source
), s AS (
  SELECT source, CAST(ROUND(1e6 * SQRT(n_toks), 0) AS BIGINT) AS s_e6 FROM n
), quotas AS (
  SELECT source,
         CAST(ROUND((SELECT ROUND(COUNT(*) * 0.4, 0) FROM t)
                    * s_e6 / (SELECT SUM(s_e6) FROM s), 0) AS BIGINT)
           AS quota
  FROM s
), picked AS (
  SELECT t.source, q.quota, t.n_tok,
         ROW_NUMBER() OVER (PARTITION BY t.source
                            ORDER BY MD5(CAST(t.doc_id AS VARCHAR)),
                                     t.doc_id) AS rn
  FROM t JOIN quotas q ON t.source = q.source
)
SELECT source, quota, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tok) AS BIGINT) AS toks_kept
FROM picked WHERE rn <= quota
GROUP BY source, quota ORDER BY source
""",
    # same md5 bucket split, 5-gram distinct sets, semi-join leakage
    "q217_split_leakage": (
        "WITH "
        + _LEAK_GRAMS.format(
            label="by_source", bucket=_BUCKET_SQL.format(id="source")
        )
        + ", "
        + _LEAK_GRAMS.format(
            label="by_doc", bucket=_BUCKET_SQL.format(id="doc_id")
        )
        + " SELECT * FROM ("
        + _LEAK_ONE.format(label="by_source")
        + " UNION ALL "
        + _LEAK_ONE.format(label="by_doc")
        + ") ORDER BY strategy"
    ),
    # the definitional next-fit recurrence as a recursive CTE: fill
    # saturates at 512 and resets; oversized docs occupy a bin alone
    # the q209 recurrence replayed at four budgets
    "q258_packing_size_sweep": """
WITH RECURSIVE t AS (
  SELECT source, doc_id, LEN(STRING_SPLIT(text, ' ')) AS n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
),
walk128 AS (
  SELECT source, rn, n, CAST(0 AS BIGINT) AS bin, n AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.n,
         CASE WHEN w.fill + t.n > 128 THEN w.bin + 1 ELSE w.bin END,
         CASE WHEN w.fill + t.n > 128 THEN t.n ELSE w.fill + t.n END
  FROM walk128 w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
),
agg128 AS (
  SELECT CAST(128 AS BIGINT) AS budget,
         CAST(SUM(bins) AS BIGINT) AS n_bins,
         CAST(SUM(toks) AS BIGINT) AS n_tokens,
         CAST(SUM(bins) * 128 AS BIGINT) AS capacity,
         CAST(ROUND(1e4 * (SUM(bins) * 128 - SUM(toks))
                    / (SUM(bins) * 128), 0) AS BIGINT) AS waste_bp
  FROM (SELECT source, MAX(bin) + 1 AS bins, SUM(n) AS toks
        FROM walk128 GROUP BY source)
),
walk256 AS (
  SELECT source, rn, n, CAST(0 AS BIGINT) AS bin, n AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.n,
         CASE WHEN w.fill + t.n > 256 THEN w.bin + 1 ELSE w.bin END,
         CASE WHEN w.fill + t.n > 256 THEN t.n ELSE w.fill + t.n END
  FROM walk256 w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
),
agg256 AS (
  SELECT CAST(256 AS BIGINT) AS budget,
         CAST(SUM(bins) AS BIGINT) AS n_bins,
         CAST(SUM(toks) AS BIGINT) AS n_tokens,
         CAST(SUM(bins) * 256 AS BIGINT) AS capacity,
         CAST(ROUND(1e4 * (SUM(bins) * 256 - SUM(toks))
                    / (SUM(bins) * 256), 0) AS BIGINT) AS waste_bp
  FROM (SELECT source, MAX(bin) + 1 AS bins, SUM(n) AS toks
        FROM walk256 GROUP BY source)
),
walk512 AS (
  SELECT source, rn, n, CAST(0 AS BIGINT) AS bin, n AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.n,
         CASE WHEN w.fill + t.n > 512 THEN w.bin + 1 ELSE w.bin END,
         CASE WHEN w.fill + t.n > 512 THEN t.n ELSE w.fill + t.n END
  FROM walk512 w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
),
agg512 AS (
  SELECT CAST(512 AS BIGINT) AS budget,
         CAST(SUM(bins) AS BIGINT) AS n_bins,
         CAST(SUM(toks) AS BIGINT) AS n_tokens,
         CAST(SUM(bins) * 512 AS BIGINT) AS capacity,
         CAST(ROUND(1e4 * (SUM(bins) * 512 - SUM(toks))
                    / (SUM(bins) * 512), 0) AS BIGINT) AS waste_bp
  FROM (SELECT source, MAX(bin) + 1 AS bins, SUM(n) AS toks
        FROM walk512 GROUP BY source)
),
walk1024 AS (
  SELECT source, rn, n, CAST(0 AS BIGINT) AS bin, n AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.n,
         CASE WHEN w.fill + t.n > 1024 THEN w.bin + 1 ELSE w.bin END,
         CASE WHEN w.fill + t.n > 1024 THEN t.n ELSE w.fill + t.n END
  FROM walk1024 w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
),
agg1024 AS (
  SELECT CAST(1024 AS BIGINT) AS budget,
         CAST(SUM(bins) AS BIGINT) AS n_bins,
         CAST(SUM(toks) AS BIGINT) AS n_tokens,
         CAST(SUM(bins) * 1024 AS BIGINT) AS capacity,
         CAST(ROUND(1e4 * (SUM(bins) * 1024 - SUM(toks))
                    / (SUM(bins) * 1024), 0) AS BIGINT) AS waste_bp
  FROM (SELECT source, MAX(bin) + 1 AS bins, SUM(n) AS toks
        FROM walk1024 GROUP BY source)
)
SELECT * FROM (
  SELECT * FROM agg128 UNION ALL SELECT * FROM agg256
  UNION ALL SELECT * FROM agg512 UNION ALL SELECT * FROM agg1024
) ORDER BY budget
""",
    "q209_pack_bins": """
WITH RECURSIVE t AS (
  SELECT source, doc_id, LEN(STRING_SPLIT(text, ' ')) AS n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT source, rn, n, CAST(0 AS BIGINT) AS bin, n AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.n,
         CASE WHEN w.fill + t.n > 512 THEN w.bin + 1 ELSE w.bin END,
         CASE WHEN w.fill + t.n > 512 THEN t.n ELSE w.fill + t.n END
  FROM walk w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
       CAST(ROUND(1e4 * SUM(n) / ((MAX(bin) + 1) * 512), 0) AS BIGINT)
         AS util_bp
FROM walk GROUP BY source ORDER BY source
""",
    # sqrt to integer micro-units FIRST so the cross-source sum is exact
    "q216_temperature_weights": """
WITH n AS (
  SELECT source, CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_toks
  FROM documents GROUP BY source
), s AS (
  SELECT source, n_toks,
         CAST(ROUND(1e6 * SQRT(n_toks), 0) AS BIGINT) AS s_e6
  FROM n
)
SELECT source, n_toks, s_e6,
       CAST(ROUND(1e6 * s_e6 / (SELECT SUM(s_e6) FROM s), 0) AS BIGINT)
         AS w_ppm
FROM s ORDER BY source
""",
    # same md5-bucket arm assignment, chi-square numerator vs 16*(n_a+n_b)
    "q206_srm_check": """
WITH b AS (
  SELECT event_type,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 7))
              AS BIGINT) % 2 AS arm
  FROM events
), c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM b GROUP BY event_type
)
SELECT event_type, n_a, n_b,
       CAST((n_a - n_b) * (n_a - n_b) AS BIGINT) AS srm_num,
       (n_a - n_b) * (n_a - n_b) > 16 * (n_a + n_b) AS srm_alarm
FROM c ORDER BY event_type
""",
    # same integer-fraction contract; bigrams via the positional-lambda
    # pattern (q189/q193), unigrams via a plain unnest
    "q203_pmi_collocations": """
WITH toks AS (
  SELECT STRING_SPLIT(text, ' ') AS t FROM documents
), uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT UNNEST(t) AS w FROM toks) GROUP BY w
), n AS (SELECT SUM(c) AS n FROM uni),
bg AS (
  SELECT t[i] AS w1, t[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM toks, UNNEST(GENERATE_SERIES(1, GREATEST(LEN(t) - 1, 0))) s(i)
  GROUP BY 1, 2 HAVING COUNT(*) >= 5
)
SELECT bg.w1, bg.w2, bg.c_xy, ux.c AS c_x, uy.c AS c_y,
       CAST(bg.c_xy * n.n AS BIGINT) AS lift_num,
       CAST(ux.c * uy.c AS BIGINT) AS lift_den
FROM bg
JOIN uni ux ON ux.w = bg.w1
JOIN uni uy ON uy.w = bg.w2
CROSS JOIN n
ORDER BY w1, w2
""",
    # ranks re-derived with the window form (small-data plan); identical
    # md5 draw arithmetic => identical pair membership
    "q196_negative_pairs": """
WITH idx AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS rank
  FROM documents
), n AS (SELECT COUNT(*) AS n FROM documents),
draws AS (
  SELECT i.doc_id AS anchor_doc_id, i.rank, d.draw,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(i.rank AS VARCHAR) || ':'
              || CAST(d.draw AS VARCHAR)), 1, 7)) AS BIGINT)
           % (n.n - 1) AS j0
  FROM idx i
  CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS draw) d
  CROSS JOIN n
)
SELECT dr.anchor_doc_id, CAST(dr.draw AS INT) AS draw, x.doc_id AS neg_doc_id
FROM draws dr
JOIN idx x ON x.rank = CASE WHEN dr.j0 >= dr.rank THEN dr.j0 + 1 ELSE dr.j0 END
ORDER BY anchor_doc_id, draw
""",
    "q186_group_split": f"""
WITH b AS (
  SELECT source, n_chars, {_BUCKET_SQL.format(id="source")} AS bucket
  FROM documents
), s AS (
  SELECT source, n_chars,
         CASE WHEN bucket < 10 THEN 'test'
              WHEN bucket < 90 THEN 'train'
              ELSE 'val' END AS split
  FROM b
)
SELECT split, COUNT(DISTINCT source) AS n_sources,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM s GROUP BY split
UNION ALL
SELECT 'zz_leaked_sources',
       (SELECT COUNT(*) FROM
         (SELECT source FROM s GROUP BY source
          HAVING COUNT(DISTINCT split) > 1)),
       0, 0
ORDER BY split
""",
    "q74_deterministic_sample": f"""
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {_BUCKET_SQL.format(id="doc_id")} < 20
GROUP BY lang
ORDER BY lang
""",
    "q75_hash_split": f"""
WITH b AS (
  SELECT label, {_BUCKET_SQL.format(id="vec_id")} AS bucket FROM embeddings
)
-- ranges follow hash_split's sorted-name layout: test [0,10), train
-- [10,90), val [90,100)
SELECT CASE WHEN bucket < 10 THEN 'test'
            WHEN bucket < 90 THEN 'train'
            ELSE 'val' END AS split,
       COUNT(*) AS n, COUNT(DISTINCT label) AS n_labels,
       CAST(SUM(label) AS BIGINT) AS sum_label
FROM b
GROUP BY 1
ORDER BY split
""",
    "q76_cap_per_source": """
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM ranked
WHERE rn <= 50
GROUP BY source
ORDER BY source
""",
    "q83_stratified_sample": f"""
WITH b AS (
  SELECT lang, n_chars, {_BUCKET_SQL.format(id="doc_id")} AS bucket
  FROM documents
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 50
                         WHEN 'es' THEN 25 ELSE 10 END
GROUP BY lang
ORDER BY lang
""",
    "q85_pack_sequences": """
WITH t AS (
  SELECT source, doc_id, LEN(STRING_SPLIT(text, ' ')) AS n_tokens
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) AS endpos
  FROM t
)
SELECT source, doc_id, n_tokens,
       CAST(FLOOR((endpos - n_tokens) / 512.0) AS BIGINT) AS first_seq,
       CAST(FLOOR((endpos - 1) / 512.0) AS BIGINT) AS last_seq
FROM c
ORDER BY source, doc_id
""",
    "q80_corpus_pipeline": f"""
WITH deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY MD5(text) ORDER BY doc_id) AS rn
    FROM documents
  ) WHERE rn = 1
),
sampled AS (
  SELECT * FROM deduped
  WHERE n_chars BETWEEN 100 AND 2000
    AND {_BUCKET_SQL.format(id="doc_id")} < 50
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM sampled
GROUP BY lang
ORDER BY lang
""",
}
