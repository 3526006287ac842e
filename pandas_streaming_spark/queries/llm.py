"""Q38–Q42 + LLM-training-data-pipeline extras (SURVEY.md §2.9):
exact/MinHash/SimHash/Jaccard dedup, similarity search (brute-force +
LSH-bucketed ANN), text analysis (lang-ID, quality, tokens, winnowing
fingerprints), multimodal decode plumbing.

Every operator here is graded against a full duckdb SQL oracle — possible
because all hashing is md5-hex (identical across engines) and all float
folds follow the functions/ double-promotion pattern. Similarities and
ratios are reported as integers (basis points) to dodge the decimal-repr
rounding divergence documented in analytic.q24.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.operators.dedup import (
    connected_components,
    lsh_audit,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_audit,
    simhash_fingerprints,
)
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
from pandas_streaming_spark.operators.text import (
    LANG_MARKERS,
    chunk_documents,
    contamination_check,
    language_id,
    quality_score,
    redact_terms,
    repetition_score,
    tf_idf,
    token_stats,
    winnow_fingerprints,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Graded core: Q38–Q42
# ---------------------------------------------------------------------------


def q38_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.rollup("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_distinct"),
        )
        .select(
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "n_distinct",
            (F.col("n_docs") - F.col("n_distinct")).alias("n_dups"),
        )
        .orderBy("lang")
    )


def q39_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=20)


def q40_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(25)
    )


def q41_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            # integer centi-chars: exact int sum, one division, integer round
            F.round(F.sum("n_chars") * 100.0 / F.count("*"), 0)
            .cast("long")
            .alias("avg_chars_e2"),
            F.round(F.sum(F.length("text")) * 100.0 / F.count("*"), 0)
            .cast("long")
            .alias("avg_len_e2"),
        )
        .orderBy("lang")
    )


def q42_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = similarity_join(_t(spark, sf_dir, "embeddings"), threshold=0.35, block_col="label")
    return (
        pairs.groupBy("label").agg(F.count("*").alias("n_pairs")).orderBy("label")
    )


# ---------------------------------------------------------------------------
# Dedup extras
# ---------------------------------------------------------------------------


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


def q114_source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: doc count, exact-text dup count
    (md5 identity), dominant language + its share in basis points, mean
    length. One grouped aggregate over the corpus plus one tiny
    (source, lang) count table — integer/bp outputs keep it
    hash-gradable (the q39 basis-points policy)."""
    docs = _t(spark, sf_dir, "documents")
    base = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - F.countDistinct(F.md5("text")))
        .cast("long")
        .alias("n_dup_texts"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )
    lang_counts = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_lang")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_lang").desc(), F.col("lang")
    )
    top = (
        lang_counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "n_lang")
    )
    return (
        base.join(top, "source")
        .select(
            "source",
            "n_docs",
            "n_dup_texts",
            "avg_chars",
            "top_lang",
            F.round(F.lit(10000.0) * F.col("n_lang") / F.col("n_docs"), 0)
            .cast("long")
            .alias("top_lang_bp"),
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


def q52_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), k=3, threshold=0.0)
    jac_e4 = F.round(
        F.lit(10000.0) * F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        0,
    ).cast("long")
    return (
        pairs.select("id_a", "id_b", jac_e4.alias("jac_e4"))
        .orderBy(F.col("jac_e4").desc(), "id_a", "id_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Text-analysis extras
# ---------------------------------------------------------------------------


def q53_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = language_id(_t(spark, sf_dir, "documents"))
    return (
        d.groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "pred_lang")
    )


def q54_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = quality_score(_t(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "avg_tok_len_e4",
            "stop_ratio_e4",
            "quality_e4",
        )
        .orderBy("doc_id")
        .limit(100)
    )


def q55_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = token_stats(_t(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.col("ws_tokens").cast("long").alias("ws_tokens"),
            F.col("word_tokens").cast("long").alias("word_tokens"),
            F.col("num_tokens").cast("long").alias("num_tokens"),
            F.col("other_chars").cast("long").alias("other_chars"),
        )
        .orderBy("doc_id")
        .limit(100)
    )


def q56_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(_t(spark, sf_dir, "documents"), k=3, window=4).orderBy(
        "doc_id"
    )


def q81_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by smoothed TF-IDF (operators.text.tf_idf)."""
    return tf_idf(_t(spark, sf_dir, "documents"), top_n=3).orderBy("doc_id", "rn")


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


def q89_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-3-gram fraction per doc (operators.text.repetition_score):
    the degenerate/boilerplate-text curation gate."""
    return repetition_score(_t(spark, sf_dir, "documents")).orderBy("doc_id")


def q90_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators.text.contamination_check):
    per-doc fraction of distinct 5-grams shared with a pseudo-benchmark
    set (docs with doc_id % 97 == 0)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_check(docs, bench, k=5).orderBy("doc_id")


def q91_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step (operators.similarity.assign_to_centroids): nearest
    per-label centroid by cosine, centroids in exact fixed point."""
    return assign_to_centroids(_t(spark, sf_dir, "embeddings")).orderBy("vec_id")


def q92_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (operators.similarity.ivf_topk): probe the 2 centroids
    nearest vec_id=0's vector, exact top-10 within the probed cells."""
    return ivf_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_probe=2)


def q84_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (operators.text.chunk_documents):
    40-token chunks, 8-token overlap; first 1000 (doc, chunk) rows."""
    return (
        chunk_documents(
            _t(spark, sf_dir, "documents"), chunk_tokens=40, overlap=8
        )
        .orderBy("doc_id", "chunk_idx")
        .limit(1000)
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


def q93_redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style denylist scrub (operators.text.redact_terms): match
    count, post-redaction length, and content hash of the scrubbed text
    per document."""
    return redact_terms(_t(spark, sf_dir, "documents"), REDACT_PATTERN).orderBy(
        "doc_id"
    )


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


def q100_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators.text.cdc_chunks): Rabin-style
    token-gram boundaries (md5 mod 8), per-chunk token count + dedup
    hash; first 2000 (doc, chunk) rows."""
    from pandas_streaming_spark.operators.text import cdc_chunks

    return (
        cdc_chunks(_t(spark, sf_dir, "documents"), k=3, divisor=8)
        .orderBy("doc_id", "chunk_idx")
        .limit(2000)
    )


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


def q106_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling audit of the orders table: per column, null count,
    exact distinct count, and min/max rendered as strings — the
    schema-health report a pipeline emits before training. One pass of
    map-side-combined aggregates per column family (Catalyst fuses them
    into a single scan); the unpivot is a literal-array explode."""
    o = _t(spark, sf_dir, "orders")
    # int/string/date columns only: double→string rendering is engine-
    # specific (shortest-repr vs binary), so floats are profiled via the
    # ROUND(x, 2) aggregates of q01/q73 instead
    cols = ["o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderdate", "o_orderpriority"]
    def render(c, agg):
        # aggregate in the column's own type, THEN render — casting
        # first would make min/max lexicographic on numerics; date-ish
        # columns render at DATE granularity (catalog loads them as µs
        # timestamps, duckdb as DATE)
        out = agg(F.col(c))
        if c == "o_orderdate":
            out = out.cast("date")
        return out.cast("string")

    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__n_{c}"),
            F.countDistinct(c).alias(f"__d_{c}"),
            render(c, F.min).alias(f"__mn_{c}"),
            render(c, F.max).alias(f"__mx_{c}"),
        ]
    wide = o.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__n_{c}").alias("n_nulls"),
                F.col(f"__d_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_str"),
                F.col(f"__mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return (
        wide.select(F.explode(rows).alias("r"))
        .select("r.column", "r.n_nulls", "r.n_distinct", "r.min_str", "r.max_str")
        .orderBy("column")
    )


def q102_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the corpus tables — the
    data-quality gate a pipeline runs before training: documents without
    an embedding row (by id), embeddings without a document, and
    duplicate-id checks, as one summary table. Anti-joins compile to
    broadcast/shuffled hash joins with no row materialization beyond
    the counts."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    embs = _t(spark, sf_dir, "embeddings").select("vec_id")
    # counts-as-plan: one DataFrame of unioned aggregates, not
    # driver-side .count() actions
    d_orphans = (
        docs.join(embs, docs.doc_id == embs.vec_id, "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("docs_without_embedding").alias("check"), "n")
    )
    e_orphans = (
        embs.join(docs, embs.vec_id == docs.doc_id, "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("embeddings_without_doc").alias("check"), "n")
    )
    dup_docs = (
        docs.groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("n"))
        .select(F.lit("duplicate_doc_ids").alias("check"), "n")
    )
    dup_embs = (
        embs.groupBy("vec_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count("*").alias("n"))
        .select(F.lit("duplicate_vec_ids").alias("check"), "n")
    )
    return d_orphans.unionByName(e_orphans).unionByName(dup_docs).unionByName(
        dup_embs
    ).orderBy("check")


def q103_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram of the corpus in power-of-two buckets —
    the sequence-length accounting that sizes packing budgets (q85) and
    truncation losses. Pure map + one small groupBy."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    bucket = F.pow(F.lit(2.0), F.ceil(F.log2(n_tok.cast("double")))).cast("long")
    return (
        docs.select(
            F.when(n_tok <= 1, F.lit(1)).otherwise(bucket).alias("len_bucket")
        )
        .groupBy("len_bucket")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("len_bucket")
    )


def q97_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup keep-best: per duplicate cluster (q82's LSH→connected-
    components graph) select the canonical document — longest n_chars,
    ties to the lowest doc_id — and report cluster size + drop count.
    The standard 'which duplicate survives' decision of a corpus dedup
    pass; one window over the (tiny) per-cluster membership after the
    heavy lifting is done by the bucketed-LSH + log-depth-CC pipeline."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, n_hashes=8, bands=4, k=3, max_bucket=64)
    cc = connected_components(docs, pairs)  # (doc_id, component)
    scored = cc.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.count("*").alias("n_docs"),
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("canonical_doc_id"),
            F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias("canonical_chars"),
            (F.count("*") - 1).cast("long").alias("n_dropped"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Similarity / multimodal extras
# ---------------------------------------------------------------------------


def q57_ann_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ann_bucketed_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10, n_bits=8)


def q58_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(_t(spark, sf_dir, "documents"))
    return decode_images(media).orderBy("doc_id").limit(100)


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
    before r4 — every doc identical in the tail)."""
    return simhash_audit(
        _t(spark, sf_dir, "documents"),
        threshold=0.5, max_hamming=6, n_bits=64, k=3,
    )


def q59_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = similarity_join(_t(spark, sf_dir, "embeddings"), threshold=0.35, block_col="label")
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("id_b").alias("n_dup_docs"),
    )


QUERIES = {
    "q38_exact_dedup": q38_exact_dedup,
    "q39_similarity_topk": q39_similarity_topk,
    "q40_top_tokens": q40_top_tokens,
    "q41_text_stats": q41_text_stats,
    "q42_similarity_join": q42_similarity_join,
    "q49_minhash_signatures": q49_minhash_signatures,
    "q50_lsh_candidate_pairs": q50_lsh_candidate_pairs,
    "q51_simhash": q51_simhash,
    "q52_ngram_jaccard": q52_ngram_jaccard,
    "q53_language_id": q53_language_id,
    "q54_quality_score": q54_quality_score,
    "q55_token_stats": q55_token_stats,
    "q56_winnow_fingerprints": q56_winnow_fingerprints,
    "q81_tfidf": q81_tfidf,
    "q82_dedup_clusters": q82_dedup_clusters,
    "q84_chunk_documents": q84_chunk_documents,
    "q86_knn_join": q86_knn_join,
    "q87_label_centroid": q87_label_centroid,
    "q89_repetition_score": q89_repetition_score,
    "q90_contamination": q90_contamination,
    "q91_centroid_assign": q91_centroid_assign,
    "q92_ivf_topk": q92_ivf_topk,
    "q93_redact_terms": q93_redact_terms,
    "q95_quantize_int8": q95_quantize_int8,
    "q96_kmeans_step": q96_kmeans_step,
    "q97_canonical_docs": q97_canonical_docs,
    "q99_normalize_matryoshka": q99_normalize_matryoshka,
    "q100_cdc_chunks": q100_cdc_chunks,
    "q102_integrity_audit": q102_integrity_audit,
    "q103_length_histogram": q103_length_histogram,
    "q104_chunk_dedup_pipeline": q104_chunk_dedup_pipeline,
    "q106_column_profile": q106_column_profile,
    "q57_ann_bucketed": q57_ann_bucketed,
    "q58_multimodal_decode": q58_multimodal_decode,
    "q79_frame_sample": q79_frame_sample,
    "q59_embedding_neardup": q59_embedding_neardup,
    "q108_ann_recall": q108_ann_recall,
    "q109_lsh_audit": q109_lsh_audit,
    "q110_simhash_audit": q110_simhash_audit,
    "q113_incremental_dedup": q113_incremental_dedup,
    "q114_source_reputation": q114_source_reputation,
    "q127_fuzzy_pairs": q127_fuzzy_pairs,
}


# ---------------------------------------------------------------------------
# duckdb oracle SQL (generated where repetitive)
# ---------------------------------------------------------------------------


def _cos(a: str, b: str) -> str:
    """Cosine SQL mirroring functions.vec_cosine bit-for-bit: index-order
    double fold for dot and norms, NULLIF-guarded denominator."""
    def dot(x: str, y: str) -> str:
        return (
            f"LIST_AGGREGATE(LIST_TRANSFORM(GENERATE_SERIES(1, LEN({x})), "
            f"i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)), 'sum')"
        )

    return (
        f"({dot(a, b)} / NULLIF(SQRT({dot(a, a)}) * SQRT({dot(b, b)}), 0.0))"
    )


_TOKS = "SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents"

_SHINGLES = f"""
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 2, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM ({_TOKS})
"""

_SHINGLES5 = f"""
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 4, 0)),
                i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                     || t[i+3] || ' ' || t[i+4])) AS sh
  FROM ({_TOKS})
"""

# One md5 per shingle, Kirsch–Mitzenmacher h1 + s*h2 over two 28-bit
# digest halves — the exact arithmetic operators/dedup.minhash_signatures
# runs, so integer minima hash-match.
_MINHASH_SIG = f"""
  SELECT doc_id, s,
         MIN(CAST(CONCAT('0x', SUBSTR(MD5(sh), 1, 7)) AS BIGINT)
             + s * CAST(CONCAT('0x', SUBSTR(MD5(sh), 8, 7)) AS BIGINT)) AS mh
  FROM ({_SHINGLES}) CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS s)
  GROUP BY doc_id, s
"""

_SIMHASH_BITS = ",\n       ".join(
    "CASE WHEN SUM(CASE WHEN SUBSTR(h, {p}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) > 0 "
    "THEN '1' ELSE '0' END AS b{j}".format(p=j + 1, j=j)
    for j in range(16)
)

# 64-bit block-seeded variant (q110): bit j reads char j%32+1 of the
# block j//32 digest — h0 = MD5(tok), h1 = MD5(tok || '|1'), mirroring
# simhash_fingerprints' concat_ws seed
_SIMHASH64_BITS = ",\n       ".join(
    "CASE WHEN SUM(CASE WHEN SUBSTR(h{b}, {p}, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) > 0 "
    "THEN '1' ELSE '0' END AS b{j}".format(b=j // 32, p=j % 32 + 1, j=j)
    for j in range(64)
)
_SIMHASH64_CONCAT = " || ".join(f"b{j}" for j in range(64))
_HAMMING64 = " + ".join(
    f"CASE WHEN SUBSTR(a.sh, {j + 1}, 1) <> SUBSTR(b.sh, {j + 1}, 1) "
    "THEN 1 ELSE 0 END"
    for j in range(64)
)

_MARKER_SQL = {
    lang: "[" + ", ".join(f"'{w}'" for w in words) + "]"
    for lang, words in LANG_MARKERS.items()
}
_HITS = ",\n       ".join(
    f"LEN(LIST_FILTER(LIST_DISTINCT(t), x -> LIST_CONTAINS({_MARKER_SQL[lang]}, x))) AS h_{lang}"
    for lang in sorted(LANG_MARKERS)
)
_PRED = """CASE
  WHEN h_zh >= GREATEST(h_de, h_en, h_es, h_fr) THEN 'zh'
  WHEN h_fr >= GREATEST(h_de, h_en, h_es) THEN 'fr'
  WHEN h_es >= GREATEST(h_de, h_en) THEN 'es'
  WHEN h_en >= h_de THEN 'en'
  ELSE 'de' END"""

_BUCKET = " || ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 9)
)

_BUCKET2 = " || ".join(
    f"CASE WHEN embedding[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(1, 3)
)

_HEXPOS = "STRPOS('0123456789abcdef', SUBSTR(MD5(text), {p}, 1)) - 1"

ORACLES = {
    "q38_exact_dedup": """
SELECT COALESCE(lang, 'ALL') AS lang, COUNT(*) AS n_docs,
       COUNT(DISTINCT MD5(text)) AS n_distinct,
       COUNT(*) - COUNT(DISTINCT MD5(text)) AS n_dups
FROM documents
GROUP BY ROLLUP (lang)
ORDER BY lang
""",
    "q39_similarity_topk": f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       CAST(ROUND(10000.0 * {_cos('e.embedding', 'q.qe')}, 0) AS BIGINT) AS sim_e4
FROM embeddings e, q
ORDER BY sim_e4 DESC, vec_id
LIMIT 20
""",
    "q40_top_tokens": """
SELECT token, COUNT(*) AS cnt
FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT 25
""",
    "q41_text_stats": """
SELECT lang, COUNT(*) AS n_docs,
       CAST(ROUND(SUM(n_chars) * 100.0 / COUNT(*), 0) AS BIGINT) AS avg_chars_e2,
       CAST(ROUND(SUM(LENGTH(text)) * 100.0 / COUNT(*), 0) AS BIGINT) AS avg_len_e2
FROM documents
GROUP BY lang
ORDER BY lang
""",
    "q42_similarity_join": f"""
SELECT a.label, COUNT(*) AS n_pairs
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos('a.embedding', 'b.embedding')} >= 0.35
GROUP BY a.label
ORDER BY a.label
""",
    "q49_minhash_signatures": f"""
SELECT doc_id, STRING_AGG(mh, '|' ORDER BY s) AS sig
FROM ({_MINHASH_SIG})
GROUP BY doc_id
ORDER BY doc_id
LIMIT 100
""",
    "q50_lsh_candidate_pairs": f"""
WITH bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (  -- mirror max_bucket=64: oversized buckets are dropped, not paired
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a
JOIN ok ON ok.band = a.band AND ok.bh = a.bh
JOIN bands b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
    "q82_dedup_clusters": f"""
WITH RECURSIVE bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (  -- mirror max_bucket=64 in dedup_clusters' pair source
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.node
),
cc AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node)
SELECT component, COUNT(*) AS n_docs
FROM cc GROUP BY component
HAVING COUNT(*) >= 2
ORDER BY component
""",
    "q84_chunk_documents": """
WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
s AS (
  SELECT doc_id, t, UNNEST(GENERATE_SERIES(0, LEN(t) - 1, 32)) AS start
  FROM t WHERE LEN(t) > 0
)
SELECT doc_id,
       start // 32 AS chunk_idx,
       start AS chunk_start,
       LEN(t[start + 1 : start + 40]) AS n_chunk_tokens,
       MD5(ARRAY_TO_STRING(t[start + 1 : start + 40], ' ')) AS chunk_hash
FROM s
ORDER BY doc_id, chunk_idx
LIMIT 1000
""",
    "q86_knn_join": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         CAST(ROUND(10000.0 * {_cos("e.embedding", "q.qv")}, 0) AS BIGINT) AS sim_e4
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
r AS (
  SELECT query_id, neighbor_id, sim_e4,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim_e4 DESC, neighbor_id) AS rnk
  FROM s
)
SELECT query_id, neighbor_id, sim_e4, rnk
FROM r WHERE rnk <= 3
ORDER BY query_id, rnk
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
    "q89_repetition_score": f"""
WITH g AS (
  SELECT doc_id, COUNT(*) AS n_grams, COUNT(DISTINCT sh) AS n_distinct
  FROM ({_SHINGLES})
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(g.n_grams, 0) AS n_grams,
       COALESCE(g.n_distinct, 0) AS n_distinct,
       COALESCE(CAST(ROUND(10000.0 * CAST(g.n_grams - g.n_distinct AS DOUBLE)
                           / g.n_grams, 0) AS BIGINT), 0) AS rep_e4
FROM documents d LEFT JOIN g USING (doc_id)
ORDER BY d.doc_id
""",
    "q90_contamination": f"""
WITH dg AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES5})),
bg AS (SELECT DISTINCT sh FROM ({_SHINGLES5}) WHERE doc_id % 97 = 0),
j AS (
  SELECT dg.doc_id, CASE WHEN bg.sh IS NULL THEN 0 ELSE 1 END AS hit
  FROM dg LEFT JOIN bg ON dg.sh = bg.sh
)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(SUM(hit) AS BIGINT) AS n_matched,
       CAST(ROUND(10000.0 * CAST(SUM(hit) AS DOUBLE) / COUNT(*), 0) AS BIGINT)
         AS contam_e4
FROM j GROUP BY doc_id ORDER BY doc_id
""",
    "q91_centroid_assign": f"""
WITH comps AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
cent AS (
  SELECT label AS c_label,
         LIST(CAST(centroid_e6 AS DOUBLE) / 1000000.0 ORDER BY dim) AS cvec
  FROM (
    SELECT label, dim,
           CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS centroid_e6
    FROM comps GROUP BY label, dim
  ) GROUP BY label
),
sims AS (
  SELECT e.vec_id, e.label, c.c_label,
         {_cos("e.embedding", "c.cvec")} AS sim
  FROM embeddings e CROSS JOIN cent c
),
r AS (
  SELECT vec_id, label, c_label, sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC NULLS LAST, c_label) AS rn
  FROM sims
)
SELECT vec_id, label, c_label AS assigned_label,
       CAST(ROUND(10000.0 * sim, 0) AS BIGINT) AS sim_e4
FROM r WHERE rn = 1
ORDER BY vec_id
""",
    "q92_ivf_topk": f"""
WITH comps AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
cent AS (
  SELECT label AS c_label,
         LIST(CAST(centroid_e6 AS DOUBLE) / 1000000.0 ORDER BY dim) AS cvec
  FROM (
    SELECT label, dim,
           CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS centroid_e6
    FROM comps GROUP BY label, dim
  ) GROUP BY label
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probes AS (
  SELECT c.c_label
  FROM cent c CROSS JOIN q
  ORDER BY {_cos("c.cvec", "q.qv")} DESC NULLS LAST, c.c_label
  LIMIT 2
),
sims AS (
  SELECT e.vec_id, c.c_label, {_cos("e.embedding", "c.cvec")} AS sim
  FROM embeddings e CROSS JOIN cent c
),
r AS (
  SELECT vec_id, c_label,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC NULLS LAST, c_label) AS rn
  FROM sims
),
assigned AS (SELECT vec_id, c_label FROM r WHERE rn = 1),
cand AS (
  SELECT vec_id FROM assigned
  WHERE c_label IN (SELECT c_label FROM probes)
)
SELECT e.vec_id,
       CAST(ROUND(10000.0 * {_cos("e.embedding", "q.qv")}, 0) AS BIGINT) AS sim_e4
FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
ORDER BY sim_e4 DESC, e.vec_id
LIMIT 10
""",
    "q51_simhash": f"""
WITH tok AS (
  SELECT doc_id, MD5(tok) AS h
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents)
),
bits AS (
  SELECT doc_id,
       {_SIMHASH_BITS}
  FROM tok GROUP BY doc_id
)
SELECT doc_id, {" || ".join(f"b{j}" for j in range(16))} AS simhash
FROM bits
ORDER BY doc_id
LIMIT 100
""",
    "q52_ngram_jaccard": f"""
WITH sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
ORDER BY jac_e4 DESC, id_a, id_b
LIMIT 20
""",
    "q53_language_id": f"""
WITH scored AS (
  SELECT lang,
       {_HITS}
  FROM (SELECT lang, STRING_SPLIT(text, ' ') AS t FROM documents)
)
SELECT lang, {_PRED} AS pred_lang, COUNT(*) AS n
FROM scored
GROUP BY lang, pred_lang
ORDER BY lang, pred_lang
""",
    "q54_quality_score": """
WITH g AS (
  SELECT doc_id, LENGTH(text) AS n_chars, LEN(STRING_SPLIT(text, ' ')) AS n_tok,
         LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
             x -> LIST_CONTAINS(['the','a','of','and','to','in'], x))) AS n_stop
  FROM documents
),
h AS (
  SELECT doc_id, n_tok,
         (n_chars - (n_tok - 1)) / CAST(n_tok AS DOUBLE) AS atl,
         n_stop / CAST(n_tok AS DOUBLE) AS sr
  FROM g
)
SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       CAST(ROUND(10000.0 * atl, 0) AS BIGINT) AS avg_tok_len_e4,
       CAST(ROUND(10000.0 * sr, 0) AS BIGINT) AS stop_ratio_e4,
       CAST(ROUND(10000.0 * (LEAST(n_tok / 50.0, 1.0) * 0.5 + sr * 0.3
             + LEAST(atl / 8.0, 1.0) * 0.2), 0) AS BIGINT) AS quality_e4
FROM h
ORDER BY doc_id
LIMIT 100
""",
    "q55_token_stats": """
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+')) AS BIGINT) AS word_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[0-9]+')) AS BIGINT) AS num_tokens,
       CAST(LENGTH(REGEXP_REPLACE(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS other_chars
FROM documents
ORDER BY doc_id
LIMIT 100
""",
    "q56_winnow_fingerprints": f"""
WITH sh AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(t) - 2, 0)),
                i -> struct_pack(pos := i,
                     h := MD5(t[i] || ' ' || t[i+1] || ' ' || t[i+2])))) AS u
  FROM ({_TOKS})
),
fp AS (
  SELECT doc_id,
         MIN(u.h) OVER (PARTITION BY doc_id ORDER BY u.pos
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
  FROM sh
)
SELECT doc_id, COUNT(DISTINCT fp) AS n_fingerprints
FROM fp
GROUP BY doc_id
ORDER BY doc_id
""",
    "q81_tfidf": """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
),
dfreq AS (
  SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.doc_freq,
         tf.tf * (LN((n.n_docs + 1.0) / (dfreq.doc_freq + 1.0)) + 1.0) AS s
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, tf, doc_freq,
         CAST(ROUND(1e6 * s, 0) AS BIGINT) AS tfidf_e6,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tf, doc_freq, tfidf_e6, rn
FROM ranked WHERE rn <= 3
ORDER BY doc_id, rn
""",
    "q57_ann_bucketed": f"""
WITH b AS (
  SELECT vec_id, embedding, {_BUCKET} AS bucket FROM embeddings
),
q AS (SELECT embedding AS qe, bucket AS qb FROM b WHERE vec_id = 0)
SELECT b.vec_id,
       CAST(ROUND(10000.0 * {_cos('b.embedding', 'q.qe')}, 0) AS BIGINT) AS sim_e4
FROM b, q
WHERE b.bucket = q.qb
ORDER BY sim_e4 DESC, vec_id
LIMIT 10
""",
    "q109_lsh_audit": f"""
WITH bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (  -- mirror max_bucket=64
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sh2 AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
truth AS (
  SELECT j.id_a, j.id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
    FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  ) j
  JOIN sizes na ON na.doc_id = j.id_a
  JOIN sizes nb ON nb.doc_id = j.id_b
  WHERE 1.0 * j.c / (na.n + nb.n - j.c) >= 0.5
),
h AS (SELECT COUNT(*) AS n_hits
      FROM cand JOIN truth ON cand.id_a = truth.id_a AND cand.id_b = truth.id_b),
c AS (SELECT COUNT(*) AS n_candidates FROM cand),
t AS (SELECT COUNT(*) AS n_truth FROM truth)
SELECT c.n_candidates, t.n_truth, h.n_hits,
       CASE WHEN c.n_candidates > 0
            THEN CAST(ROUND(10000.0 * h.n_hits / c.n_candidates, 0) AS BIGINT)
       END AS precision_e4,
       CASE WHEN t.n_truth > 0
            THEN CAST(ROUND(10000.0 * h.n_hits / t.n_truth, 0) AS BIGINT)
       END AS recall_e4
FROM c, t, h
""",
    "q110_simhash_audit": f"""
WITH tok AS (
  SELECT doc_id, MD5(t) AS h0, MD5(t || '|1') AS h1
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents)
),
fp AS (
  SELECT doc_id, {_SIMHASH64_CONCAT} AS sh FROM (
    SELECT doc_id,
       {_SIMHASH64_BITS}
    FROM tok GROUP BY doc_id
  )
),
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  WHERE ({_HAMMING64}) <= 6
),
sh2 AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh2 GROUP BY doc_id),
truth AS (
  SELECT j.id_a, j.id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
    FROM sh2 a JOIN sh2 b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
  ) j
  JOIN sizes na ON na.doc_id = j.id_a
  JOIN sizes nb ON nb.doc_id = j.id_b
  WHERE 1.0 * j.c / (na.n + nb.n - j.c) >= 0.5
),
h AS (SELECT COUNT(*) AS n_hits
      FROM cand JOIN truth ON cand.id_a = truth.id_a AND cand.id_b = truth.id_b),
c AS (SELECT COUNT(*) AS n_candidates FROM cand),
t AS (SELECT COUNT(*) AS n_truth FROM truth)
SELECT c.n_candidates, t.n_truth, h.n_hits,
       CASE WHEN c.n_candidates > 0
            THEN CAST(ROUND(10000.0 * h.n_hits / c.n_candidates, 0) AS BIGINT)
       END AS precision_e4,
       CASE WHEN t.n_truth > 0
            THEN CAST(ROUND(10000.0 * h.n_hits / t.n_truth, 0) AS BIGINT)
       END AS recall_e4
FROM c, t, h
""",
    "q108_ann_recall": f"""
WITH b AS (
  SELECT vec_id, embedding, {_BUCKET2} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS qb
  FROM b WHERE vec_id % 5 = 0 AND vec_id < 100
),
scored AS (
  SELECT q.query_id, b.vec_id,
         CAST(ROUND(10000.0 * {_cos('b.embedding', 'q.qe')}, 0) AS BIGINT) AS sim_e4,
         (b.bucket = q.qb) AS in_bucket
  FROM b CROSS JOIN q
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored) WHERE rn <= 10
),
ann AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored WHERE in_bucket) WHERE rn <= 10
),
hits AS (
  SELECT e.query_id, COUNT(*) AS n_hits
  FROM exact e JOIN ann a ON e.query_id = a.query_id AND e.vec_id = a.vec_id
  GROUP BY e.query_id
)
SELECT q.query_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(ROUND(10000.0 * COALESCE(h.n_hits, 0) / 10, 0) AS BIGINT) AS recall_e4
FROM q LEFT JOIN hits h ON q.query_id = h.query_id
ORDER BY q.query_id
""",
    "q58_multimodal_decode": f"""
SELECT doc_id,
       CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS byte_len,
       MD5(text) AS content_md5,
       CAST(16 * ({_HEXPOS.format(p=1)}) + ({_HEXPOS.format(p=2)}) + 1 AS INT) AS width,
       CAST(16 * ({_HEXPOS.format(p=3)}) + ({_HEXPOS.format(p=4)}) + 1 AS INT) AS height
FROM documents
ORDER BY doc_id
LIMIT 100
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
    "q59_embedding_neardup": f"""
SELECT COUNT(*) AS n_pairs, COUNT(DISTINCT b.vec_id) AS n_dup_docs
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos('a.embedding', 'b.embedding')} >= 0.35
""",
    "q93_redact_terms": r"""
SELECT doc_id,
       CAST(LEN(regexp_extract_all(text, '\b(key|hash|secret|token)\b'))
            AS BIGINT) AS n_hits,
       CAST(LENGTH(regexp_replace(text, '\b(key|hash|secret|token)\b',
                                  '[MASKED]', 'g')) AS BIGINT) AS redacted_len,
       MD5(regexp_replace(text, '\b(key|hash|secret|token)\b',
                          '[MASKED]', 'g')) AS redacted_md5
FROM documents
ORDER BY doc_id
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
    "q96_kmeans_step": f"""
WITH comps AS (
  SELECT label, generate_subscripts(embedding, 1) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings
),
cent AS (
  SELECT label AS c_label,
         LIST(CAST(centroid_e6 AS DOUBLE) / 1000000.0 ORDER BY dim) AS cvec
  FROM (
    SELECT label, dim,
           CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS centroid_e6
    FROM comps GROUP BY label, dim
  ) GROUP BY label
),
sims AS (
  SELECT e.vec_id, c.c_label, {_cos("e.embedding", "c.cvec")} AS sim
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, c_label AS assigned_label
  FROM (
    SELECT vec_id, c_label,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC NULLS LAST, c_label) AS rn
    FROM sims
  ) WHERE rn = 1
),
acomps AS (
  SELECT a.assigned_label, generate_subscripts(e.embedding, 1) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(e.embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM embeddings e JOIN assigned a USING (vec_id)
)
SELECT assigned_label, dim, COUNT(*) AS n_vecs,
       CAST(SUM(c_e6) AS BIGINT) AS sum_e6,
       CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS centroid_e6
FROM acomps
GROUP BY assigned_label, dim
ORDER BY assigned_label, dim
""",
    "q97_canonical_docs": f"""
WITH RECURSIVE bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.node
),
cc AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
r AS (
  SELECT cc.component, cc.node AS doc_id, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY cc.component
                            ORDER BY d.n_chars DESC, cc.node) AS rn
  FROM cc JOIN documents d ON d.doc_id = cc.node
)
SELECT component, COUNT(*) AS n_docs,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS canonical_doc_id,
       MAX(CASE WHEN rn = 1 THEN n_chars END) AS canonical_chars,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
FROM r
GROUP BY component
ORDER BY component
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
    "q100_cdc_chunks": """
WITH t AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
         LEN(STRING_SPLIT(text, ' ')) AS n
  FROM documents
),
b AS (
  SELECT doc_id, toks, n,
         LIST_SORT(LIST_DISTINCT(
           LIST_FILTER(GENERATE_SERIES(3, n),
             i -> CAST(CONCAT('0x', SUBSTR(MD5(
                    ARRAY_TO_STRING(toks[i-2:i], ' ')), 1, 4)) AS BIGINT)
                  % 8 = 0)
           || [n])) AS ends
  FROM t
),
e AS (
  SELECT doc_id, toks, generate_subscripts(ends, 1) AS j, UNNEST(ends) AS en,
         ends
  FROM b
)
SELECT doc_id,
       CAST(j - 1 AS BIGINT) AS chunk_idx,
       CAST(en - (CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END) + 1
            AS BIGINT) AS n_tokens,
       MD5(ARRAY_TO_STRING(
         toks[(CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END):en], ' '))
         AS chunk_md5
FROM e
ORDER BY doc_id, chunk_idx
LIMIT 2000
""",
    "q102_integrity_audit": """
SELECT * FROM (
  SELECT 'docs_without_embedding' AS check, COUNT(*) AS n
  FROM documents d WHERE NOT EXISTS
    (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)
  UNION ALL
  SELECT 'embeddings_without_doc', COUNT(*)
  FROM embeddings e WHERE NOT EXISTS
    (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
  UNION ALL
  SELECT 'duplicate_doc_ids', COUNT(*) FROM
    (SELECT doc_id FROM documents GROUP BY doc_id HAVING COUNT(*) > 1)
  UNION ALL
  SELECT 'duplicate_vec_ids', COUNT(*) FROM
    (SELECT vec_id FROM embeddings GROUP BY vec_id HAVING COUNT(*) > 1)
)
ORDER BY "check"
""",
    "q103_length_histogram": """
WITH t AS (
  SELECT LEN(STRING_SPLIT(text, ' ')) AS n_tok FROM documents
)
SELECT CASE WHEN n_tok <= 1 THEN 1
            ELSE CAST(POW(2.0, CEIL(LOG2(CAST(n_tok AS DOUBLE)))) AS BIGINT)
       END AS len_bucket,
       COUNT(*) AS n_docs
FROM t
GROUP BY 1
ORDER BY len_bucket
""",
    "q104_chunk_dedup_pipeline": r"""
WITH t AS (
  SELECT doc_id,
         STRING_SPLIT(regexp_replace(text, '\b(key|hash|secret|token)\b',
                                     '[MASKED]', 'g'), ' ') AS toks,
         LEN(STRING_SPLIT(regexp_replace(text, '\b(key|hash|secret|token)\b',
                                         '[MASKED]', 'g'), ' ')) AS n
  FROM documents
),
b AS (
  SELECT doc_id, toks, n,
         LIST_SORT(LIST_DISTINCT(
           LIST_FILTER(GENERATE_SERIES(3, n),
             i -> CAST(CONCAT('0x', SUBSTR(MD5(
                    ARRAY_TO_STRING(toks[i-2:i], ' ')), 1, 4)) AS BIGINT)
                  % 8 = 0)
           || [n])) AS ends
  FROM t
),
e AS (
  SELECT doc_id, toks, generate_subscripts(ends, 1) AS j, UNNEST(ends) AS en,
         ends
  FROM b
),
chunks AS (
  SELECT doc_id,
         MD5(ARRAY_TO_STRING(
           toks[(CASE WHEN j = 1 THEN 1 ELSE ends[j-1] + 1 END):en], ' '))
           AS chunk_md5
  FROM e
)
SELECT d.source,
       COUNT(*) AS n_chunks,
       COUNT(DISTINCT c.chunk_md5) AS n_distinct,
       CAST(ROUND(10000.0 * (COUNT(*) - COUNT(DISTINCT c.chunk_md5))
                  / COUNT(*), 0) AS BIGINT) AS dup_e4
FROM chunks c JOIN documents d USING (doc_id)
GROUP BY d.source
ORDER BY d.source
""",
    "q106_column_profile": """
SELECT * FROM (
  SELECT 'o_orderkey' AS "column",
         CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         COUNT(DISTINCT o_orderkey) AS n_distinct,
         CAST(MIN(o_orderkey) AS VARCHAR) AS min_str,
         CAST(MAX(o_orderkey) AS VARCHAR) AS max_str
  FROM orders
  UNION ALL
  SELECT 'o_custkey',
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT o_custkey),
         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus',
         CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT o_orderstatus),
         MIN(o_orderstatus), MAX(o_orderstatus)
  FROM orders
  UNION ALL
  SELECT 'o_orderdate',
         CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT o_orderdate),
         CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR),
         CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority',
         CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(DISTINCT o_orderpriority),
         MIN(o_orderpriority), MAX(o_orderpriority)
  FROM orders
)
ORDER BY "column"
""",
    # shard = doc_id % 5 == 0 vs corpus = the rest; same distinct-shingle
    # inverted-index Jaccard as q52 (float >= threshold: IEEE division is
    # deterministic and identical in both engines)
    "q113_incremental_dedup": f"""
WITH sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS new_id, b.doc_id AS corp_id, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.sh = b.sh
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
  GROUP BY 1, 2
),
dups AS (
  SELECT DISTINCT p.new_id
  FROM pairs p
  JOIN sizes sa ON sa.doc_id = p.new_id
  JOIN sizes sb ON sb.doc_id = p.corp_id
  WHERE p.common * 1.0 / (sa.n + sb.n - p.common) >= 0.5
)
SELECT d.source,
       COUNT(*) AS n_new,
       CAST(SUM(CASE WHEN dups.new_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN dups.new_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM documents d LEFT JOIN dups ON d.doc_id = dups.new_id
WHERE d.doc_id % 5 = 0
GROUP BY d.source
ORDER BY d.source
""",
    "q114_source_reputation": """
WITH base AS (
  SELECT source, COUNT(*) AS n_docs,
         COUNT(*) - COUNT(DISTINCT MD5(text)) AS n_dup_texts,
         ROUND(AVG(n_chars), 2) AS avg_chars
  FROM documents GROUP BY source
),
lc AS (
  SELECT source, lang, COUNT(*) AS n_lang,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY COUNT(*) DESC, lang) AS rn
  FROM documents GROUP BY source, lang
)
SELECT b.source, b.n_docs, b.n_dup_texts, b.avg_chars,
       lc.lang AS top_lang,
       CAST(ROUND(10000.0 * lc.n_lang / b.n_docs, 0) AS BIGINT) AS top_lang_bp
FROM base b JOIN lc ON b.source = lc.source AND lc.rn = 1
ORDER BY b.source
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
