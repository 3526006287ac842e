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


# moved to textq.py in round 6 (module split); re-exported for compatibility
from pandas_streaming_spark.queries.textq import (  # noqa: F401
    q40_top_tokens,
    q41_text_stats,
    q53_language_id,
    q54_quality_score,
    q55_token_stats,
    q56_winnow_fingerprints,
    q81_tfidf,
    q84_chunk_documents,
    q89_repetition_score,
    q90_contamination,
    q93_redact_terms,
    q97_canonical_docs,
    q100_cdc_chunks,
    q102_integrity_audit,
    q103_length_histogram,
    q106_column_profile,
)

# moved to vectors.py in round 6 (module split); re-exported for compatibility
from pandas_streaming_spark.queries.vectors import (  # noqa: F401
    q39_similarity_topk,
    q42_similarity_join,
    q57_ann_bucketed,
    q58_multimodal_decode,
    q59_embedding_neardup,
    q79_frame_sample,
    q86_knn_join,
    q87_label_centroid,
    q91_centroid_assign,
    q92_ivf_topk,
    q95_quantize_int8,
    q96_kmeans_step,
    q99_normalize_matryoshka,
    q108_ann_recall,
)

# moved to dedup_q.py in round 6 (module split); re-exported for compatibility
from pandas_streaming_spark.queries.dedup_q import (  # noqa: F401
    q49_minhash_signatures,
    q50_lsh_candidate_pairs,
    q51_simhash,
    q52_ngram_jaccard,
    q82_dedup_clusters,
    q104_chunk_dedup_pipeline,
    q109_lsh_audit,
    q110_simhash_audit,
    q113_incremental_dedup,
    q127_fuzzy_pairs,
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


QUERIES = {
    "q38_exact_dedup": q38_exact_dedup,
    "q114_source_reputation": q114_source_reputation,
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
    # oracles for functions that moved to dedup_q.py in the round-6
    # module split but whose SQL builds on this module's shared duckdb
    # fragments (_SHINGLES/_MINHASH_SIG/_SIMHASH*): kept here to avoid a
    # circular import; the registry aggregates ORACLES across modules.
    "q49_minhash_signatures": f"""
SELECT doc_id, STRING_AGG(mh, '|' ORDER BY s) AS sig
FROM ({_MINHASH_SIG})
GROUP BY doc_id
ORDER BY doc_id
LIMIT 100
""",
    # q50's candidate grammar + per-pair signature agreement + the q52
    # exact-Jaccard verify, bucketed by agreement count
    "q272_minhash_calibration": f"""
WITH bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sig AS MATERIALIZED ({_MINHASH_SIG}),
m AS (
  SELECT c.id_a, c.id_b,
         SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS matches
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b AND sb.s = sa.s
  GROUP BY 1, 2
),
shd AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sz AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
cm AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS cmn
  FROM cand c
  JOIN shd a ON a.doc_id = c.id_a
  JOIN shd b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
j AS (
  SELECT m.matches,
         COALESCE(CAST(ROUND(1e4 * cm.cmn / (za.n + zb.n - cm.cmn), 0)
                       AS BIGINT), 0) AS jac_bp
  FROM m
  LEFT JOIN cm ON cm.id_a = m.id_a AND cm.id_b = m.id_b
  JOIN sz za ON za.doc_id = m.id_a
  JOIN sz zb ON zb.doc_id = m.id_b
)
SELECT CAST(matches AS BIGINT) AS matches,
       CAST(matches * 1250 AS BIGINT) AS est_bp,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(ROUND(SUM(jac_bp) / COUNT(*), 0) AS BIGINT) AS mean_true_bp
FROM j GROUP BY matches ORDER BY matches
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
    "q183_prefix_filter_simjoin": f"""
WITH sh AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       CAST(c AS BIGINT) AS n_common,
       CAST(na.n + nb.n - c AS BIGINT) AS n_union,
       CAST(ROUND(1e6 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e6
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE 1.0 * c / (na.n + nb.n - c) >= 0.6
ORDER BY id_a, id_b
""",
    "q52_ngram_jaccard": f"""
WITH bands AS (  -- bands=8, rows=1: each component is its own band
  SELECT doc_id, s AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s
),
ok AS (  -- mirror max_bucket=64: oversized buckets are dropped, not paired
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (  -- the q50 candidate set: the exact verify is SCOPED to it
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
ORDER BY jac_e4 DESC, id_a, id_b
LIMIT 20
""",
    # q50 candidates + candidate-scoped exact Jaccard at >= 0.8,
    # attributed to unordered source pairs
    "q284_source_neardup_matrix": f"""
WITH bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
nd AS (
  SELECT * FROM (
    SELECT id_a, id_b,
           CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
  ) WHERE jac_e4 >= 8000
)
SELECT LEAST(sa.source, sb.source) AS source_a,
       GREATEST(sa.source, sb.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(ROUND(SUM(jac_e4) / COUNT(*), 0) AS BIGINT) AS mean_jac_e4
FROM nd
JOIN documents sa ON sa.doc_id = nd.id_a
JOIN documents sb ON sb.doc_id = nd.id_b
GROUP BY 1, 2
ORDER BY 1, 2
""",
    # same near-dup frame; q216 sqrt weights + q266 integral-div epoch
    # allocation over the DEDUPED supply, naive-plan column included
    "q298_dedup_adjusted_epochs": f"""
WITH bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
nd AS (
  SELECT * FROM (
    SELECT id_a, id_b,
           CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
  ) WHERE jac_e4 >= 8000
),
removed AS (SELECT DISTINCT id_b AS doc_id FROM nd),
n AS (
  SELECT d.source,
         CAST(SUM(LEN(STRING_SPLIT(d.text, ' '))) AS BIGINT) AS raw_toks,
         CAST(SUM(CASE WHEN r.doc_id IS NULL
                       THEN LEN(STRING_SPLIT(d.text, ' ')) ELSE 0 END)
              AS BIGINT) AS dedup_toks
  FROM documents d LEFT JOIN removed r ON r.doc_id = d.doc_id
  GROUP BY d.source
),
s AS (
  SELECT source, raw_toks, dedup_toks,
         CAST(ROUND(1e6 * SQRT(dedup_toks), 0) AS BIGINT) AS s_e6,
         CAST(ROUND(1e6 * SQRT(raw_toks), 0) AS BIGINT) AS sr_e6
  FROM n
),
tot AS (
  SELECT CAST(SUM(s_e6) AS BIGINT) AS tot_s,
         CAST(SUM(dedup_toks) AS BIGINT) AS tot_n,
         CAST(SUM(sr_e6) AS BIGINT) AS tot_sr,
         CAST(SUM(raw_toks) AS BIGINT) AS tot_nr
  FROM s
),
j AS (
  SELECT source, raw_toks, dedup_toks,
         CAST(ROUND(1e6 * s_e6 / tot_s, 0) AS BIGINT) AS w_ppm,
         CAST(ROUND(1e6 * sr_e6 / tot_sr, 0) AS BIGINT) AS wr_ppm,
         tot_n, tot_nr
  FROM s CROSS JOIN tot
),
tg AS (
  SELECT source, raw_toks, dedup_toks, w_ppm,
         CAST((tot_n * 3 * w_ppm) // 10000000 AS BIGINT) AS target_toks,
         CAST((tot_nr * 3 * wr_ppm) // 10000000 AS BIGINT) AS tr
  FROM j
)
SELECT source, raw_toks, dedup_toks, w_ppm, target_toks,
       CAST(LEAST(dedup_toks, target_toks) AS BIGINT) AS unique_toks,
       CAST(GREATEST(0, target_toks - dedup_toks) AS BIGINT)
         AS repeated_toks,
       CAST((target_toks * 100) // GREATEST(dedup_toks, 1) AS BIGINT)
         AS epochs_x100,
       CAST((tr * 100) // GREATEST(dedup_toks, 1) AS BIGINT)
         AS epochs_naive_x100
FROM tg ORDER BY source
""",
    # the datacard composition: same near-dup frame + Gopher gate flags
    # + language mode/entropy, one row per source
    "q295_corpus_datacard": f"""
WITH bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
nd AS (
  SELECT * FROM (
    SELECT id_a, id_b,
           CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
  ) WHERE jac_e4 >= 8000
),
removed AS (SELECT DISTINCT id_b AS doc_id FROM nd),
per AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS nc,
         CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n,
         LEN(REPLACE(text, ' ', '')) AS sl,
         LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS ndist,
         LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                            ['the','a','of','to','and'])) AS nstop,
         LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                  x -> LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                       y -> y = x)))) AS mx
  FROM documents
),
base AS (
  SELECT p.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(p.n) AS BIGINT) AS n_tokens,
         CAST(SUM(p.nc) AS BIGINT) AS n_chars,
         CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS nd_removed,
         CAST(SUM(CASE WHEN p.n >= 30 AND p.n <= 10000
                        AND p.sl >= 3 * p.n AND p.sl <= 10 * p.n
                        AND p.ndist * 10 >= 3 * p.n AND p.nstop >= 2
                        AND p.mx * 5 <= p.n THEN 1 ELSE 0 END) AS BIGINT)
           AS npass
  FROM per p LEFT JOIN removed r ON r.doc_id = p.doc_id
  GROUP BY p.source
),
sl2 AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS ni
  FROM documents GROUP BY 1, 2
),
stot AS (SELECT source, CAST(SUM(ni) AS BIGINT) AS nt FROM sl2 GROUP BY 1),
major AS (
  SELECT source, lang AS major_lang FROM (
    SELECT source, lang,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY ni DESC, lang) AS rn
    FROM sl2
  ) WHERE rn = 1
),
ent AS (
  SELECT sl2.source,
         CAST(SUM(CAST(ROUND(1e6 * ni / nt * LN(nt / ni), 0) AS BIGINT))
              AS BIGINT) AS lang_entropy_e6
  FROM sl2 JOIN stot USING (source) GROUP BY sl2.source
)
SELECT b.source, n_docs, n_tokens, n_chars, major_lang, lang_entropy_e6,
       nd_removed,
       CAST(ROUND(1e6 * (n_docs - nd_removed) / n_docs, 0) AS BIGINT)
         AS retention_ppm,
       CAST(ROUND(1e6 * npass / n_docs, 0) AS BIGINT) AS gate_pass_ppm
FROM base b JOIN major USING (source) JOIN ent USING (source)
ORDER BY source
""",
    # same near-dup frame; pairwise keep-smallest removal, per-source
    # retention ppm
    "q286_dedup_retention": f"""
WITH bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
nd AS (
  SELECT * FROM (
    SELECT id_a, id_b,
           CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
  ) WHERE jac_e4 >= 8000
),
removed AS (SELECT DISTINCT id_b AS doc_id FROM nd)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
         AS n_removed,
       CAST(COUNT(*) - SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END)
            AS BIGINT) AS n_retained,
       CAST(ROUND(1e6 * (COUNT(*) - SUM(CASE WHEN r.doc_id IS NULL
                                             THEN 0 ELSE 1 END))
                  / COUNT(*), 0) AS BIGINT) AS retention_ppm
FROM documents d LEFT JOIN removed r ON r.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
""",
    # CC over the VERIFIED pairs; per-size mean edge density (clique vs
    # transitivity-chain diagnosis)
    "q299_cluster_cohesion": f"""
WITH RECURSIVE bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
nd AS (
  SELECT * FROM (
    SELECT id_a, id_b,
           CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
  ) WHERE jac_e4 >= 8000
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM nd
  UNION
  SELECT id_b, id_a FROM nd
),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.node
),
cc AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
csz AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS m FROM cc GROUP BY component
),
ce AS (
  SELECT c.component, CAST(COUNT(*) AS BIGINT) AS e
  FROM nd JOIN cc c ON c.node = nd.id_a
  GROUP BY c.component
),
per AS (
  SELECT m, e,
         CAST(ROUND(1e6 * 2 * e / (m * (m - 1)), 0) AS BIGINT) AS coh
  FROM csz JOIN ce USING (component)
  WHERE m >= 2
)
SELECT m AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(e) AS BIGINT) AS n_edges,
       CAST(ROUND(SUM(coh) / COUNT(*), 0) AS BIGINT) AS mean_cohesion_ppm
FROM per GROUP BY m ORDER BY cluster_size
""",
    # CC over the VERIFIED (>=0.8) pairs; size histogram + dup factor
    "q287_dup_cluster_histogram": f"""
WITH RECURSIVE bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS c
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
  GROUP BY 1, 2
),
nd AS (
  SELECT * FROM (
    SELECT id_a, id_b,
           CAST(ROUND(10000.0 * c / (na.n + nb.n - c), 0) AS BIGINT) AS jac_e4
    FROM common
    JOIN sizes na ON na.doc_id = id_a
    JOIN sizes nb ON nb.doc_id = id_b
  ) WHERE jac_e4 >= 8000
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM nd
  UNION
  SELECT id_b, id_a FROM nd
),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, w.label FROM walk w JOIN edges e ON e.dst = w.node
),
cc AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
csz AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM cc GROUP BY component
),
hist AS (
  SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
  FROM csz GROUP BY cluster_size
),
tot AS (
  SELECT CAST(SUM(cluster_size) AS BIGINT) AS nn,
         CAST(COUNT(*) AS BIGINT) AS comp
  FROM csz
)
SELECT bucket, n_clusters, n_docs, share_ppm, dup_factor_e3 FROM (
  SELECT 'size_' || LPAD(CAST(cluster_size AS VARCHAR), 3, '0') AS bucket,
         n_clusters,
         CAST(cluster_size * n_clusters AS BIGINT) AS n_docs,
         CAST(ROUND(1e6 * cluster_size * n_clusters / tot.nn, 0) AS BIGINT)
           AS share_ppm,
         CAST(NULL AS BIGINT) AS dup_factor_e3
  FROM hist, tot
  UNION ALL
  SELECT '__TOTAL__', comp, nn, CAST(1000000 AS BIGINT),
         CAST(ROUND(1e3 * nn / comp, 0) AS BIGINT)
  FROM tot
) ORDER BY bucket
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
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
        WHERE doc_id % 4 = 1)
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
sh2 AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES}) WHERE doc_id % 4 = 1),
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
    "q38_exact_dedup": """
SELECT COALESCE(lang, 'ALL') AS lang, COUNT(*) AS n_docs,
       COUNT(DISTINCT MD5(text)) AS n_distinct,
       COUNT(*) - COUNT(DISTINCT MD5(text)) AS n_dups
FROM documents
GROUP BY ROLLUP (lang)
ORDER BY lang
""",
    # q182's fused chain as a CTE + exact-cosine top-10 relevance,
    # e6 position discounts, exact-integer DCG/IDCG ratio
    "q301_ndcg_rrf": f"""
WITH qt AS (
  SELECT DISTINCT UNNEST(STRING_SPLIT(text, ' ')) AS t
  FROM documents WHERE doc_id = 0
),
dt AS (
  SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t
  FROM documents WHERE doc_id <> 0
),
lex AS (
  SELECT doc_id, COUNT(*) AS lex_score
  FROM dt JOIN qt ON dt.t = qt.t
  GROUP BY doc_id
  ORDER BY lex_score DESC, doc_id
  LIMIT 50
),
topl AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY lex_score DESC, doc_id) AS rank_lex
  FROM lex
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
vs AS (
  SELECT e.vec_id,
         CAST(ROUND(10000.0 * {_cos("e.embedding", "q.qe")}, 0) AS BIGINT)
           AS sim_e4
  FROM embeddings e, q
  WHERE e.vec_id <> 0
  ORDER BY sim_e4 DESC, vec_id
  LIMIT 50
),
topv AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY sim_e4 DESC, vec_id) AS rank_vec
  FROM vs
),
fused AS (
  SELECT COALESCE(topl.doc_id, topv.doc_id) AS doc_id,
         COALESCE(CAST(ROUND(1e6 / (60 + topl.rank_lex), 0) AS BIGINT), 0)
           + COALESCE(CAST(ROUND(1e6 / (60 + topv.rank_vec), 0) AS BIGINT), 0)
           AS rrf_e6
  FROM topl FULL OUTER JOIN topv ON topl.doc_id = topv.doc_id
  ORDER BY rrf_e6 DESC, doc_id
  LIMIT 10
),
relv AS (
  SELECT vec_id AS doc_id, 1 AS rel FROM vs
  ORDER BY sim_e4 DESC, vec_id LIMIT 10
),
ranked AS (
  SELECT ROW_NUMBER() OVER (ORDER BY rrf_e6 DESC, doc_id) AS rank,
         doc_id, rrf_e6
  FROM fused
),
rw AS (
  SELECT rank, ranked.doc_id, rrf_e6,
         CAST(COALESCE(r.rel, 0) AS BIGINT) AS relevant,
         CAST(ROUND(1e6 / LOG2(rank + 1), 0) AS BIGINT) AS w
  FROM ranked LEFT JOIN relv r ON r.doc_id = ranked.doc_id
),
d AS (
  SELECT CAST(SUM(relevant * w) AS BIGINT) AS dcg_e6,
         CAST(SUM(w) AS BIGINT) AS idcg
  FROM rw
)
SELECT CAST(rank AS BIGINT) AS rank, doc_id, rrf_e6, relevant, dcg_e6,
       CAST(ROUND(1e4 * dcg_e6 / idcg, 0) AS BIGINT) AS ndcg_e4
FROM rw CROSS JOIN d
ORDER BY rank
""",
    "q182_rrf_hybrid": f"""
WITH qt AS (
  SELECT DISTINCT UNNEST(STRING_SPLIT(text, ' ')) AS t
  FROM documents WHERE doc_id = 0
),
dt AS (
  SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t
  FROM documents WHERE doc_id <> 0
),
lex AS (
  SELECT doc_id, COUNT(*) AS lex_score
  FROM dt JOIN qt ON dt.t = qt.t
  GROUP BY doc_id
  ORDER BY lex_score DESC, doc_id
  LIMIT 50
),
topl AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY lex_score DESC, doc_id) AS rank_lex
  FROM lex
),
q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
vs AS (
  SELECT e.vec_id,
         CAST(ROUND(10000.0 * {_cos('e.embedding', 'q.qe')}, 0) AS BIGINT)
           AS sim_e4
  FROM embeddings e, q
  WHERE e.vec_id <> 0
  ORDER BY sim_e4 DESC, vec_id
  LIMIT 50
),
topv AS (
  SELECT vec_id AS doc_id,
         ROW_NUMBER() OVER (ORDER BY sim_e4 DESC, vec_id) AS rank_vec
  FROM vs
)
SELECT COALESCE(topl.doc_id, topv.doc_id) AS doc_id,
       topl.rank_lex AS rank_lex,
       topv.rank_vec AS rank_vec,
       COALESCE(CAST(ROUND(1e6 / (60 + topl.rank_lex), 0) AS BIGINT), 0)
         + COALESCE(CAST(ROUND(1e6 / (60 + topv.rank_vec), 0) AS BIGINT), 0)
         AS rrf_e6
FROM topl FULL OUTER JOIN topv ON topl.doc_id = topv.doc_id
ORDER BY rrf_e6 DESC, doc_id
LIMIT 10
""",
    "q238_dedup_threshold_sweep": f"""
WITH bands AS (
  SELECT doc_id, s // 2 AS band, MD5(STRING_AGG(mh, '|' ORDER BY s)) AS bh
  FROM ({_MINHASH_SIG})
  GROUP BY doc_id, s // 2
),
ok AS (
  SELECT band, bh FROM bands GROUP BY band, bh HAVING COUNT(*) <= 64
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a
  JOIN ok ON ok.band = a.band AND ok.bh = a.bh
  JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
),
shd AS (SELECT DISTINCT doc_id, sh FROM ({_SHINGLES})),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
cmn AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM shd a JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
t AS (
  SELECT cmn.id_a, cmn.id_b, c,
         na.n + nb.n - c AS un
  FROM cmn JOIN sizes na ON na.doc_id = cmn.id_a
           JOIN sizes nb ON nb.doc_id = cmn.id_b
),
j AS (
  SELECT COALESCE(t.c, 0) AS c, COALESCE(t.un, 0) AS un,
         CASE WHEN cand.id_a IS NULL THEN 0 ELSE 1 END AS is_cand
  FROM t FULL OUTER JOIN cand USING (id_a, id_b)
)
SELECT tau_pct, n_truth, n_cand, n_hits,
       CASE WHEN n_cand > 0
            THEN CAST(ROUND(1e4 * n_hits / n_cand, 0) AS BIGINT) END
         AS precision_bp,
       CASE WHEN n_truth > 0
            THEN CAST(ROUND(1e4 * n_hits / n_truth, 0) AS BIGINT) END
         AS recall_bp
FROM (
  SELECT CAST(tau AS BIGINT) AS tau_pct,
         CAST(SUM(CASE WHEN c > 0 AND c * 100 >= tau * un
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
         CAST(SUM(is_cand) AS BIGINT) AS n_cand,
         CAST(SUM(CASE WHEN c > 0 AND c * 100 >= tau * un AND is_cand = 1
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM j CROSS JOIN (SELECT UNNEST([50, 70, 90]) AS tau)
  GROUP BY tau
) ORDER BY tau_pct
""",
    "q218_mmr_rerank": (lambda: (
        f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT e.vec_id,
         CAST(ROUND(10000.0 * {_cos('e.embedding', 'q.qe')}, 0) AS BIGINT)
           AS rel_e4
  FROM embeddings e, q WHERE e.vec_id <> 0
  ORDER BY rel_e4 DESC, vec_id LIMIT 20
),
pr AS (
  SELECT a.vec_id AS aa, b.vec_id AS bb,
         CAST(ROUND(10000.0 * {_cos('ea.embedding', 'eb.embedding')}, 0)
              AS BIGINT) AS p
  FROM cand a JOIN embeddings ea ON ea.vec_id = a.vec_id
       JOIN cand b ON b.vec_id <> a.vec_id
       JOIN embeddings eb ON eb.vec_id = b.vec_id
),
s1 AS (
  SELECT vec_id, CAST(1 AS BIGINT) AS step,
         CAST(2 * rel_e4 AS BIGINT) AS mmr_2e4
  FROM cand ORDER BY rel_e4 DESC, vec_id LIMIT 1
), sel1 AS (SELECT vec_id FROM s1)"""
        + "".join(
            f""",
m{t} AS (
  SELECT c.vec_id, CAST(2 * c.rel_e4 - MAX(p.p) AS BIGINT) AS mmr_2e4
  FROM cand c JOIN pr p ON p.aa = c.vec_id
       AND p.bb IN (SELECT vec_id FROM sel{t - 1})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{t - 1})
  GROUP BY c.vec_id, c.rel_e4
),
s{t} AS (
  SELECT vec_id, CAST({t} AS BIGINT) AS step, mmr_2e4
  FROM m{t} ORDER BY mmr_2e4 DESC, vec_id LIMIT 1
),
sel{t} AS (SELECT vec_id FROM sel{t - 1} UNION SELECT vec_id FROM s{t})"""
            for t in range(2, 6)
        )
        + """
SELECT step, vec_id, mmr_2e4 FROM (
  SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3
  UNION ALL SELECT * FROM s4 UNION ALL SELECT * FROM s5
) ORDER BY step
"""
    ))(),
    "q207_semdedup": f"""
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
r AS (
  SELECT vec_id, c_label, sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC NULLS LAST, c_label) AS rn
  FROM sims
),
assigned AS (
  SELECT vec_id, c_label AS cl,
         CAST(ROUND(10000.0 * sim, 0) AS BIGINT) AS cent_e4
  FROM r WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM assigned x
  JOIN assigned y ON x.cl = y.cl AND x.vec_id <> y.vec_id
  JOIN embeddings ex ON ex.vec_id = x.vec_id
  JOIN embeddings ey ON ey.vec_id = y.vec_id
  WHERE {_cos('ex.embedding', 'ey.embedding')} >= 0.3
    AND (y.cent_e4 < x.cent_e4
         OR (y.cent_e4 = x.cent_e4 AND y.vec_id < x.vec_id))
)
SELECT a.vec_id, a.cl AS assigned_label, a.cent_e4 AS cent_sim_e4,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
ORDER BY a.vec_id
""",
    "q240_semdedup_scaled": f"""
WITH e AS (
  SELECT vec_id, embedding,
         CAST(FLOOR(vec_id / 200) AS BIGINT) AS shard,
         CAST(vec_id % 4 AS BIGINT) AS seed
  FROM embeddings
),
comps AS (
  SELECT shard, seed, generate_subscripts(embedding, 1) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM e
),
cent AS (
  SELECT shard, seed AS fine,
         LIST(CAST(centroid_e6 AS DOUBLE) / 1000000.0 ORDER BY dim) AS cvec
  FROM (
    SELECT shard, seed, dim,
           CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS centroid_e6
    FROM comps GROUP BY shard, seed, dim
  ) GROUP BY shard, seed
),
sims AS (
  SELECT e.vec_id, e.shard, c.fine, {_cos("e.embedding", "c.cvec")} AS sim
  FROM e JOIN cent c ON c.shard = e.shard
),
assigned AS (
  SELECT vec_id, shard, fine,
         CAST(ROUND(10000.0 * sim, 0) AS BIGINT) AS cent_e4
  FROM (
    SELECT vec_id, shard, fine, sim,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC NULLS LAST, fine) AS rn
    FROM sims
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM assigned x
  JOIN assigned y ON x.shard = y.shard AND x.fine = y.fine
                 AND x.vec_id <> y.vec_id
  JOIN embeddings ex ON ex.vec_id = x.vec_id
  JOIN embeddings ey ON ey.vec_id = y.vec_id
  WHERE {_cos('ex.embedding', 'ey.embedding')} >= 0.3
    AND (y.cent_e4 < x.cent_e4
         OR (y.cent_e4 = x.cent_e4 AND y.vec_id < x.vec_id))
)
SELECT a.vec_id, a.shard, a.fine, a.cent_e4 AS cent_sim_e4,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
ORDER BY a.vec_id
""",
    "q39_similarity_topk": f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       CAST(ROUND(10000.0 * {_cos('e.embedding', 'q.qe')}, 0) AS BIGINT) AS sim_e4
FROM embeddings e, q
ORDER BY sim_e4 DESC, vec_id
LIMIT 20
""",
    "q42_similarity_join": f"""
SELECT a.label, COUNT(*) AS n_pairs
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_cos('a.embedding', 'b.embedding')} >= 0.35
GROUP BY a.label
ORDER BY a.label
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
    "q259_ann_recall_curve": f"""WITH
b0 AS (
  SELECT vec_id, embedding, '' AS bucket FROM embeddings
),
q0 AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS qb
  FROM b0 WHERE vec_id % 5 = 0 AND vec_id < 100
),
scored0 AS (
  SELECT q.query_id, b.vec_id,
         CAST(ROUND(10000.0 * {_cos('b.embedding', 'q.qe')}, 0) AS BIGINT) AS sim_e4,
         (b.bucket = q.qb) AS in_bucket
  FROM b0 b CROSS JOIN q0 q
),
exact0 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored0) WHERE rn <= 10
),
ann0 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored0 WHERE in_bucket) WHERE rn <= 10
),
rec0 AS (
  SELECT q.query_id, CAST(ROUND(10000.0 * COALESCE(h.n_hits, 0) / 10, 0)
         AS BIGINT) AS recall_e4,
         CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
  FROM q0 q LEFT JOIN (
    SELECT e.query_id, COUNT(*) AS n_hits
    FROM exact0 e JOIN ann0 a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id) h ON q.query_id = h.query_id
),
agg0 AS (
  SELECT CAST(0 AS BIGINT) AS n_bits,
         CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(n_hits) AS BIGINT) AS total_hits,
         CAST(ROUND(AVG(recall_e4), 0) AS BIGINT) AS mean_recall_e4,
         CAST(MIN(recall_e4) AS BIGINT) AS min_recall_e4
  FROM rec0
),
b2 AS (
  SELECT vec_id, embedding, (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END) AS bucket FROM embeddings
),
q2 AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS qb
  FROM b2 WHERE vec_id % 5 = 0 AND vec_id < 100
),
scored2 AS (
  SELECT q.query_id, b.vec_id,
         CAST(ROUND(10000.0 * {_cos('b.embedding', 'q.qe')}, 0) AS BIGINT) AS sim_e4,
         (b.bucket = q.qb) AS in_bucket
  FROM b2 b CROSS JOIN q2 q
),
exact2 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored2) WHERE rn <= 10
),
ann2 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored2 WHERE in_bucket) WHERE rn <= 10
),
rec2 AS (
  SELECT q.query_id, CAST(ROUND(10000.0 * COALESCE(h.n_hits, 0) / 10, 0)
         AS BIGINT) AS recall_e4,
         CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
  FROM q2 q LEFT JOIN (
    SELECT e.query_id, COUNT(*) AS n_hits
    FROM exact2 e JOIN ann2 a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id) h ON q.query_id = h.query_id
),
agg2 AS (
  SELECT CAST(2 AS BIGINT) AS n_bits,
         CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(n_hits) AS BIGINT) AS total_hits,
         CAST(ROUND(AVG(recall_e4), 0) AS BIGINT) AS mean_recall_e4,
         CAST(MIN(recall_e4) AS BIGINT) AS min_recall_e4
  FROM rec2
),
b4 AS (
  SELECT vec_id, embedding, (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bucket FROM embeddings
),
q4 AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS qb
  FROM b4 WHERE vec_id % 5 = 0 AND vec_id < 100
),
scored4 AS (
  SELECT q.query_id, b.vec_id,
         CAST(ROUND(10000.0 * {_cos('b.embedding', 'q.qe')}, 0) AS BIGINT) AS sim_e4,
         (b.bucket = q.qb) AS in_bucket
  FROM b4 b CROSS JOIN q4 q
),
exact4 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored4) WHERE rn <= 10
),
ann4 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored4 WHERE in_bucket) WHERE rn <= 10
),
rec4 AS (
  SELECT q.query_id, CAST(ROUND(10000.0 * COALESCE(h.n_hits, 0) / 10, 0)
         AS BIGINT) AS recall_e4,
         CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
  FROM q4 q LEFT JOIN (
    SELECT e.query_id, COUNT(*) AS n_hits
    FROM exact4 e JOIN ann4 a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id) h ON q.query_id = h.query_id
),
agg4 AS (
  SELECT CAST(4 AS BIGINT) AS n_bits,
         CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(n_hits) AS BIGINT) AS total_hits,
         CAST(ROUND(AVG(recall_e4), 0) AS BIGINT) AS mean_recall_e4,
         CAST(MIN(recall_e4) AS BIGINT) AS min_recall_e4
  FROM rec4
),
b8 AS (
  SELECT vec_id, embedding, (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[7] >= 0 THEN '1' ELSE '0' END || CASE WHEN embedding[8] >= 0 THEN '1' ELSE '0' END) AS bucket FROM embeddings
),
q8 AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket AS qb
  FROM b8 WHERE vec_id % 5 = 0 AND vec_id < 100
),
scored8 AS (
  SELECT q.query_id, b.vec_id,
         CAST(ROUND(10000.0 * {_cos('b.embedding', 'q.qe')}, 0) AS BIGINT) AS sim_e4,
         (b.bucket = q.qb) AS in_bucket
  FROM b8 b CROSS JOIN q8 q
),
exact8 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored8) WHERE rn <= 10
),
ann8 AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY sim_e4 DESC, vec_id) AS rn
    FROM scored8 WHERE in_bucket) WHERE rn <= 10
),
rec8 AS (
  SELECT q.query_id, CAST(ROUND(10000.0 * COALESCE(h.n_hits, 0) / 10, 0)
         AS BIGINT) AS recall_e4,
         CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
  FROM q8 q LEFT JOIN (
    SELECT e.query_id, COUNT(*) AS n_hits
    FROM exact8 e JOIN ann8 a
      ON e.query_id = a.query_id AND e.vec_id = a.vec_id
    GROUP BY e.query_id) h ON q.query_id = h.query_id
),
agg8 AS (
  SELECT CAST(8 AS BIGINT) AS n_bits,
         CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(n_hits) AS BIGINT) AS total_hits,
         CAST(ROUND(AVG(recall_e4), 0) AS BIGINT) AS mean_recall_e4,
         CAST(MIN(recall_e4) AS BIGINT) AS min_recall_e4
  FROM rec8
)
SELECT * FROM (
  SELECT * FROM agg0 UNION ALL SELECT * FROM agg2
  UNION ALL SELECT * FROM agg4 UNION ALL SELECT * FROM agg8
) ORDER BY n_bits
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
    # shard = doc_id % 5 == 0 vs corpus = the rest; same distinct-shingle
    # inverted-index Jaccard as q52 (float >= threshold: IEEE division is
    # deterministic and identical in both engines)
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
}
