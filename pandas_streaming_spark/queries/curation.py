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
from pandas_streaming_spark.operators.sampling import (
    cap_per_group,
    deterministic_sample,
    hash_split,
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


QUERIES = {
    "q74_deterministic_sample": q74_deterministic_sample,
    "q75_hash_split": q75_hash_split,
    "q76_cap_per_source": q76_cap_per_source,
}

ORACLES = {
    "q74_deterministic_sample": f"""
SELECT lang, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
FROM documents
WHERE {_BUCKET_SQL.format(id="doc_id")} < 20
GROUP BY lang
ORDER BY lang
""",
    "q75_hash_split": f"""
WITH b AS (
  SELECT label, {_BUCKET_SQL.format(id="vec_id")} AS bucket FROM embeddings
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n, COUNT(DISTINCT label) AS n_labels,
       SUM(label) AS sum_label
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
SELECT source, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
FROM ranked
WHERE rn <= 50
GROUP BY source
ORDER BY source
""",
}
