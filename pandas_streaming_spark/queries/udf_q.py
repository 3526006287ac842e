"""Q61–Q64: the UDF surface under the correctness gate (SURVEY.md §2.9).

Each Python-extension flavor is exercised by a graded query whose duckdb
oracle recomputes the same math in SQL — proving the Arrow boundary
preserves semantics, not just that it runs. q64 uses approximate
aggregates (HLL++/quantile sketches) whose values are engine-specific by
construction, so it grades their ERROR CONTRACTS against exact anchors
instead (round 6; formerly the registry's one rows-only entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.functions.udfs import (
    geometric_mean,
    sigmoid100,
    zscore_per_group,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q61_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.round(geometric_mean("value"), 2).alias("geo_mean"))
        .orderBy("event_type")
    )


def q62_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    z = zscore_per_group(_t(spark, sf_dir, "events"), key="user_id", value_col="value")
    return (
        z.groupBy("user_id")
        .agg(F.round(F.max(F.abs(F.col("z"))), 2).alias("max_abs_z"))
        .orderBy("user_id")
    )


def q63_vectorized_sigmoid(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    sig_e4 = F.round(F.lit(10000.0) * sigmoid100(F.col("value")), 0).cast("long")
    return (
        e.select("event_id", sig_e4.alias("sig_e4"))
        .orderBy("event_id")
        .limit(200)
    )


def q64_approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates for the 100 TB path (HLL++ count-distinct,
    GK quantile sketch) — graded via their error CONTRACTS (VERDICT r5
    item 3, closing the last rows-only registry entry with the
    q118/q108 pattern): the sketch VALUES are partition-order dependent
    and can't be hash-graded, but the guarantees hold under EVERY
    partitioning and the exact anchors are deterministic. Per
    event_type: the exact distinct-user count, whether
    ``approx_count_distinct(rsd=0.05)`` landed within 3*rsd of exact,
    and whether the approx median's exact rank is within n/accuracy
    (+1 tie slack) of the target rank — a merge/pruning bug in either
    sketch flips a boolean instead of silently passing."""
    e = _t(spark, sf_dir, "events")
    g = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.05).alias("__acd"),
        F.percentile_approx("value", F.lit(0.5), F.lit(1000)).alias("__am"),
        F.count("value").alias("__n"),
    )
    ranks = (
        e.join(F.broadcast(g.select("event_type", "__am")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("value") <= F.col("__am"), 1).otherwise(0)
            ).alias("__rank")
        )
    )
    bound = F.ceil(F.col("__n") / F.lit(1000)) + 1
    target = F.ceil(F.lit(0.5) * F.col("__n"))
    return (
        g.join(ranks, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__acd") - F.col("exact_users"))
                <= F.lit(0.15) * F.col("exact_users")
            ).alias("cd_err_ok"),
            (F.abs(F.col("__rank") - target) <= bound).alias("median_rank_ok"),
        )
        .orderBy("event_type")
    )


def q120_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (§2.9, Spark 4 table function): tokens with 1-based
    positions emitted by ``LATERAL positioned_tokens(t.text)`` — the
    row→rows flavor as a REAL SQL table function rather than a
    mapInPandas wrapper. Oracle re-derives positions with duckdb
    GENERATE_SERIES subscripting."""
    from pandas_streaming_spark.functions.udfs import PositionedTokensUDTF

    spark.udtf.register("positioned_tokens", PositionedTokensUDTF)
    _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 40).select(
        "doc_id", "text"
    ).createOrReplaceTempView("__docs_for_udtf")
    return spark.sql(
        """
        SELECT t.doc_id, f.pos, f.term
        FROM __docs_for_udtf t, LATERAL positioned_tokens(t.text) f
        ORDER BY t.doc_id, f.pos
        LIMIT 500
        """
    )


def q170_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python UDF (Spark 4 ``udf(useArrow=True)``) — the
    third Python-extension flavor under the gate (q63 covers pandas_udf,
    q61/q62 the grouped forms): per-row Python with Arrow-batch
    transfer instead of pickled rows. Counts alphanumeric characters of
    the event's type+props payload; the oracle re-derives the count with
    a regex in SQL, so the Arrow boundary must preserve string semantics
    (including NULL props) exactly."""
    from pyspark.sql.types import LongType

    # ASCII-explicit on purpose (ADVICE r6): str.isalnum() is Unicode-aware
    # while the oracle regex is [a-zA-Z0-9]; pinning the UDF to ASCII makes
    # the graded semantics match by construction, not by fixture content.
    _ASCII_ALNUM = frozenset(
        "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    )

    @F.udf(returnType=LongType(), useArrow=True)
    def alnum_count(s: str) -> int:
        return sum(ch in _ASCII_ALNUM for ch in s) if s else 0

    e = _t(spark, sf_dir, "events")
    payload = F.concat_ws("|", F.col("event_type"), F.col("props"))
    return (
        e.select("event_type", alnum_count(payload).alias("n_alnum"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_alnum").cast("long").alias("sum_alnum"),
            F.min("n_alnum").cast("long").alias("min_alnum"),
            F.max("n_alnum").cast("long").alias("max_alnum"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "q170_arrow_udf": q170_arrow_udf,
    "q61_udaf_geomean": q61_udaf_geomean,
    "q62_grouped_map_zscore": q62_grouped_map_zscore,
    "q63_vectorized_sigmoid": q63_vectorized_sigmoid,
    "q64_approx_aggregates": q64_approx_aggregates,
    "q120_python_udtf": q120_python_udtf,
}

ORACLES = {
    "q170_arrow_udf": """
WITH t AS (
  SELECT event_type,
         LENGTH(REGEXP_REPLACE(
           CONCAT_WS('|', event_type, props), '[^a-zA-Z0-9]', '', 'g'
         )) AS n_alnum
  FROM events
)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(n_alnum) AS BIGINT) AS sum_alnum,
       CAST(MIN(n_alnum) AS BIGINT) AS min_alnum,
       CAST(MAX(n_alnum) AS BIGINT) AS max_alnum
FROM t GROUP BY event_type ORDER BY event_type
""",
    "q61_udaf_geomean": """
SELECT event_type,
       -- CASE, not FILTER: duckdb evaluates LN(value) eagerly per row,
       -- so FILTER(WHERE value>0) still hits LN(0) when zeros exist
       ROUND(EXP(AVG(CASE WHEN value > 0 THEN LN(value) END)), 2) AS geo_mean
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "q62_grouped_map_zscore": """
WITH s AS (
  SELECT user_id, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
  FROM events GROUP BY user_id
)
SELECT e.user_id, ROUND(MAX(ABS((e.value - s.mu) / s.sd)), 2) AS max_abs_z
FROM events e JOIN s USING (user_id)
GROUP BY e.user_id
ORDER BY e.user_id
""",
    "q63_vectorized_sigmoid": """
SELECT event_id,
       CAST(ROUND(10000.0 * (1.0 / (1.0 + EXP(-value / 100.0))), 0) AS BIGINT) AS sig_e4
FROM events
ORDER BY event_id
LIMIT 200
""",
    "q64_approx_aggregates": """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS cd_err_ok,
       TRUE AS median_rank_ok
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    "q120_python_udtf": """
WITH t AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS toks
  FROM documents WHERE doc_id < 40
)
SELECT doc_id, CAST(i AS INT) AS pos, toks[i] AS term
FROM t CROSS JOIN LATERAL (
  SELECT UNNEST(GENERATE_SERIES(1, LEN(toks))) AS i
) u
ORDER BY doc_id, pos
LIMIT 500
""",
}
