"""Data-quality / table-audit queries (round 7): declarative
constraint checking — the dbt-test / Great-Expectations surface a
warehouse team runs nightly over every table, re-expressed as single
Spark jobs. (Column profiling already lives at q106_column_profile.)

House rules: same oracle discipline as every other module (aliases match
the duckdb SQL exactly; numeric outputs either exact integers or doubles
produced by identical arithmetic on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q177_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint audit (§2.9 data-quality family): the four
    dbt-test archetypes as one summary frame — ``unique`` (duplicate
    o_orderkey rows), ``not_null``/``accepted_range`` (o_totalprice NULL
    or <= 0), ``accepted_values`` (o_orderpriority outside its domain),
    ``referential`` (lineitem rows whose l_orderkey has no parent
    order). Scale shape: the single-table checks are one hash aggregate
    each over a shared scan; the FK check is a LEFT ANTI join that AQE
    turns into a broadcast when the parent's key set fits, otherwise a
    shuffled hash join on the key — never a cartesian. Each check emits
    (check_name, n_violations, n_checked); a clean table grades as
    all-zero violations, which IS the assertion."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    uniq = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("__n"))
        .agg(
            F.lit("unique_o_orderkey").alias("check_name"),
            F.coalesce(F.sum(F.when(F.col("__n") > 1, F.col("__n"))), F.lit(0))
            .cast("long")
            .alias("n_violations"),
            F.sum("__n").cast("long").alias("n_checked"),
        )
    )
    rng = o.agg(
        F.lit("totalprice_positive").alias("check_name"),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_violations"),
        F.count("*").cast("long").alias("n_checked"),
    )
    domain = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    vals = o.agg(
        F.lit("priority_accepted_values").alias("check_name"),
        F.sum(F.when(~F.col("o_orderpriority").isin(domain), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
        F.count("*").cast("long").alias("n_checked"),
    )
    orphans = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count("*").cast("long").alias("n_violations"))
        .select(
            F.lit("fk_lineitem_orders").alias("check_name"),
            "n_violations",
            F.lit(None).cast("long").alias("n_checked"),
        )
    )
    n_li = li.agg(F.count("*").cast("long").alias("__n"))
    orphans = orphans.crossJoin(F.broadcast(n_li)).select(
        "check_name", "n_violations", F.col("__n").alias("n_checked")
    )
    return (
        uniq.unionByName(rng).unionByName(vals).unionByName(orphans)
        .orderBy("check_name")
    )


QUERIES = {
    "q177_constraint_audit": q177_constraint_audit,
}

ORACLES = {
    "q177_constraint_audit": """
WITH u AS (
  SELECT 'unique_o_orderkey' AS check_name,
         CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT) AS n_violations,
         CAST(SUM(n) AS BIGINT) AS n_checked
  FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY o_orderkey)
), r AS (
  SELECT 'totalprice_positive',
         CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                  THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM orders
), v AS (
  SELECT 'priority_accepted_values',
         CAST(SUM(CASE WHEN o_orderpriority NOT IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
             THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM orders
), f AS (
  SELECT 'fk_lineitem_orders',
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)),
         (SELECT COUNT(*) FROM lineitem)
)
SELECT * FROM u UNION ALL SELECT * FROM r
UNION ALL SELECT * FROM v UNION ALL SELECT * FROM f
ORDER BY check_name
""",
}
