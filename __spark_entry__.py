"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (Q01 pricing summary) at
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2.10 with its duckdb oracle. The engine lives in
``pandas_streaming_spark/`` — this module is only the wiring.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Wire the vendored protobuf runtime onto PYTHONPATH at IMPORT time:
# transformWithStateInPandas (q111) spawns JVM-launched Python workers
# that inherit the environment the JVM snapshotted at launch, so this
# must happen before the driver builds its SparkSession. Idempotent,
# no-op when a real protobuf install exists.
from pandas_streaming_spark.compat import ensure_protobuf as _ensure_protobuf

_ensure_protobuf()


def _configure(spark: SparkSession) -> SparkSession:
    """Apply the session confs the engine needs on a driver-provided
    session (idempotent; matches pandas_streaming_spark.session)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; catalog handles long-ns either way
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pandas_streaming_spark.queries import QUERIES

    _configure(spark)
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    from pandas_streaming_spark.queries import QUERIES

    return {
        name: (lambda spark, sf_dir, _fn=fn: _fn(_configure(spark), sf_dir))
        for name, fn in QUERIES.items()
    }


def oracle_sql() -> dict[str, str]:
    """duckdb-runnable oracle SQL per query (omissions = rows-only ops)."""
    from pandas_streaming_spark.queries import ORACLES

    return dict(ORACLES)
