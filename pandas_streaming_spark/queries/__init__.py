"""The graded query surface (SURVEY.md §2.10): Q01–Q48 plus LLM-pipeline
extras. Each query is a ``(spark, sf_dir) -> DataFrame`` callable in
``QUERIES`` with a duckdb-runnable oracle SQL string in ``ORACLES``
(same column names — the driver hashes column-name-sorted values).

Queries without an oracle entry (genuinely non-SQL-expressible ops) get
the driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pandas_streaming_spark.queries import (
    analytic,
    llm,
    scalarfn,
    streaming_q,
    tpch,
    udf_q,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (tpch, analytic, scalarfn, llm, streaming_q, udf_q):
    QUERIES.update(mod.QUERIES)
    ORACLES.update({k: v for k, v in mod.ORACLES.items() if v is not None})
