"""pandas_streaming_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference stream-processor
``dask/pandas-streaming`` (see SURVEY.md; the reference tree at
/root/reference/ was empty, so SURVEY.md §2 is the declared contract).

Design: everything is expressed through the Spark DataFrame / SQL API so
Catalyst + Tungsten own the physical plan (predicate pushdown, column
pruning, broadcast-vs-shuffle join selection, whole-stage codegen, AQE).
Python touches data only behind Arrow (pandas_udf / applyInPandas) and only
where built-in operators genuinely cannot express the semantics (as-of join
fallback, custom stateful streaming ops, multimodal decode stubs).

Layout
------
- ``session``    tuned SparkSession factory (AQE, Arrow, UTC, broadcast)
- ``catalog``    testdata parquet loaders / temp-view registration
- ``functions``  vector & hashing column expressions (cosine, minhash, ...)
- ``operators``  as-of join, dedup family, similarity search, text analysis
- ``sources``    batch/streaming source helpers incl. deterministic replay
- ``streaming``  replay harness + stateful operators (final-state grading)
- ``queries``    the graded Q01–Q48 surface + LLM-pipeline extras, each as
                 a (spark, sf_dir) -> DataFrame callable with a duckdb
                 oracle SQL string (SURVEY.md §2.10)
- ``plans``      explain/plan inspection helpers + 100 TB tuning notes
"""

__version__ = "0.1.0"

from pandas_streaming_spark.session import get_spark  # noqa: F401
