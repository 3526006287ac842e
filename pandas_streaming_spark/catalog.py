"""Testdata catalog: parquet loaders + temp-view registration.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file per table
under ``{sf_dir}/``.

At 100 TB the same API points at a partitioned lakehouse layout instead of
single files; loaders keep using ``spark.read.parquet`` so partition
pruning and predicate pushdown apply unchanged. See ``plans.scale_notes``
for the recommended physical layout per table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        try:
            df = spark.read.parquet(table_path(sf_dir, name))
        except Exception:
            # session without spark.sql.legacy.parquet.nanosAsLong rejects
            # the TIMESTAMP(NANOS) column outright (PARQUET_TYPE_ILLEGAL);
            # fall back to an Arrow-side ns->µs cast. Fine at test scale;
            # a cluster deployment sets the conf instead.
            return _events_via_arrow(spark, table_path(sf_dir, name))
        return _normalize_event_ts(df)
    return spark.read.parquet(table_path(sf_dir, name))


def _events_via_arrow(spark: SparkSession, path: str) -> DataFrame:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    schema = pa.schema(
        [
            f.with_type(pa.timestamp("us")) if pa.types.is_timestamp(f.type) else f
            for f in table.schema
        ]
    )
    return _normalize_event_ts(
        spark.createDataFrame(table.cast(schema, safe=False).to_pandas())
    )


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to µs TIMESTAMP (instant/LTZ) whatever form the
    parquet delivers:

    - TIMESTAMP(NANOS) + ``spark.sql.legacy.parquet.nanosAsLong`` → long
      nanos: floor-divide to µs (integer div — the value exceeds double
      precision) and rebuild, matching duckdb's ns→µs truncation.
    - naive timestamp[us] (isAdjustedToUTC=false → TIMESTAMP_NTZ): cast to
      TIMESTAMP — a pure type adjustment under the pinned UTC session
      timezone, and what streaming needs (withWatermark/session_window
      reject NTZ event-time columns).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL-flavored queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Write ``df`` as a bucketed (optionally sort-within-bucket) managed
    table and return the re-read frame.

    This is the 100 TB answer to the fact-fact shuffle: two tables
    bucketed by the same key into the same bucket count join with NO
    Exchange (and with ``sort_cols`` = join key, no Sort either) — the
    scaled100 bench shows the lineitem⋈orders SMJ sort is exactly what
    dominates a single machine at 60M rows, and on a cluster it is the
    shuffle you pay on every repeated join. Bucket once, join many.
    Verified by tests/test_plans.py::test_bucketed_fact_join_is_exchange_free.
    """
    # the default in-memory catalog forgets managed tables between
    # sessions while their spark-warehouse dirs persist; clear both so
    # overwrite cannot hit LOCATION_ALREADY_EXISTS on a leftover dir.
    # The {warehouse}/{name} path derivation below only holds for an
    # UNQUALIFIED default-database name on a local warehouse (a db.tbl
    # name lives under {wh}/{db}.db/, a remote warehouse isn't an OS
    # path) — assert rather than silently miss the stale dir (ADVICE r4).
    if "." in table_name:
        raise ValueError(
            "write_bucketed supports unqualified default-database table "
            f"names only (got {table_name!r}); qualified names would "
            "defeat the stale-warehouse-dir cleanup"
        )
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    import shutil
    from urllib.parse import urlparse

    wh_uri = spark.conf.get("spark.sql.warehouse.dir")
    parsed = urlparse(wh_uri)
    if parsed.scheme in ("", "file"):
        shutil.rmtree(f"{parsed.path}/{table_name.lower()}", ignore_errors=True)
    # non-local warehouse: DROP TABLE above is authoritative; there is no
    # orphan-dir failure mode because the catalog is durable there

    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
    return spark.table(table_name)
