"""Differential-test harness: Spark result vs duckdb oracle.

Mirrors the driver's t2 gate (SURVEY.md §2.10 / FIXTURES.md): run the
engine query and the oracle SQL over the same parquet, sort columns by
name, compare row multisets of stringified values. Used by tests/ and for
local iteration; the driver runs its own equivalent per round.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from pandas_streaming_spark.catalog import TABLES


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table: a DIRECTORY of part files (the datagen
            # scaled replicas) — duckdb needs the glob form
            p = f"{p}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    return con


def _cell(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if math.isinf(v):
            return repr(v)  # int(inf) raises; report the cell, don't crash
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))  # 3.0 and 3 stringify alike
        return repr(v)
    # canonicalize date-ish cells: a DATE and a midnight TIMESTAMP agree
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        if isinstance(v, pd.Timestamp) and pd.isna(v):
            return "NULL"
        s = pd.Timestamp(v).isoformat(sep=" ")
        return s[:-9] if s.endswith(" 00:00:00") else s
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def normalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Column-name-sorted, row-order-insensitive stringified rows."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_cell(v) for v in row))
    return sorted(out)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""

    def __bool__(self) -> bool:
        return self.ok


def _dtype_class(dtype) -> str:
    """Collapse a pandas dtype to the class the driver's value hash keys on.

    int widths (int32 vs int64) are equivalent, but int-vs-float is NOT:
    duckdb renders SUM(BIGINT) as DECIMAL128 -> float64 while Spark casts
    to long, and the driver hashes `57.0` != `57`. That exact divergence
    shipped q45 red in round 2 because compare used to equate 3.0 == 3;
    dtype classes must now match before values are compared.
    """
    k = dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    return "object"


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return CompareResult(
            name, False, len(spark_pdf), len(oracle_pdf),
            f"column mismatch: spark={s_cols} oracle={o_cols}",
        )
    bad = [
        f"{c}: spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}"
        for c in s_cols
        if _dtype_class(spark_pdf[c].dtype) != _dtype_class(oracle_pdf[c].dtype)
    ]
    if bad:
        return CompareResult(
            name, False, len(spark_pdf), len(oracle_pdf),
            "dtype mismatch (cast the oracle output, e.g. CAST(SUM(x) AS BIGINT)): "
            + "; ".join(bad),
        )
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    if len(s) != len(o):
        return CompareResult(name, False, len(s), len(o), "row count mismatch")
    for i, (a, b) in enumerate(zip(s, o)):
        if a != b:
            return CompareResult(
                name, False, len(s), len(o),
                f"first diff at sorted row {i}: spark={a} oracle={b} (cols={s_cols})",
            )
    return CompareResult(name, True, len(s), len(o))


def run_compare(name: str, spark, query_fn, oracle_sql: str, sf_dir: str) -> CompareResult:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_connect(sf_dir)
    try:
        oracle_pdf = con.execute(oracle_sql).df()
    finally:
        con.close()
    return compare_frames(name, spark_pdf, oracle_pdf)
