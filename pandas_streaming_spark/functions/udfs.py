"""UDF surface (SURVEY.md §2.9 rows 1–5): every Python-extension flavor
Spark offers, each with its place documented. The engine's rule: built-in
expressions first; when Python is unavoidable, Arrow-batched pandas UDFs
(vectorized, ~10-100x row-at-a-time) — the plain Python UDF exists for
API parity and is deliberately discouraged.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType


# -- row-at-a-time Python UDF (slow path; API parity only) ---------------
def _py_strlen(s):
    # No type hints: Spark 4's F.udf tries Arrow eval-type inference on
    # scalar hints and warns "Cannot infer the eval type" for this shape.
    return len(s) if s is not None else None


py_strlen = F.udf(_py_strlen, LongType())
py_strlen.__doc__ = (
    "Row-scalar Python UDF example. Every row crosses the JVM<->Python "
    "boundary individually — use length() / a pandas_udf instead."
)


# -- vectorized scalar pandas UDF (Arrow batches) ------------------------
@F.pandas_udf(DoubleType())
def sigmoid100(v: pd.Series) -> pd.Series:
    """Vectorized scalar transform: sigmoid(value/100), NumPy on Arrow
    batches."""
    return 1.0 / (1.0 + np.exp(-v / 100.0))


# -- grouped-aggregate pandas UDF (UDAF) ---------------------------------
@F.pandas_udf(DoubleType())
def geometric_mean(v: pd.Series) -> float:
    """UDAF: geometric mean of a positive column per group."""
    arr = v.to_numpy(dtype=np.float64)
    arr = arr[arr > 0]
    if len(arr) == 0:
        return float("nan")
    return float(np.exp(np.log(arr).mean()))


# -- grouped map (UDTF-style pandas DF -> DF per group) ------------------
def zscore_per_group(
    df: DataFrame, key: str, value_col: str, out_col: str = "z"
) -> DataFrame:
    """applyInPandas: per-key z-score normalization (ddof=1), the
    reference's `map_partitions`-with-groupby idiom."""
    schema = ", ".join(
        [f"{key} long", f"{value_col} double", f"{out_col} double"]
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf[value_col].mean()
        sd = pdf[value_col].std(ddof=1)
        # sd NaN (single row) or 0 (constant group) -> NULL, matching the
        # SQL (value - mu) / NULLIF(stddev, 0) semantics of the oracle.
        z = (pdf[value_col] - mu) / sd if sd and sd > 0 else pdf[value_col] * np.nan
        return pd.DataFrame(
            {key: pdf[key], value_col: pdf[value_col], out_col: z}
        )

    return df.select(key, value_col).groupBy(key).applyInPandas(norm, schema)


# -- iterator-of-batches map (mapInPandas; table-function shape) ---------
def explode_tokens_batched(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """mapInPandas as a row→rows table function: one input row yields one
    row per token. (multimodal decode in operators/ uses the same shape.)"""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf[text_col].str.split(" ")
            out = pdf[[id_col]].join(toks.rename("token")).explode("token")
            yield out[[id_col, "token"]]

    return df.select(id_col, text_col).mapInPandas(gen, f"{id_col} long, token string")


# -- Python UDTF (Spark 3.5+/4 user-defined TABLE function) --------------
@F.udtf(returnType="pos: int, term: string")
class PositionedTokensUDTF:
    """Row→rows as a first-class SQL table function: invoked with
    ``LATERAL positioned_tokens(t.text)`` so the optimizer sees a real
    generator, composable in FROM clauses — the declarative counterpart
    of :func:`explode_tokens_batched`. Built-in
    ``posexplode(split(...))`` stays the hot-path choice (JVM-side);
    the UDTF earns its keep when per-row Python logic genuinely can't be
    an expression, and this one exists to grade the plumbing (q120).
    """

    def eval(self, text: str):
        if text:
            for i, term in enumerate(text.split(" ")):
                yield i + 1, term
