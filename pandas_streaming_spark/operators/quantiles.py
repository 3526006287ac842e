"""Corpus quantile operators: exact percentiles, percentile binning
(reference `describe`/`quantile` family, SURVEY.md §2.4; the binning
form is the training-data curation primitive "keep the middle N% by
length/quality").

Scale shape — the reason this module exists as more than one expression:
assigning every row its corpus percentile NAIVELY is a global sort
(`ntile` over one partition — the exact anti-pattern scale_notes.md bans
at 100 TB). Instead:

1. one pass computes the exact boundary values (``percentile``: Spark's
   built-in exact interpolated percentile, a single-row aggregate that
   map-side combines);
2. the boundaries — a handful of doubles — broadcast;
3. bin assignment is a narrow per-row comparison chain (codegen'd, no
   shuffle, no sort).

Equivalent to two linear passes over the data; the only sorted thing is
the per-partition quantile summary inside Spark's aggregate. duckdb's
``QUANTILE_CONT`` uses the same (n-1)p linear-interpolation definition,
so boundaries agree bit-for-bit on integer inputs (p in quarters/tenths
→ the fraction is exact in binary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_percentiles(
    df: DataFrame, value_col: str, probs: list[float]
) -> DataFrame:
    """One-row frame of exact interpolated percentiles ``p_0..p_{k-1}``
    of ``value_col`` (Spark SQL ``percentile`` — exact, unlike
    ``percentile_approx``; use the approx form at 100 TB when ±0.1% is
    acceptable and the value domain is huge)."""
    arr = F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs]))
    return df.agg(
        *[arr[i].alias(f"p{int(p * 100):02d}") for i, p in enumerate(probs)]
    )


def percentile_bins(
    df: DataFrame, value_col: str, probs: list[float]
) -> DataFrame:
    """Assign every row its corpus-percentile bin WITHOUT a global sort.

    Bin b = number of boundaries strictly below the row's value, so bin 0
    is [min, p_0] and bin k is (p_{k-1}, max]. Rows on a boundary fall in
    the lower bin (``value > boundary`` is exact: boundaries are either
    integers or .25/.5/.75 fractions of adjacent integers — no float tie
    ambiguity against integer values).

    Plan: aggregate (1 row) → broadcast crossJoin → narrow comparison.
    """
    bounds = F.broadcast(
        exact_percentiles(df, value_col, probs).select(
            F.array(*[f"p{int(p * 100):02d}" for p in probs]).alias("__bounds")
        )
    )
    bin_expr = F.aggregate(
        F.col("__bounds"),
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(value_col) > b, 1).otherwise(0),
    )
    return (
        df.crossJoin(bounds)
        .withColumn("bin", bin_expr.cast("int"))
        .drop("__bounds")
    )


def approx_quantile_audit(
    df: DataFrame, value_col: str, prob: float = 0.5, accuracy: int = 1000
) -> DataFrame:
    """In-engine audit of ``percentile_approx``'s rank-error guarantee —
    the q108/q109/q110 pattern applied to sketches: the SKETCH VALUE is
    not partition-stable (merge order moves it), so it can't be
    hash-graded, but the Greenwald–Khanna CONTRACT (rank error
    ≤ n/accuracy) must hold for every partitioning, and the exact
    quantile is deterministic. Output: ``n``, ``exact`` (interpolated
    percentile), ``rank_err_ok`` — a pruning/merge bug in the approx
    path flips the boolean instead of silently grading green.

    This is also the 100 TB guidance encoded as a check: exact
    ``percentile`` buffers values per group and is for oracle/audit
    scale; production quantiles at corpus scale use the sketch, and
    this audit is how you trust it.
    """
    approx = df.agg(
        F.percentile_approx(F.col(value_col), F.lit(prob), F.lit(accuracy)).alias(
            "__a"
        )
    )
    stats = df.crossJoin(F.broadcast(approx)).agg(
        F.count("*").alias("n"),
        F.percentile(F.col(value_col), F.lit(prob)).alias("exact"),
        F.sum(F.when(F.col(value_col) <= F.col("__a"), 1).otherwise(0)).alias(
            "__rank"
        ),
    )
    # GK guarantee: a value whose rank is within eps*n of ceil(p*n);
    # +1 slack for the <=-vs-< rank convention at exact ties
    bound = F.ceil(F.col("n") / F.lit(accuracy)) + 1
    target = F.ceil(F.lit(prob) * F.col("n"))
    return stats.select(
        "n",
        "exact",
        (F.abs(F.col("__rank") - target) <= bound).alias("rank_err_ok"),
    )


def group_quantiles(
    df: DataFrame, group_col: str, value_col: str, probs: list[float]
) -> DataFrame:
    """Per-group exact interpolated percentiles — one hash-aggregate
    shuffle on the group key (each group's quantile summary combines
    map-side; no global sort, no per-group collect)."""
    arr = F.percentile(F.col(value_col), F.array(*[F.lit(p) for p in probs]))
    agg = df.groupBy(group_col).agg(arr.alias("__q"))
    return agg.select(
        group_col,
        *[
            F.col("__q")[i].alias(f"p{int(p * 100):02d}")
            for i, p in enumerate(probs)
        ],
    )
