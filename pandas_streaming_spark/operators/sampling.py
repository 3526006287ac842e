"""Reproducible sampling / splitting / capping for training-data curation.

Large-scale pipelines never use seeded RNG sampling for dataset cuts:
``F.rand`` is nondeterministic under task retry and unstable across
cluster layouts, so the same command can yield different datasets. The
idiom (used by every major corpus pipeline) is *content-addressed*
bucketing — hash a stable id to a bucket in [0, 100) and cut on bucket
ranges. Deterministic across engines too, which is what makes these
operators oracle-gradable (duckdb computes the identical md5 buckets).

Scale: every operator is a narrow map + filter (no shuffle, no RNG state),
except cap_per_group's one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(id_col: str | Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the id's string form.

    28 hex bits of the digest -> BIGINT -> mod: the same three ops a
    duckdb oracle can run verbatim, unlike Spark's murmur3 ``F.hash``.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 7), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def deterministic_sample(
    df: DataFrame, id_col: str, pct: int, buckets: int = 100
) -> DataFrame:
    """Keep rows whose id hashes into the first ``pct`` of ``buckets`` —
    a reproducible ~pct% sample, stable under retries, re-runs, and
    repartitioning (unlike ``df.sample``)."""
    if not 0 <= pct <= buckets:
        raise ValueError(f"pct must be within [0, {buckets}], got {pct}")
    return df.filter(hash_bucket(id_col, buckets) < pct)


def hash_split(
    df: DataFrame, id_col: str, splits: dict[str, int], buckets: int = 100
) -> DataFrame:
    """Attach a ``split`` column assigning each row to a named cut
    (e.g. {"train": 80, "val": 10, "test": 10}; weights sum to
    ``buckets``). Membership depends only on the id — adding data later
    never moves an existing row across splits (the property training
    pipelines rely on to avoid test-set leakage).

    Bucket ranges are assigned in SORTED name order, so membership is a
    function of the mapping alone: {"train": 80, "val": 10, "test": 10}
    and {"test": 10, "train": 80, "val": 10} give identical assignments
    (dict insertion order used to define the layout — a silent
    row-moving hazard)."""
    if sum(splits.values()) != buckets:
        raise ValueError(f"split weights must sum to {buckets}: {splits}")
    b = hash_bucket(id_col, buckets)
    expr = None
    lo = 0
    for name in sorted(splits):
        cond = b < lo + splits[name]
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += splits[name]
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, int],
    default_pct: int = 0,
    buckets: int = 100,
) -> DataFrame:
    """Per-stratum sampling rates (``df.sampleBy`` shape, but
    content-addressed): keep a row iff its id's hash bucket falls under
    its stratum's percentage. ``fractions`` maps stratum value → pct in
    [0, buckets]; unlisted strata get ``default_pct``.

    The corpus-mixing primitive (e.g. keep 100% of books, 10% of web):
    a narrow map + filter, no shuffle, no RNG — rerunning on a regrown
    input keeps every previously-selected id (same property as
    :func:`deterministic_sample`)."""
    for k, pct in fractions.items():
        if not 0 <= pct <= buckets:
            raise ValueError(f"fraction for {k!r} must be within [0, {buckets}]")
    if not 0 <= default_pct <= buckets:
        raise ValueError(f"default_pct must be within [0, {buckets}]")
    b = hash_bucket(id_col, buckets)
    cut = F.lit(default_pct)
    for value, pct in fractions.items():
        cut = F.when(F.col(strata_col) == value, pct).otherwise(cut)
    return df.filter(b < cut)


def cap_per_group(
    df: DataFrame, group_col: str, order_col: str, n: int
) -> DataFrame:
    """Keep at most ``n`` rows per group, lowest ``order_col`` first —
    the per-source document budget every corpus-mixing recipe applies.
    One shuffle on the group key; the rank filter happens before any
    downstream wide operator sees the data."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample_topk(
    df: DataFrame, id_col: str, weight_col: str, k: int, partition_by: str | None = None
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis A-Res): each row gets key u^(1/w) with u a CONTENT-ADDRESSED
    uniform from the id's md5 (not an RNG — same reasons as
    deterministic_sample: retry-stable, layout-stable, and the duckdb
    oracle computes the identical sample), and the k largest keys per
    partition are the sample. P(selected) ∝ weight, exactly the
    reservoir guarantee, but expressed as a window top-k: one shuffle,
    no sequential reservoir state — the distributed form of weighted
    reservoir sampling.

    Adds ``__ares_rank`` (1..k). Ranking ties break on id for
    determinism; the float keys themselves are never output, so a
    last-ulp pow() divergence between engines could only matter if two
    keys collide to ~1e-16 — content-hashed uniforms make that
    probability ~n²·1e-16 per partition. Rows with ``weight <= 0`` have
    selection probability 0: their key is NULL (sorted after every
    valid key), never an inverted u^(1/negative) ≥ 1.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # u in (0, 1]: (28-bit md5 prefix + 1) / 2^28
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 7), 16, 10)
        .cast("double")
        + 1.0
    ) / F.lit(float(1 << 28))
    # weight <= 0 means P(selected) = 0 — key NULL, sorted after every
    # valid key. Without the guard a negative weight INVERTS the key
    # (u^(1/-w) >= 1) and would be picked FIRST; zero would hit a
    # divide-by-zero under ANSI mode.
    key = F.when(F.col(weight_col) > 0, F.pow(u, 1.0 / F.col(weight_col)))
    part = [partition_by] if partition_by else []
    w = Window.partitionBy(*part).orderBy(
        key.desc_nulls_last(), F.col(id_col)
    )
    return (
        df.withColumn("__ares_rank", F.row_number().over(w))
        .where(F.col("__ares_rank") <= k)
    )
