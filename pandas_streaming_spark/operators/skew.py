"""Skew mitigation helpers (SURVEY.md §4.2 item 6).

AQE's skew-join splitting (on in session.py) handles most runtime skew;
these helpers cover the two cases AQE can't:

- ``salted_groupby``: a single hot group key overwhelms one reducer in an
  aggregation. Two-phase: aggregate on (key, salt) — the hot key spreads
  over ``salt`` reducers — then combine partials on the key. Only
  algebraic aggregates decompose this way (sum/count/min/max, and avg as
  sum+count), which is exactly what's offered.
- ``salted_join``: a broadcast-ineligible dimension joined on a skewed
  fact key. The fact side gets a random salt in [0, n); the dim side is
  replicated n× (explode over the salt range) so every salted fact
  partition finds its dim row. Dim grows n× — use only when the dim is
  mid-sized (too big to broadcast, far smaller than the fact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy: ``aggs`` maps output name ->
    (column, how) with how in sum/count/min/max/avg.

    Result equals ``df.groupBy(keys).agg(...)``; the difference is purely
    physical — the first shuffle key space is |keys| × salt.
    """
    phase1_exprs, phase2_exprs = [], []
    for name, (col, how) in aggs.items():
        if how == "avg":
            phase1_exprs += [
                F.sum(col).alias(f"__s_{name}"),
                F.count(col).alias(f"__c_{name}"),
            ]
            phase2_exprs.append(
                (F.sum(f"__s_{name}") / F.sum(f"__c_{name}")).alias(name)
            )
        elif how in _DECOMPOSABLE:
            partial, combine = _DECOMPOSABLE[how]
            phase1_exprs.append(partial(col).alias(f"__p_{name}"))
            phase2_exprs.append(combine(f"__p_{name}").alias(name))
        else:
            raise ValueError(
                f"{how!r} is not algebraic; use exact groupBy or rewrite"
            )
    salted = df.withColumn("__salt", _deterministic_salt(df, salt))
    phase1 = salted.groupBy(*keys, "__salt").agg(*phase1_exprs)
    return phase1.groupBy(*keys).agg(*phase2_exprs)


def _deterministic_salt(df: DataFrame, salt: int):
    """Salt in [0, salt) derived from the row content, not ``F.rand``.

    A nondeterministic shuffle key is unsafe under task retry /
    speculative execution: a re-executed map task would re-assign rows to
    different reducers than the partial fetch already consumed. Hashing
    the row keeps re-execution byte-identical. Duplicate rows share a
    bucket, which only costs balance, never correctness.
    """
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(salt)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join by salting the fact key and
    replicating the dim ``salt``×. Semantically identical to
    ``fact.join(dim, key, how)`` for ``how`` in {inner, left}; right/full
    outer would emit each unmatched dim row once per replica, so they are
    rejected."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left only, got {how!r}: the dim side "
            "is replicated salt x, so right/full outer would duplicate "
            "unmatched dim rows"
        )
    f = fact.withColumn("__salt", _deterministic_salt(fact, salt))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>"))
    )
    out = f.join(d, on=[key, "__salt"], how=how)
    return out.drop("__salt")
