"""Property test: funnel_counts == a pure-Python sequential-min funnel on
randomized event streams (same differential idiom as the as-of property
test, SURVEY.md §5.1). Exercises equal-timestamp ties, repeated stages,
out-of-order stage types, and users missing stages entirely.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pandas_streaming_spark.operators.funnel import funnel_counts

STAGES = ["s1", "s2", "s3"]

ROW = st.tuples(
    st.integers(min_value=0, max_value=3),   # user
    st.integers(min_value=0, max_value=8),   # time (seconds; small => ties)
    st.sampled_from(STAGES + ["other"]),     # event type
)


def _py_funnel(rows: list[tuple[int, int, str]]) -> dict[str, int]:
    """Reference implementation: t_k = min ts of stage-k events strictly
    after t_{k-1}, computed per user by exhaustive search."""
    counts = dict.fromkeys(STAGES, 0)
    for u in {r[0] for r in rows}:
        ev = [(t, s) for (uu, t, s) in rows if uu == u]
        prev = None
        for stage in STAGES:
            cand = [
                t for (t, s) in ev
                if s == stage and (prev is None or t > prev)
            ]
            if not cand:
                break
            prev = min(cand)
            counts[stage] += 1
    return counts


def _ts(sec: int) -> pd.Timestamp:
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec)


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(rows=st.lists(ROW, min_size=1, max_size=24))
def test_funnel_matches_python_reference(spark, rows):
    pdf = pd.DataFrame(
        [(u, _ts(t), s) for (u, t, s) in rows],
        columns=["user_id", "ts", "event_type"],
    )
    out = funnel_counts(spark.createDataFrame(pdf), STAGES).collect()
    got = {r["stage"]: r["n_users"] for r in out}
    assert got == _py_funnel(rows)


def _py_funnel_gap(rows: list[tuple[int, int, str]], gap: int) -> dict[str, int]:
    """Reference for the conversion-window variant: stage k must land in
    (t_{k-1}, t_{k-1} + gap]; the anchor is first-touch and never
    re-opens."""
    counts = dict.fromkeys(STAGES, 0)
    for u in {r[0] for r in rows}:
        ev = [(t, s) for (uu, t, s) in rows if uu == u]
        prev = None
        for stage in STAGES:
            cand = [
                t for (t, s) in ev
                if s == stage
                and (prev is None or (prev < t <= prev + gap))
            ]
            if not cand:
                break
            prev = min(cand)
            counts[stage] += 1
    return counts


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(rows=st.lists(ROW, min_size=1, max_size=24))
def test_funnel_gap_matches_python_reference(spark, rows):
    pdf = pd.DataFrame(
        [(u, _ts(t), s) for (u, t, s) in rows],
        columns=["user_id", "ts", "event_type"],
    )
    out = funnel_counts(
        spark.createDataFrame(pdf), STAGES, max_gap_seconds=3.0
    ).collect()
    got = {r["stage"]: r["n_users"] for r in out}
    assert got == _py_funnel_gap(rows, 3)


@settings(max_examples=200, deadline=None)
@given(
    qs=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40),
    budget=st.integers(min_value=0, max_value=120),
)
def test_quota_allocation_telescopes(qs, budget):
    """q205's load-bearing identity: the greedy fold min(q, remaining)
    equals the closed form min(S_i, B) - min(S_{i-1}, B) for every
    prefix — i.e. one-sided allocation is window-expressible. (Pure
    Python: this is the algebra the query plan relies on, independent
    of Spark.)"""
    remaining = budget
    s = 0
    for q in qs:
        greedy = min(q, max(0, remaining))
        closed = min(s + q, budget) - min(s, budget)
        assert greedy == closed
        remaining -= greedy
        s += q
