"""Property test: session_window boundary semantics at the 30-minute gap.

q45's correctness rests on one oracle; this pins the exact boundary rule
against a Python reference fold. Writing this test found a real boundary
divergence the oracle originally masked: Spark MERGES an event at exactly
last_ts + gap (touching windows coalesce — the window [t, t+gap) and an
event at t+gap form one session), so a new session starts only when
gap > 30 min STRICTLY; the oracle's original `>= INTERVAL 30 MINUTE`
disagreed on a measure-zero case real µs-random data never hits. Gaps
are drawn to straddle the boundary by single microseconds, the timestamp
resolution the testdata's ns→µs truncation produces.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds
EPOCH = datetime.datetime(2024, 1, 1)

# straddle the boundary by 1 µs, plus in-session and way-out gaps
GAPS = st.sampled_from(
    [0, 1, 1_000_000, GAP_US - 1, GAP_US, GAP_US + 1, 2 * GAP_US]
)


def _sessions_ref(gaps_us: list[int]) -> list[int]:
    """Python reference: event count per session for one user whose
    inter-event gaps are ``gaps_us`` (first event at the epoch)."""
    sizes = [1]
    for g in gaps_us:
        if g > GAP_US:  # strictly: gap == threshold still merges
            sizes.append(1)
        else:
            sizes[-1] += 1
    return sorted(sizes)


@pytest.mark.slow
@settings(max_examples=10, deadline=None)
@given(gaps_us=st.lists(GAPS, min_size=0, max_size=10))
def test_session_window_boundary_matches_reference(spark, gaps_us):
    ts, rows = EPOCH, [(1, EPOCH)]
    for g in gaps_us:
        ts = ts + datetime.timedelta(microseconds=g)
        rows.append((1, ts))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        r["n"]
        for r in df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == _sessions_ref(gaps_us)


def test_session_window_exact_boundary_splits(spark):
    """Deterministic pin of the ±1 µs cases (no hypothesis shrink noise)."""
    t0 = EPOCH
    exactly = t0 + datetime.timedelta(microseconds=GAP_US)
    just_over = t0 + datetime.timedelta(microseconds=GAP_US + 1)

    def n_sessions(ts2):
        df = spark.createDataFrame([(1, t0), (1, ts2)], "user_id long, ts timestamp")
        return (
            df.groupBy(F.session_window("ts", "30 minutes"), "user_id").count().count()
        )

    assert n_sessions(exactly) == 1  # touching windows merge
    assert n_sessions(just_over) == 2
