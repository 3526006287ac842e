"""Property test: asof_join == pandas merge_asof on randomized inputs
(the reference's own differential-test idiom, SURVEY.md §5.1, with
hypothesis driving the cases).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pandas_streaming_spark.operators.asof import asof_join

ROW = st.tuples(
    st.integers(min_value=0, max_value=2),          # key
    st.integers(min_value=0, max_value=50),         # time (seconds)
    st.floats(min_value=-100, max_value=100, allow_nan=False),
)


def _ts(sec: int) -> pd.Timestamp:
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec)


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(
    left_rows=st.lists(ROW, min_size=1, max_size=12),
    right_rows=st.lists(ROW, min_size=0, max_size=12),
)
def test_asof_matches_pandas_merge_asof(spark, left_rows, right_rows):
    left = pd.DataFrame(
        [(k, _ts(t), i) for i, (k, t, _) in enumerate(left_rows)],
        columns=["k", "t", "lid"],
    )
    right = pd.DataFrame(
        [(k, _ts(t), v, i) for i, (k, t, v) in enumerate(right_rows)],
        columns=["k", "rt", "v", "ord"],
    )

    sl = spark.createDataFrame(left)
    sr = (
        spark.createDataFrame(right)
        if len(right)
        else spark.createDataFrame([], "k bigint, rt timestamp, v double, ord bigint")
    )
    got = (
        asof_join(sl, sr, key="k", left_time="t", right_time="rt",
                  value_cols=["v"], right_ord="ord")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    # pandas oracle: sorted merge_asof per key; among equal right
    # timestamps the max-ord row wins (sort puts it last)
    lsorted = left.sort_values(["t", "lid"]).reset_index(drop=True)
    rsorted = right.sort_values(["rt", "ord"]).reset_index(drop=True)
    if len(rsorted):
        exp = pd.merge_asof(
            lsorted, rsorted[["k", "rt", "v"]], left_on="t", right_on="rt", by="k"
        )
    else:
        exp = lsorted.assign(v=float("nan"))
    exp = exp.sort_values("lid").reset_index(drop=True)

    got_v = got["v"].astype("float64")
    exp_v = exp["v"].astype("float64")
    pd.testing.assert_series_equal(got_v, exp_v, check_names=False)


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(
    left_rows=st.lists(ROW, min_size=1, max_size=12),
    right_rows=st.lists(ROW, min_size=0, max_size=12),
    direction=st.sampled_from(["forward", "nearest"]),
)
def test_asof_directions_match_pandas(spark, left_rows, right_rows, direction):
    """forward/nearest vs pd.merge_asof(direction=...). The right side is
    deduplicated to one row per (k, rt) (max ord) first — pandas' dup-ts
    tie rule differs per direction, and the implementation documents its
    own; semantics on unique timestamps are what this pins."""
    left = pd.DataFrame(
        [(k, _ts(t), i) for i, (k, t, _) in enumerate(left_rows)],
        columns=["k", "t", "lid"],
    )
    right = (
        pd.DataFrame(
            [(k, _ts(t), v, i) for i, (k, t, v) in enumerate(right_rows)],
            columns=["k", "rt", "v", "ord"],
        )
        .sort_values("ord")
        .groupby(["k", "rt"], as_index=False)
        .last()
    )

    sl = spark.createDataFrame(left)
    sr = (
        spark.createDataFrame(right[["k", "rt", "v", "ord"]])
        if len(right)
        else spark.createDataFrame([], "k bigint, rt timestamp, v double, ord bigint")
    )
    got = (
        asof_join(sl, sr, key="k", left_time="t", right_time="rt",
                  value_cols=["v"], right_ord="ord", direction=direction)
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    lsorted = left.sort_values(["t", "lid"]).reset_index(drop=True)
    rsorted = right.sort_values(["rt"]).reset_index(drop=True)
    if len(rsorted):
        exp = pd.merge_asof(
            lsorted, rsorted[["k", "rt", "v"]], left_on="t", right_on="rt",
            by="k", direction=direction,
        )
    else:
        exp = lsorted.assign(v=float("nan"))
    exp = exp.sort_values("lid").reset_index(drop=True)

    pd.testing.assert_series_equal(
        got["v"].astype("float64"), exp["v"].astype("float64"), check_names=False
    )


@pytest.mark.slow
@settings(max_examples=10, deadline=None)
@given(
    left_rows=st.lists(ROW, min_size=1, max_size=10),
    right_rows=st.lists(ROW, min_size=0, max_size=10),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    allow_exact=st.booleans(),
    tol=st.sampled_from([None, 3, 10]),
)
def test_asof_tolerance_and_exact_match_pandas(
    spark, left_rows, right_rows, direction, allow_exact, tol
):
    """Full pd.merge_asof parameter surface (tolerance seconds +
    allow_exact_matches) on a right side deduplicated to unique (k, rt)."""
    left = pd.DataFrame(
        [(k, _ts(t), i) for i, (k, t, _) in enumerate(left_rows)],
        columns=["k", "t", "lid"],
    )
    right = (
        pd.DataFrame(
            [(k, _ts(t), v, i) for i, (k, t, v) in enumerate(right_rows)],
            columns=["k", "rt", "v", "ord"],
        )
        .sort_values("ord")
        .groupby(["k", "rt"], as_index=False)
        .last()
    )

    sl = spark.createDataFrame(left)
    sr = (
        spark.createDataFrame(right[["k", "rt", "v", "ord"]])
        if len(right)
        else spark.createDataFrame([], "k bigint, rt timestamp, v double, ord bigint")
    )
    got = (
        asof_join(
            sl, sr, key="k", left_time="t", right_time="rt",
            value_cols=["v"], right_ord="ord", direction=direction,
            tolerance=tol, allow_exact_matches=allow_exact,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    lsorted = left.sort_values(["t", "lid"]).reset_index(drop=True)
    rsorted = right.sort_values(["rt"]).reset_index(drop=True)
    if len(rsorted):
        exp = pd.merge_asof(
            lsorted, rsorted[["k", "rt", "v"]], left_on="t", right_on="rt",
            by="k", direction=direction, allow_exact_matches=allow_exact,
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        )
    else:
        exp = lsorted.assign(v=float("nan"))
    exp = exp.sort_values("lid").reset_index(drop=True)

    pd.testing.assert_series_equal(
        got["v"].astype("float64"), exp["v"].astype("float64"), check_names=False
    )
