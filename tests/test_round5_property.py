"""Property tests for the round-5 operators (the reference's
differential-test idiom, SURVEY.md §5.1): randomized inputs, an
independent pure-Python/pandas reference implementation, exact equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=1000), min_size=4, max_size=40
    )
)
def test_percentile_bins_matches_numpy(spark, values):
    """Bin of each value == count of numpy-quantile boundaries strictly
    below it (quarter probs: boundaries exact in both engines)."""
    from pandas_streaming_spark.operators.quantiles import percentile_bins

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, v long")
    got = {
        r["i"]: r["bin"]
        for r in percentile_bins(df, "v", [0.25, 0.5, 0.75]).collect()
    }
    bounds = np.quantile(np.array(values, dtype=np.float64), [0.25, 0.5, 0.75])
    for i, v in enumerate(values):
        assert got[i] == int(sum(v > b for b in bounds)), (v, bounds)


@pytest.mark.slow
@settings(max_examples=8, deadline=None)
@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),      # key
            st.integers(min_value=0, max_value=10_000),  # t (seconds, dedup'd)
            st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
        ),
        min_size=2,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),
    )
)
def test_interpolate_matches_reference(spark, obs):
    """interpolate_linear == a direct per-key implementation of
    time-weighted linear interpolation (leading/trailing NULLs stay
    NULL)."""
    from pandas_streaming_spark.operators.resample import interpolate_linear

    rows = [
        (
            k,
            (pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=t)).to_pydatetime(),
            None if v is None else float(v),
        )
        for k, t, v in obs
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {
        (r["k"], r["ts"]): r["interp_e4"]
        for r in interpolate_linear(df, "k", "ts", "v").collect()
    }

    import math

    def half_away(x: float) -> int:
        # Spark F.round is HALF_UP (away from zero); Python round() is
        # banker's — a .5 interpolant would falsely fail without this
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    pdf = pd.DataFrame(rows, columns=["k", "ts", "v"]).sort_values(["k", "ts"])
    for k, grp in pdf.groupby("k"):
        ts = grp["ts"].tolist()
        vs = grp["v"].tolist()
        obs_idx = [i for i, v in enumerate(vs) if v is not None and not pd.isna(v)]
        for i, (t, v) in enumerate(zip(ts, vs)):
            expected = None
            if v is not None and not pd.isna(v):
                expected = half_away(float(v) * 1e4)
            else:
                prevs = [j for j in obs_idx if j < i]
                nexts = [j for j in obs_idx if j > i]
                if prevs and nexts:
                    jp, jn = prevs[-1], nexts[0]
                    tp, tn = ts[jp].value // 1000, ts[jn].value // 1000
                    tt = t.value // 1000
                    expected = half_away(
                        float(vs[jp]) * 1e4
                        + (float(vs[jn]) - float(vs[jp]))
                        * 1e4
                        * (tt - tp)
                        / (tn - tp)
                    )
            assert got[(k, t)] == expected, (k, t, got[(k, t)], expected)


@pytest.mark.slow
@settings(max_examples=6, deadline=None)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=3, max_size=8),
        min_size=1,
        max_size=5,
    ),
    shard=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=3, max_size=8),
        min_size=1,
        max_size=5,
    ),
)
def test_dedup_against_corpus_matches_bruteforce(spark, corpus, shard):
    """is_dup flags == brute-force distinct-2-shingle Jaccard >= 0.5
    between every (shard, corpus) doc pair."""
    from pandas_streaming_spark.operators.dedup import dedup_against_corpus

    def text(tokens):
        return " ".join(tokens)

    def shingles(tokens, k=2):
        return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}

    corpus_rows = [(i, text(t)) for i, t in enumerate(corpus)]
    shard_rows = [(100 + i, text(t)) for i, t in enumerate(shard)]
    got = {
        r["doc_id"]: r["is_dup"]
        for r in dedup_against_corpus(
            spark.createDataFrame(shard_rows, "doc_id long, text string"),
            spark.createDataFrame(corpus_rows, "doc_id long, text string"),
            k=2,
            threshold=0.5,
        ).collect()
    }
    for sid, stoks in zip([r[0] for r in shard_rows], shard):
        ss = shingles(stoks)
        expect = any(
            ss
            and shingles(ctoks)
            and len(ss & shingles(ctoks))
            / len(ss | shingles(ctoks))
            >= 0.5
            for ctoks in corpus
        )
        assert got[sid] == expect, (sid, stoks, expect)
