"""Round-16 optimization tests: every operator whose internals changed
for performance this round is pinned result-identical to the previous
form (optimization-brief rule — internals may change, results may not).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_max_token_multiplicity_single_case_fold_equivalence(spark):
    """r16 re-shapes the Gopher dominance fold (one CASE over structs,
    closed-run mx + finish-step fold of the open run) — the result must
    still equal the r14 definitional transform/filter idiom on every
    adversarial shape, including runs that END the sorted array (the
    finish step's responsibility) and ties between a closed and the
    final open run."""
    from pandas_streaming_spark.operators.text import max_token_multiplicity

    texts = [
        "a b c a b a",          # clear winner
        "x",                     # single token
        "t t t t",               # all same (one never-closed run)
        "a b c d e",             # all distinct
        "z a z a z a",           # winner at sort-end (open-run finish)
        "a  b   a",              # doubled spaces -> empty-string tokens
        " lead",                 # leading space -> empty first token
        "tail ",                 # trailing space -> empty last token
        "m m n n",               # tie: closed run == final open run
        "q " * 500 + "r",        # long run closed by a final singleton
        "r " + "q " * 499 + "q",  # long run IS the final open run
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    w = F.split("text", " ")
    old = F.array_max(
        F.transform(
            F.array_distinct(w),
            lambda x: F.size(F.filter(w, lambda y: y == x)),
        )
    )
    got = df.select(
        max_token_multiplicity(w).alias("new"), old.alias("old")
    ).collect()
    for r in got:
        assert r["new"] == r["old"], (r["new"], r["old"])


def test_max_token_multiplicity_empty_array_is_zero(spark):
    """Pins the documented edge divergence (VERDICT r15 item 5): a
    literal EMPTY array returns 0 (the old array_max([]) idiom returned
    NULL). Unreachable from the split()-based call sites — worst case
    split yields [''] — but pinned so the contract is explicit."""
    from pandas_streaming_spark.operators.text import max_token_multiplicity

    df = spark.range(1).select(
        F.array().cast("array<string>").alias("toks")
    )
    [row] = df.select(max_token_multiplicity(F.col("toks")).alias("m")).collect()
    assert row["m"] == 0
