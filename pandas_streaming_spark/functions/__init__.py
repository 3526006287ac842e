"""Column-expression building blocks (all JVM-side, codegen-friendly).

Everything here composes ``pyspark.sql.functions`` higher-order array /
string / hash functions — no Python UDFs — so the expressions inline into
whole-stage codegen and stay oracle-matchable bit-for-bit:

- vector math (dot / norm / cosine) folds left in array index order with
  double accumulation, exactly mirroring duckdb's ``list_aggregate(...,
  'sum')`` fold, so ROUND(x, 4) agrees across engines.
- hashing uses md5 hex strings (identical in Spark and duckdb), which makes
  MinHash / SimHash signatures cross-engine deterministic — the trick that
  lets near-dup operators be graded against a SQL oracle at all.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Vector math over array<float> columns (embeddings.embedding, dim=64)
# ---------------------------------------------------------------------------


def vec_dot(a: Column | str, b: Column | str) -> Column:
    """Dot product with per-element double promotion, left-fold in index
    order (bitwise-matches duckdb `list_aggregate(list_transform(...), 'sum')`)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def vec_norm(a: Column | str) -> Column:
    """L2 norm, same double-promotion fold as :func:`vec_dot`."""
    return F.sqrt(vec_dot(a, a))


def vec_cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; NULL when either vector has zero norm."""
    denom = vec_norm(a) * vec_norm(b)
    return vec_dot(a, b) / F.nullif(denom, F.lit(0.0))


# ---------------------------------------------------------------------------
# Tokenization / shingling (documents.text is space-separated)
# ---------------------------------------------------------------------------


def tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as an array<string> (empty array when < k tokens).

    Pure expression: sequence over token positions + transform, no UDF.
    NOTE: higher-order functions are interpreted (no codegen) and do not
    share subexpressions — this inlines ``split(text)`` into every
    element_at. Hot paths should materialize the token array in a column
    first and call :func:`shingles_of` on it (operators/dedup.py does).
    """
    return shingles_of(tokens(text), k)


def shingles_of(t: Column, k: int = 3) -> Column:
    """k-word shingles over an (ideally already-materialized) token array."""
    n = F.size(t)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )


# ---------------------------------------------------------------------------
# Integer half-bit log quantization (the tokenizer / CCNet / DSIR scorer)
# ---------------------------------------------------------------------------


def hb_sql(x: str) -> str:
    """SQL for ``hb(x) = length(bin(x*x)) - 1 = floor(2*log2(x))`` — the
    half-bit integer log-prob quantization — EXACT for the full positive
    BIGINT range.

    The naive form squares ``x`` in 64-bit and silently wraps past
    x ≈ 3.03e9 (counts a 100 TB corpus absolutely reaches); the DuckDB
    oracles already ride HUGEINT. This form never squares x in BIGINT:
    with b = floor(log2 x) = length(bin(x)) - 1 and p = 2^b,

        floor(log2 x²) = 2b + [x² ≥ 2p²]  and  x² ≥ 2p² ⟺ (x-p)(x+p) ≥ p²

    and all three products are computed in DECIMAL, where they are exact
    (max ≈ 2^126 < 10^38). Returns a BIGINT-typed expression; hb(0) = 0
    and hb(1) = 0, matching the bin() form.
    """
    b = f"(length(bin({x})) - 1)"
    p = f"shiftleft(CAST(1 AS BIGINT), {b})"
    return (
        f"(2 * CAST({b} AS BIGINT) + IF("
        f"CAST({x} - {p} AS DECIMAL(19,0)) * (CAST({x} AS DECIMAL(19,0)) + {p})"
        f" >= CAST({p} AS DECIMAL(19,0)) * {p}, 1L, 0L))"
    )


# ---------------------------------------------------------------------------
# Cross-engine deterministic hashing (md5 hex — identical in duckdb)
# ---------------------------------------------------------------------------


def md5_seeded(value: Column, seed: int) -> Column:
    """Seeded hash as an md5 hex string: md5(value || '#' || seed)."""
    return F.md5(F.concat(value, F.lit(f"#{seed}")))


def minhash_sig(shingle_array: Column, n_hashes: int = 16) -> Column:
    """MinHash signature: array of n md5-hex minima over the shingle set.

    String-min over md5 hex == min over a uniform 128-bit hash, so this is
    a textbook MinHash; duckdb computes the identical signature with
    ``min(md5(shingle || '#i'))`` per seed.
    """
    # NB: the seed must be captured via a closure, not a lambda default
    # arg — PySpark introspects lambda arity, and a 2-param lambda gets
    # the element *index* bound to its second parameter.
    def seeded(i: int):
        return lambda s: md5_seeded(s, i)

    return F.array(
        *[
            F.array_min(F.transform(shingle_array, seeded(i)))
            for i in range(n_hashes)
        ]
    )


def nibble_high_bit(hexstr: Column, pos: int) -> Column:
    """High bit of hex digit `pos` (1-based) of an md5 hex string, as ±1.

    Used by SimHash: each of the 32 md5 hex chars contributes one bit;
    a digit in [8-9a-f] has its high bit set.
    """
    digit = F.substring(hexstr, pos, 1)
    return F.when(digit.rlike("[89a-f]"), F.lit(1)).otherwise(F.lit(-1))


def simhash_bits(token_array: Column, n_bits: int = 32) -> Column:
    """SimHash over a token array as an n_bits-char '0'/'1' string.

    bit j = sign of sum over tokens of ±1 from md5-hex nibble high-bits.
    Ties (sum == 0) resolve to '0' on both engines.
    """
    hashed = F.transform(token_array, F.md5)

    def bit_sum(j: int):  # closure capture — see minhash_sig note
        return F.aggregate(
            hashed, F.lit(0), lambda acc, h: acc + nibble_high_bit(h, j + 1)
        )

    bits = [
        F.when(bit_sum(j) > 0, F.lit("1")).otherwise(F.lit("0"))
        for j in range(n_bits)
    ]
    return F.concat(*bits)
