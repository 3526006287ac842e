"""Distributed probabilistic sketches: Bloom-filter runtime join pruning
and Count-Min-Sketch frequency estimation (reference sketch/approx family,
SURVEY.md §2.4 approx aggregates; the Bloom path is the classic runtime
filter every warehouse engine pushes into its fact scans).

Scale shapes — why these exist as operators rather than expressions:

* **Bloom join pruning**: at 100 TB the dominant cost of a selective
  fact⋈dim join is scanning fact rows that will never match. Engines fix
  this with a *runtime filter*: aggregate the dim keys into a few KB of
  bits, ship that to every scan task, and drop non-matching rows before
  the shuffle. The build here is fully distributed (explode → bit_or
  aggregate, map-side combined); only the finished ≤num_bits/64-word
  bitmap is collected — the same bounded driver hop Spark's own
  `spark.sql.optimizer.runtime.bloomFilter` performs. The probe is a
  pure codegen'd bit-test expression (no Python, no shuffle), so it
  composes with predicate pushdown. No false negatives ⇒ the pruned
  join is *exactly* the unpruned join, which is what makes q134
  value-gradable against a plain-SQL oracle.

* **Count-Min Sketch**: fixed d×w grid of counters, est(x) =
  min_r cell[r, h_r(x)] ≥ true(x) always (overestimate-only). The build
  is one groupBy over (row, bucket) — d·w cells total regardless of
  stream size, the whole point at corpus scale. Buckets use the repo's
  md5 idiom (sampling.hash_bucket) instead of murmur3 so a duckdb
  oracle computes the *identical* grid, turning the usual "approx ⇒
  rows-only check" into a full value-hash grade (q135).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------


def _bloom_positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """k bit positions from the xxhash64 family (seed i = i-th function).
    xxhash64 is JVM-side codegen; the oracle never needs to mirror it
    because Bloom semantics are no-false-negatives, not bit equality."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits)) for i in range(num_hashes)
    ]


def bloom_build(
    df: DataFrame, key_col: str, num_bits: int, num_hashes: int = 5
) -> list[int]:
    """Aggregate ``df[key_col]`` into a Bloom bitmap of ``num_bits`` bits,
    returned as ``num_bits/64`` longs (Java-signed; bit i of the filter is
    bit ``i%64`` of word ``i//64``).

    Distributed: explode each key to its k positions, reduce per 64-bit
    word with ``bit_or`` (map-side combined), collect only the finished
    words — bounded by num_bits/64 rows regardless of input size. Size
    ``num_bits ≈ 16 × n_keys`` for ~0.2% false positives at k=5.
    """
    if num_bits <= 0 or num_bits % 64:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    key = F.col(key_col)
    pos = F.explode(
        F.array(*_bloom_positions(key, num_bits, num_hashes))
    ).alias("pos")
    words = (
        df.where(key.isNotNull())
        .select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            # call_function: the python shiftleft wrapper insists on an
            # int shift; the SQL function takes a column fine.
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("pos"), F.lit(64)).cast("int"),
            ).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    out = [0] * (num_bits // 64)
    for r in words:
        out[r["w"]] = r["bits"]
    return out


def bloom_might_contain(
    key_col: str | Column, words: list[int], num_hashes: int = 5
) -> Column:
    """Codegen'd membership test against a bitmap from :func:`bloom_build`.

    Pure column expression — ANDed bit tests over an inlined array
    literal — so Catalyst keeps it inside the scan's WholeStageCodegen
    and it prunes rows *before* any shuffle. ``(w >> s) & 1`` reads bit
    ``s`` correctly for any Java-signed word (arithmetic shift only
    pollutes bits above the one tested).
    """
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    num_bits = len(words) * 64
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for p in _bloom_positions(key, num_bits, num_hashes):
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = F.call_function(
            "shiftright", word, F.pmod(p, F.lit(64)).cast("int")
        ).bitwiseAND(F.lit(1).cast("long"))
        cond = cond & (bit == 1)
    return cond


#: bloom_prune bitmap ceiling. The bitmap is INLINED into the filter
#: expression as a long-array literal (that is what keeps the test inside
#: the scan's codegen), so its size lands in the Catalyst plan; past a
#: few thousand words the plan/codegen cost outgrows the shuffle savings
#: (ADVICE r5 item 1). 2^20 bits = 16k longs ≈ 64k build keys at 16
#: bits/key — above that, skip pruning and let the join's own runtime
#: filters (Spark's bloom_filter_agg-based InjectRuntimeFilter) handle it.
BLOOM_PRUNE_MAX_BITS = 1 << 20


def bloom_prune(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    bits_per_key: int = 16,
    num_hashes: int = 5,
    max_bits: int = BLOOM_PRUNE_MAX_BITS,
) -> DataFrame:
    """Runtime-filter ``fact`` down to rows whose key *might* appear in
    ``dim[dim_key]`` — the build-side of the join you are about to run.

    Sizes the bitmap from an exact dim-key count (one tiny aggregate on
    the build side — the side that is small by assumption; at 100 TB you
    would already know its cardinality from table stats). Guarantees a
    superset of the true matches, so `bloom_prune(...).join(dim)` ≡
    `fact.join(dim)` with the shuffle fed ~selectivity× less data.

    Build-side cardinality is CAPPED: the bitmap is an inlined plan
    literal, so a large dim would balloon the Catalyst plan instead of
    helping — above ``max_bits`` (default ~64k keys at the default 16
    bits/key) this returns ``fact`` unchanged and the join should rely
    on AQE/runtime filters instead. Pass a larger ``max_bits`` only
    with a measured plan-size budget.
    """
    n_keys = dim.select(dim_key).where(F.col(dim_key).isNotNull()).distinct().count()
    num_bits = max(64, ((max(n_keys, 1) * bits_per_key + 63) // 64) * 64)
    if num_bits > max_bits:
        return fact  # pruning would cost more than it saves: no-op superset
    words = bloom_build(dim, dim_key, num_bits, num_hashes)
    return fact.where(bloom_might_contain(fact_key, words, num_hashes))


# --------------------------------------------------------------------------
# Count-Min Sketch
# --------------------------------------------------------------------------


def cms_bucket(item: Column, seed: int, width: int) -> Column:
    """Row-``seed``'s bucket for ``item`` in [0, width): the repo's
    md5→28-hex-bits→mod idiom (operators.sampling.hash_bucket) salted
    with the row index, so duckdb reproduces the grid verbatim."""
    h = F.conv(
        F.substring(F.md5(F.concat(item.cast("string"), F.lit(f"#{seed}"))), 1, 7),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(width))


def cms_bucket_sql(item_sql: str, seed: int, width: int) -> str:
    """The duckdb rendering of :func:`cms_bucket` (oracle side)."""
    return (
        f"CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(CAST({item_sql} AS VARCHAR), "
        f"'#{seed}')), 1, 7)) AS BIGINT) % {width}"
    )


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min grid over ``df[item_col]`` as a ``(cms_row, cms_col,
    cms_cnt)`` frame of at most ``depth × width`` rows.

    One explode (d cells per item) + one groupBy — map-side combining
    collapses each partition to ≤ d·w partial cells, so shuffle volume
    is bounded by the grid size times the partition count, never by the
    stream size. Keep the grid as a DataFrame (vs collecting): estimates
    join against it broadcast-style and stay fully distributed.
    """
    item = F.col(item_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("cms_row"),
                    cms_bucket(item, r, width).alias("cms_col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("cell")
    return (
        df.where(item.isNotNull())
        .select(cells)
        .groupBy(F.col("cell.cms_row").alias("cms_row"), F.col("cell.cms_col").alias("cms_col"))
        .agg(F.count("*").alias("cms_cnt"))
    )


def cms_estimate(
    items: DataFrame, grid: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each ``items[item_col]`` against a grid from
    :func:`cms_build`: est = min over rows of the item's cell counter
    (0 if a cell was never touched). Adds column ``cms_est``.

    The grid is ≤ d·w rows — broadcast it; the probe is then a
    broadcast-hash join plus a d-way least(), no shuffle of ``items``.
    """
    item = F.col(item_col)
    probes = items.select(
        "*",
        *[cms_bucket(item, r, width).alias(f"__c{r}") for r in range(depth)],
    )
    g = F.broadcast(grid)
    for r in range(depth):
        gr = g.where(F.col("cms_row") == r).select(
            F.col("cms_col").alias(f"__gc{r}"), F.col("cms_cnt").alias(f"__n{r}")
        )
        probes = probes.join(
            F.broadcast(gr), F.col(f"__c{r}") == F.col(f"__gc{r}"), "left"
        ).drop(f"__gc{r}", f"__c{r}")
    est = F.least(*[F.coalesce(F.col(f"__n{r}"), F.lit(0)) for r in range(depth)])
    return probes.withColumn("cms_est", est).drop(
        *[f"__n{r}" for r in range(depth)]
    )


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

#: m = 64 registers: alpha_64 = 0.7213 / (1 + 1.079/64)
HLL_M = 64
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
#: hash uses 60 md5 bits: 6 bucket bits + 54 payload bits → rho ∈ [1, 55]
HLL_RHO_CAP = 55


def hll_registers(df: DataFrame, item_col: str, *group_cols: str) -> DataFrame:
    """Per-group HyperLogLog registers ``(group..., hll_bucket, hll_rho)``
    — at most ``HLL_M`` rows per group no matter the input size, and
    MERGEABLE: registers of a union are the per-bucket max of the parts'
    registers, which is how a 1000-executor distinct-count actually
    runs (map-side partial registers, tiny shuffle, merge).

    Engine-exact by construction (unlike approx_count_distinct's
    HLL++): the hash is 60 bits of md5 (the repo's oracle idiom) and
    rho is the *least*-significant-1-bit position of the payload
    (Flajolet–Martin form — isolating it as ``w & -w`` yields an exact
    power of two whose log2 is float-exact, so duckdb reproduces every
    register verbatim; leading-zero rank has no such SQL-portable form).
    """
    item = F.col(item_col)
    h = F.conv(F.substring(F.md5(item.cast("string")), 1, 15), 16, 10).cast("long")
    w = F.shiftright(h, 6)
    lowbit = w.bitwiseAND(-w)
    rho = F.when(w == 0, F.lit(HLL_RHO_CAP)).otherwise(
        (F.log2(lowbit) + 1).cast("int")
    )
    return (
        df.where(item.isNotNull())
        .select(*group_cols, F.pmod(h, F.lit(HLL_M)).alias("hll_bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "hll_bucket")
        .agg(F.max("rho").alias("hll_rho"))
    )


def hll_estimate(registers: DataFrame, *group_cols: str) -> DataFrame:
    """Distinct-count estimate per group from :func:`hll_registers`
    output: the classic raw harmonic-mean estimate with the
    small-range (linear-counting) correction. Adds ``hll_est``
    (double). Empty buckets contribute 2^0 to the harmonic sum and
    drive the linear-counting branch."""
    m = F.lit(HLL_M)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("hll_rho"))).alias("__inv_sum"),
        F.count("*").alias("__nonempty"),
    )
    v = (m - F.col("__nonempty")).cast("double")  # empty buckets
    raw = F.lit(HLL_ALPHA) * m * m / (F.col("__inv_sum") + v)
    est = F.when(
        (raw <= 2.5 * HLL_M) & (v > 0), m.cast("double") * F.log(m.cast("double") / v)
    ).otherwise(raw)
    return agg.withColumn("hll_est", est).drop("__inv_sum", "__nonempty")


def hll_sql(item_sql: str, group_sql: str) -> str:
    """duckdb rendering of hll_registers+hll_estimate for the oracle:
    produces (group, hll_est) per group."""
    return f"""
WITH h AS (
  SELECT {group_sql} AS g,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST({item_sql} AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM __HLL_SRC__
  WHERE {item_sql} IS NOT NULL
),
b AS (
  SELECT g, hv % {HLL_M} AS bucket, hv >> 6 AS w FROM h
),
r AS (
  SELECT g, bucket,
         MAX(CASE WHEN w = 0 THEN {HLL_RHO_CAP}
                  ELSE CAST(LOG2(w & (-w)) AS INT) + 1 END) AS rho
  FROM b GROUP BY g, bucket
),
agg AS (
  SELECT g, SUM(POWER(2.0, -rho)) AS inv_sum,
         CAST({HLL_M} - COUNT(*) AS DOUBLE) AS v
  FROM r GROUP BY g
)
SELECT g, CASE WHEN CAST({HLL_ALPHA} AS DOUBLE) * {HLL_M} * {HLL_M} / (inv_sum + v)
                  <= 2.5 * {HLL_M} AND v > 0
           THEN {HLL_M} * LN({HLL_M} / v)
           ELSE CAST({HLL_ALPHA} AS DOUBLE) * {HLL_M} * {HLL_M} / (inv_sum + v)
           END AS hll_est
FROM agg
"""
