"""Reference-compatible API facade: the streamz-style ``StreamingFrame``
(SURVEY.md §1.1/§2.2–§2.5) expressed over Spark DataFrames.

A user of the reference works with a pandas-like handle over a stream of
micro-batches; here the handle wraps a (batch or streaming) Spark
DataFrame, so every method lowers to declarative DataFrame ops that
Catalyst optimizes — nothing is eagerly evaluated, and the same code runs
batch or streaming (the reference's batch-split invariance for free).

Mapping summary (reference op -> here):
- ``df[col] / df[[c1,c2]] / df[mask]``        -> __getitem__
- ``map(f)`` elementwise                      -> with_columns / select exprs
- ``map_partitions(fn)``                      -> map_partitions (mapInPandas)
- ``filter(pred)``                            -> filter
- ``groupby(k).sum/mean/count/size/var/std``  -> groupby(...).{agg}
- whole-frame ``sum()/mean()/count()...``     -> agg_all
- ``rolling(n) / window(n=..., value=...)``   -> rolling (batch window fns)
- ``cumsum/cummax/cummin``                    -> cumulative
- ``accumulate(fn, start)``                   -> accumulate (stateful)
- ``unique / distinct``                       -> distinct
- ``value_counts``                            -> value_counts
- ``union / zip / combine_latest / zip_latest`` -> union / zip_seq /
  combine_latest (as-of based)
- ``sink_to_list / sink(fn) / to_textfile``   -> collect / foreach_batch /
  write_* (Spark sinks)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pandas_streaming_spark.operators.asof import asof_join

_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "count": F.count,
    "min": F.min,
    "max": F.max,
    "var": F.var_samp,
    "std": F.stddev_samp,
}


class StreamingFrame:
    """Pandas-like handle over a batch or streaming Spark DataFrame."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- projection / elementwise (§2.2) --------------------------------
    def __getitem__(self, key):
        if isinstance(key, str):
            return F.col(key)
        if isinstance(key, list):
            return StreamingFrame(self.df.select(*key))
        if isinstance(key, Column):  # boolean mask: df[df.x > 0]
            return StreamingFrame(self.df.filter(key))
        raise TypeError(f"unsupported key {type(key)}")

    def __getattr__(self, name: str):
        if name in self.df.columns:
            return F.col(name)
        raise AttributeError(name)

    def select(self, *cols) -> "StreamingFrame":
        return StreamingFrame(self.df.select(*cols))

    def assign(self, **exprs: Column) -> "StreamingFrame":
        out = self.df
        for name, expr in exprs.items():
            out = out.withColumn(name, expr)
        return StreamingFrame(out)

    def filter(self, cond: Column) -> "StreamingFrame":
        return StreamingFrame(self.df.filter(cond))

    where = filter

    def astype(self, mapping: dict[str, str]) -> "StreamingFrame":
        out = self.df
        for c, t in mapping.items():
            out = out.withColumn(c, F.col(c).cast(t))
        return StreamingFrame(out)

    def round(self, n: int, cols: list[str] | None = None) -> "StreamingFrame":
        out = self.df
        for c in cols or [f.name for f in self.df.schema if f.dataType.typeName() == "double"]:
            out = out.withColumn(c, F.round(F.col(c), n))
        return StreamingFrame(out)

    def map_partitions(self, fn, schema) -> "StreamingFrame":
        """The reference's escape hatch: arbitrary pandas fn per
        micro-batch -> Arrow-batched mapInPandas (works batch + stream)."""

        def gen(it):
            for pdf in it:
                yield fn(pdf)

        return StreamingFrame(self.df.mapInPandas(gen, schema))

    def flatten(self, col: str, alias: str | None = None) -> "StreamingFrame":
        return StreamingFrame(
            self.df.withColumn(alias or col, F.explode(F.col(col)))
        )

    # -- aggregation (§2.4) ---------------------------------------------
    def groupby(self, *keys: str) -> "GroupedFrame":
        return GroupedFrame(self.df, list(keys))

    def agg_all(self, **named: tuple[str, str]) -> "StreamingFrame":
        """Whole-stream aggregates: ``agg_all(total=("x", "sum"))``.
        Streaming: run in complete/update output mode (state-store backed),
        exactly the reference's running whole-stream aggregates."""
        exprs = [_AGGS[how](F.col(c)).alias(name) for name, (c, how) in named.items()]
        return StreamingFrame(self.df.agg(*exprs))

    def distinct(self, cols: list[str] | None = None) -> "StreamingFrame":
        return StreamingFrame(
            self.df.dropDuplicates(cols) if cols else self.df.distinct()
        )

    unique = distinct

    def value_counts(self, col: str) -> "StreamingFrame":
        return StreamingFrame(
            self.df.groupBy(col).agg(F.count("*").alias("count"))
        )

    def fillna(self, value, subset: list[str] | None = None) -> "StreamingFrame":
        """pandas ``fillna``: scalar or per-column dict (narrow map)."""
        return StreamingFrame(self.df.fillna(value, subset=subset))

    def dropna(
        self, how: str = "any", subset: list[str] | None = None
    ) -> "StreamingFrame":
        """pandas ``dropna`` (narrow filter; pushes to the scan)."""
        return StreamingFrame(self.df.dropna(how=how, subset=subset))

    def describe(self, *cols: str) -> "StreamingFrame":
        """pandas ``describe``: count/mean/stddev/min/max per column —
        one map-side-combined aggregate pass, rows on the driver only
        (5 × n_cols cells)."""
        return StreamingFrame(self.df.describe(*cols))

    drop_duplicates = distinct  # pandas name for the same op

    def rename(self, mapping: dict[str, str]) -> "StreamingFrame":
        """pandas ``rename(columns=...)`` (projection only, no shuffle)."""
        return StreamingFrame(self.df.withColumnsRenamed(mapping))

    def sort_values(self, by, ascending: bool = True) -> "StreamingFrame":
        """pandas ``sort_values``: a global range-partitioned sort. For
        top-k use ``nlargest``/``nsmallest`` — they never sort the full
        dataset."""
        cols = [by] if isinstance(by, str) else list(by)
        order = [F.col(c).asc() if ascending else F.col(c).desc() for c in cols]
        return StreamingFrame(self.df.orderBy(*order))

    def head(self, n: int = 5) -> "StreamingFrame":
        return StreamingFrame(self.df.limit(n))

    def nlargest(self, n: int, col: str) -> "StreamingFrame":
        """pandas ``nlargest``: compiles to TakeOrderedAndProject (per-
        partition top-n then a driver-side n-way merge of n-row heaps —
        never a global sort)."""
        return StreamingFrame(self.df.orderBy(F.col(col).desc()).limit(n))

    def nsmallest(self, n: int, col: str) -> "StreamingFrame":
        return StreamingFrame(self.df.orderBy(F.col(col).asc()).limit(n))

    def sample(self, frac: float, id_col: str) -> "StreamingFrame":
        """pandas ``sample(frac=...)``, but content-addressed instead of
        seeded-RNG (operators.sampling policy): membership is a pure
        function of ``id_col``, so the sample is stable under reshards,
        re-runs, and engine changes — what a training pipeline actually
        wants from 'random' sampling.

        Membership buckets are whole percents, so ``frac`` must be a
        multiple of 0.01 in (0, 1] — anything else would be silently
        snapped (and frac ≤ 0.005 would snap to an EMPTY sample), so we
        refuse instead."""
        from pandas_streaming_spark.operators.sampling import deterministic_sample

        pct = int(round(frac * 100))
        if not 0 < pct <= 100 or abs(frac * 100 - pct) > 1e-9:
            raise ValueError(
                f"sample(frac={frac!r}): content-addressed sampling has 1% "
                f"granularity; frac must be a multiple of 0.01 in (0, 1]."
            )
        return StreamingFrame(deterministic_sample(self.df, id_col, pct=pct))

    def pivot_table(
        self,
        index: str,
        columns: str,
        values: str,
        aggfunc: str = "sum",
        col_values: list | None = None,
    ) -> "StreamingFrame":
        """pandas ``pivot_table``: one output column per ``columns``
        value. Pass ``col_values`` explicitly on anything big — without
        it Spark runs an extra distinct job over the whole input just to
        learn the column set (and an unbounded value domain means an
        unbounded schema; a pipeline should always know its pivot
        domain)."""
        g = self.df.groupBy(index)
        p = g.pivot(columns, col_values) if col_values else g.pivot(columns)
        return StreamingFrame(p.agg(_AGGS[aggfunc](F.col(values))))

    def melt(
        self,
        id_vars: list[str],
        value_vars: list[str],
        var_name: str = "variable",
        value_name: str = "value",
    ) -> "StreamingFrame":
        """pandas ``melt`` (wide→long) via Spark's native unpivot —
        a narrow per-row expansion, no shuffle."""
        return StreamingFrame(
            self.df.unpivot(id_vars, value_vars, var_name, value_name)
        )

    # -- ordered / windowed (§2.5, batch semantics) ---------------------
    def rolling(
        self, n: int, order_by: str, partition_by: str | None = None
    ) -> "RollingFrame":
        return RollingFrame(self.df, n, order_by, partition_by)

    def cumulative(
        self, col: str, how: str, order_by: str, partition_by: str | None = None
    ) -> Column:
        """cumsum/cummax/cummin as a window expression."""
        w = _ordered_window(partition_by, order_by).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return _AGGS[how](F.col(col)).over(w)

    def resample(
        self,
        ts_col: str,
        agg_cols: dict,
        interval: str = "1 hour",
        bounds: "StreamingFrame | None" = None,
    ) -> "StreamingFrame":
        """pandas ``resample(...).agg(...).ffill()``: fixed-interval
        buckets re-indexed onto the full calendar spine with gaps
        forward-filled (operators.resample.resample_ffill)."""
        from pandas_streaming_spark.operators.resample import resample_ffill

        b = bounds.df if bounds is not None else self.df
        return StreamingFrame(
            resample_ffill(b, self.df, ts_col, agg_cols, interval)
        )

    def interpolate(
        self, key_col: str, ts_col: str, value_col: str
    ) -> "StreamingFrame":
        """pandas ``interpolate(method='time')`` per key — NULLs filled
        linearly on the µs time axis (operators.resample)."""
        from pandas_streaming_spark.operators.resample import interpolate_linear

        return StreamingFrame(
            interpolate_linear(self.df, key_col, ts_col, value_col)
        )

    def quantile(self, col: str, probs: list[float]) -> "StreamingFrame":
        """pandas ``quantile``: exact interpolated percentiles in one
        aggregate pass (operators.quantiles.exact_percentiles; at corpus
        scale use percentile_approx — see the q118 audit)."""
        from pandas_streaming_spark.operators.quantiles import exact_percentiles

        return StreamingFrame(exact_percentiles(self.df, col, probs))

    def prune_to(
        self, dim: "StreamingFrame", on: str, dim_key: str | None = None
    ) -> "StreamingFrame":
        """Runtime Bloom-filter pruning against a (small) dim frame's
        keys before a join (operators.sketches.bloom_prune): superset of
        the true matches, so `f.prune_to(d, k).join(d)` ≡ `f.join(d)`
        with far less shuffled data."""
        from pandas_streaming_spark.operators.sketches import bloom_prune

        return StreamingFrame(
            bloom_prune(self.df, on, dim.df, dim_key or on)
        )

    def nunique_approx(self, col: str, by: list[str] | None = None) -> "StreamingFrame":
        """Mergeable HyperLogLog distinct count per group
        (operators.sketches hll_registers→hll_estimate) — the 100 TB
        form of ``groupby().nunique()``; ~13% std error at m=64."""
        from pandas_streaming_spark.operators.sketches import (
            hll_estimate,
            hll_registers,
        )

        keys = by or []
        return StreamingFrame(
            hll_estimate(hll_registers(self.df, col, *keys), *keys)
        )

    def heavy_hitters(
        self, col: str, k: int = 20, depth: int = 4, width: int = 256
    ) -> "StreamingFrame":
        """Count-Min-sketched top-k of ``col`` (operators.sketches):
        bounded d×w state however large the stream, overestimate-only."""
        from pandas_streaming_spark.operators.sketches import cms_build, cms_estimate

        items = self.df.select(col).distinct()
        grid = cms_build(self.df, col, depth, width)
        est = cms_estimate(items, grid, col, depth, width)
        return StreamingFrame(
            est.orderBy(F.col("cms_est").desc(), col).limit(k)
        )

    def weighted_sample(
        self, id_col: str, weight_col: str, k: int, by: str | None = None
    ) -> "StreamingFrame":
        """Reproducible weighted sampling without replacement, P ∝
        weight (operators.sampling.weighted_sample_topk, A-Res)."""
        from pandas_streaming_spark.operators.sampling import weighted_sample_topk

        return StreamingFrame(
            weighted_sample_topk(self.df, id_col, weight_col, k, by).drop(
                "__ares_rank"
            )
        )

    def rollup_time(
        self, ts_col: str, grain: str, keys: list[str], value_col: str
    ) -> "StreamingFrame":
        """Continuous-aggregate partials at ``grain`` (operators.rollup
        .time_rollup); re-aggregate to any coarser grain with
        ``rollup_time`` again on the result's ``bucket_ts``/partials via
        operators.rollup.rollup_merge."""
        from pandas_streaming_spark.operators.rollup import time_rollup

        return StreamingFrame(time_rollup(self.df, ts_col, grain, keys, value_col))

    def time_window(
        self, ts_col: str, duration: str, slide: str | None = None
    ) -> "GroupedFrame":
        """Tumbling/sliding event-time window pre-grouping (streaming or
        batch). ``session`` gaps via session_window in GroupedFrame.by."""
        w = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
        return GroupedFrame(self.df, [w.alias("window")])

    def accumulate(self, fold_fn, out_schema, state_schema, key_cols: list[str]):
        """The reference's most general op: user state folded over the
        stream per key — applyInPandasWithState on a stream, plain
        applyInPandas on a batch frame."""
        if self.df.isStreaming:
            from pyspark.sql.streaming.state import GroupStateTimeout

            return StreamingFrame(
                self.df.groupBy(*key_cols).applyInPandasWithState(
                    fold_fn, out_schema, state_schema, "update",
                    GroupStateTimeout.NoTimeout,
                )
            )
        raise ValueError(
            "accumulate targets streaming frames; on batch use groupby/rolling"
        )

    # -- stream combination (§2.3) --------------------------------------
    def union(self, *others: "StreamingFrame") -> "StreamingFrame":
        out = self.df
        for o in others:
            out = out.unionByName(o.df, allowMissingColumns=True)
        return StreamingFrame(out)

    def zip_seq(self, other: "StreamingFrame", on: str) -> "StreamingFrame":
        """Reference ``zip``: align i-th elements. With ordered data the
        alignment key is explicit (a sequence/row id) — a plain inner join,
        which unlike positional zip survives distribution."""
        return StreamingFrame(self.df.join(other.df, on=on))

    def combine_latest(
        self,
        other: "StreamingFrame",
        key: str,
        left_time: str,
        right_time: str,
        value_cols: list[str],
        right_ord: str | None = None,
        direction: str = "backward",
        tolerance: float | None = None,
        allow_exact_matches: bool = True,
    ) -> "StreamingFrame":
        """Reference ``combine_latest``/``zip_latest``: each left element
        pairs with the latest-known right element — the as-of join, with
        the full pd.merge_asof parameter surface (direction trio,
        tolerance seconds, allow_exact_matches)."""
        return StreamingFrame(
            asof_join(
                self.df, other.df, key=key, left_time=left_time,
                right_time=right_time, value_cols=value_cols, right_ord=right_ord,
                direction=direction, tolerance=tolerance,
                allow_exact_matches=allow_exact_matches,
            )
        )

    def join(self, other: "StreamingFrame", on, how: str = "inner") -> "StreamingFrame":
        return StreamingFrame(self.df.join(other.df, on=on, how=how))

    # pandas names the as-of join merge_asof; combine_latest is the
    # reference's name for the same alignment — one implementation
    merge_asof = combine_latest

    # -- sinks (§2.1) ----------------------------------------------------
    def collect(self):
        return self.df.collect()

    def to_pandas(self):
        return self.df.toPandas()

    def foreach_batch(self, fn: Callable, output_mode: str = "update", **options):
        q = (
            self.df.writeStream.outputMode(output_mode)
            .foreachBatch(fn)
        )
        for k, v in options.items():
            q = q.option(k, v)
        return q.start()

    def write_parquet(self, path: str, partition_by: list[str] | None = None):
        w = self.df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)


class GroupedFrame:
    def __init__(self, df: DataFrame, keys: list):
        self.df, self.keys = df, keys

    def agg(self, **named: tuple[str, str]) -> StreamingFrame:
        exprs = [_AGGS[how](F.col(c)).alias(name) for name, (c, how) in named.items()]
        return StreamingFrame(self.df.groupBy(*self.keys).agg(*exprs))

    def size(self) -> StreamingFrame:
        return StreamingFrame(
            self.df.groupBy(*self.keys).agg(F.count("*").alias("size"))
        )

    def __getattr__(self, how: str):
        if how not in _AGGS:
            raise AttributeError(how)

        def all_numeric() -> StreamingFrame:
            num = [
                f.name
                for f in self.df.schema
                if f.dataType.typeName() in ("double", "long", "integer", "float")
                and f.name not in [k for k in self.keys if isinstance(k, str)]
            ]
            exprs = [_AGGS[how](F.col(c)).alias(f"{c}_{how}") for c in num]
            return StreamingFrame(self.df.groupBy(*self.keys).agg(*exprs))

        return all_numeric


def _ordered_window(partition_by: str | None, order_by: str):
    """Ordered window spec; a missing partition key means Spark funnels
    EVERY row through one task for the sort — fine on a laptop, a
    scale-killer on a cluster. Callers get a loud warning so the global
    form is always a conscious choice."""
    if partition_by:
        return Window.partitionBy(partition_by).orderBy(order_by)
    import warnings

    warnings.warn(
        "window without partition_by plans a single-partition global sort; "
        "pass a partition key for any data that doesn't fit one executor",
        UserWarning,
        stacklevel=3,
    )
    return Window.partitionBy().orderBy(order_by)


class RollingFrame:
    """Reference ``rolling(n)`` / ``window(n=K)``: trailing K-row stats.
    Batch lowering is a ROWS window frame (built-in, codegen'd); the
    streaming equivalent is operators.stateful (deque state)."""

    def __init__(self, df: DataFrame, n: int, order_by: str, partition_by: str | None):
        self.df, self.n = df, n
        self.w = _ordered_window(partition_by, order_by).rowsBetween(
            -(n - 1), Window.currentRow
        )

    def agg(self, **named: tuple[str, str]) -> StreamingFrame:
        out = self.df
        for name, (c, how) in named.items():
            out = out.withColumn(name, _AGGS[how](F.col(c)).over(self.w))
        return StreamingFrame(out)


def wrap(df: DataFrame) -> StreamingFrame:
    return StreamingFrame(df)
