"""Tokenizer-design queries split out of `textq` (round 10, the
r6/r8/r9 module-rebalance convention — textq passed 1400 lines): the
BPE lifecycle (single merge step q211, the 8-merge training loop q241,
corpus encode q251) and the vocabulary-coverage curve q215.

Same house rules and oracle discipline as the parent module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q215_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage curve — the tokenizer-design question "how
    much of the corpus does a top-V vocab cover": token frequencies
    ranked (count desc, token asc — a total order), cumulative share at
    rank checkpoints in basis points, plus the smallest vocab covering
    90% (integer cross-multiplication cum*10 >= tot*9, no float in the
    threshold). Scale: the window runs over the DISTINCT-token frame —
    data-reduced to |vocab| rows by the groupBy, so the global sort is
    over a frame thousands of times smaller than the corpus (real
    corpora: millions of rows — still one executor's work)."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wr = Window.orderBy(F.col("cnt").desc(), "tok")
    ranked = counts.select(
        "cnt",
        F.row_number().over(wr).cast("long").alias("rank"),
        F.sum("cnt")
        .over(wr.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    )
    tot = counts.agg(
        F.sum("cnt").cast("long").alias("__tot"),
        F.count("*").cast("long").alias("__v"),
    )
    s = ranked.join(F.broadcast(tot))
    covs = s.filter(F.col("rank").isin(5, 10, 20, 30)).select(
        F.concat(F.lit("cov_bp_at_"), F.lpad(F.col("rank").cast("string"), 2, "0"))
        .alias("metric"),
        F.round(F.lit(1e4) * F.col("cum") / F.col("__tot"), 0)
        .cast("long")
        .alias("value"),
    )
    v90 = (
        s.filter(F.col("cum") * 10 >= F.col("__tot") * 9)
        .agg(F.min("rank").alias("value"))
        .select(F.lit("v_at_90pct").alias("metric"), "value")
    )
    base = tot.select(
        F.explode(
            F.array(
                F.struct(F.lit("vocab_size").alias("metric"), F.col("__v").alias("value")),
                F.struct(F.lit("total_tokens").alias("metric"), F.col("__tot").alias("value")),
            )
        ).alias("s")
    ).select("s.metric", "s.value")
    return covs.unionByName(v90).unionByName(base).orderBy("metric")


def q211_bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge iteration — the training step of byte-pair-encoding
    tokenizers (Sennrich et al. 2016): count adjacent character pairs
    across the corpus (frequency-weighted, overlapping positions, the
    reference counting rule), pick the winner (count desc, pair asc),
    and apply the merge as leftmost non-overlapping replacement. Graded:
    top-5 pairs with the winner's effect (symbols before/after) as
    constant audit columns — REPLACE's leftmost-non-overlap semantics
    agree across engines, so 'aaa' under winner 'aa' merges exactly
    once in both. Scale: BPE training operates on the WORD-FREQUENCY
    table, not the corpus — everything after the first groupBy is
    vocabulary-sized (the reason real BPE trainers scale at all)."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    # adjacent char pairs with multiplicity (overlapping positions)
    pairs = vocab.select(
        "f",
        F.explode(
            F.when(
                F.length("w") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.length("w") - 1),
                    lambda i: F.col("w").substr(i, F.lit(2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
    )
    counts = pairs.groupBy("pair").agg(F.sum("f").cast("long").alias("cnt"))
    w5 = Window.orderBy(F.col("cnt").desc(), "pair")
    top5 = (
        counts.withColumn("rank", F.row_number().over(w5).cast("long"))
        .filter(F.col("rank") <= 5)
    )
    winner = top5.filter(F.col("rank") == 1).select(
        F.col("pair").alias("__win")
    )
    effect = (
        vocab.join(F.broadcast(winner))
        .select(
            (F.col("f") * F.length("w")).alias("__sym"),
            (
                F.col("f")
                * (F.length("w") - F.length(F.replace(F.col("w"), F.col("__win"))))
                / 2
            ).alias("__merged"),
        )
        .agg(
            F.sum("__sym").cast("long").alias("n_sym_before"),
            (F.sum("__sym") - F.sum("__merged")).cast("long").alias("n_sym_after"),
        )
    )
    return (
        top5.join(F.broadcast(effect))
        .select("rank", "pair", "cnt", "n_sym_before", "n_sym_after")
        .orderBy("rank")
    )


_BPE_STEPS = 8


def _bpe_train_chain(spark: SparkSession, sf_dir: str, steps: int = _BPE_STEPS):
    """Shared BPE training loop (q241 grades the merge table; q251
    applies the trained merges back to the corpus): word-frequency
    table → ``steps`` unrolled merge iterations over the
    marker-wrapped symbol strings. Returns ``(winners, final_vocab,
    dirty)`` — the per-step 1-row winner frames, the final
    (w, f, ws) vocabulary after all merges, and the 1-row marker-
    safety audit aggregate."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    # marker-safety audit (action-time): no corpus word may contain ·
    dirty = vocab.agg(
        F.sum(F.when(F.col("w").contains("·"), 1).otherwise(0)).alias("__dirty")
    )
    cur = vocab.select(
        "w",
        "f",
        F.concat(
            F.lit("·"), F.array_join(F.split("w", ""), "··"), F.lit("·")
        ).alias("ws"),
    ).localCheckpoint(eager=False)
    winners = []
    pair_t = "array<struct<x:string,y:string>>"
    for t in range(1, steps + 1):
        sy = cur.select(
            "f", F.split(F.expr("trim(BOTH '·' FROM ws)"), "··").alias("syms")
        )
        pr = sy.select(
            "f",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("x"),
                            F.element_at("syms", i + 1).alias("y"),
                        ),
                    ),
                ).otherwise(F.array().cast(pair_t))
            ).alias("p"),
        )
        win = (
            pr.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("f").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "x", "y")
            .limit(1)
            .localCheckpoint(eager=False)
        )
        winners.append(
            win.select(
                F.lit(t).cast("long").alias("step"),
                "x",
                "y",
                F.concat("x", "y").alias("merged"),
                "cnt",
            )
        )
        cur = (
            cur.join(F.broadcast(win))
            .select(
                "w",
                "f",
                F.replace(
                    F.col("ws"),
                    F.concat(F.lit("·"), F.col("x"), F.lit("··"), F.col("y"), F.lit("·")),
                    F.concat(F.lit("·"), F.col("x"), F.col("y"), F.lit("·")),
                ).alias("ws"),
            )
            .localCheckpoint(eager=False)
        )
    return winners, cur, dirty


def q241_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL BPE training loop — q211's single merge step iterated to a
    merge TABLE of 8 rules (VERDICT r9 item 5, the q91→q96 precedent:
    E-step → full Lloyd; merge step → training loop). Each iteration
    counts adjacent symbol pairs over the WORD-FREQUENCY table
    (overlapping positions, frequency-weighted — the q211 counting
    rule), picks the winner (count desc, x, y — deterministic), and
    applies it as leftmost-non-overlapping replacement; the winner pair
    becomes a single new symbol visible to later iterations (true BPE,
    not 8 independent char-pair merges).

    Symbol-sequence representation: each word rides as a MARKER-WRAPPED
    string ``·s1··s2··s3·`` (· = U+00B7, asserted absent from the
    corpus at action time). Applying a merge is then ONE engine-native
    ``REPLACE(ws, ·x··y·, ·xy·)`` — each occurrence consumes its own
    delimiters, so consecutive non-overlapping occurrences all merge in
    one pass exactly like the reference BPE apply ('a a a a' under
    (a,a) → 'aa aa', while 'a a a' → 'aa a'), and both engines'
    REPLACE share leftmost-non-overlap replace-all semantics. Pair
    extraction is ``split(trim(ws), '··')`` back to the symbol array.

    The 8 iterations UNROLL into the plan (q218's move): every winner
    is a 1-row broadcast frame derived in-engine — no driver-side
    collect steers the loop; per-iteration vocab frames are
    lazily checkpointed so each materializes once. Graded: the merge
    table (step, x, y, merged, cnt). Scale: after the one corpus
    tokenize+groupBy, EVERYTHING is vocabulary-sized — the reason real
    BPE trainers scale; the 10× replica has the identical vocabulary
    (10× frequencies), so the probe sits near 1×."""
    winners, _cur, dirty = _bpe_train_chain(spark, sf_dir)
    out = winners[0]
    for wdf in winners[1:]:
        out = out.unionByName(wdf)
    return (
        out.join(F.broadcast(dirty))
        .filter(
            F.coalesce(
                F.assert_true(
                    F.col("__dirty") == 0,
                    F.lit("q241: corpus word contains the · marker — the "
                          "wrapped-string BPE representation is unsound here"),
                ).cast("boolean"),
                F.lit(True),
            )
        )
        .drop("__dirty")
        .orderBy("step")
    )


def q251_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the trained BPE merges back to the corpus — the encode
    half of the tokenizer lifecycle (q241 trains the merge table; a
    tokenizer is only useful once documents are ENCODED with it, and
    compression-per-doc is the number tokenizer engineers compare
    vocabularies by). The 8 trained merges collapse each vocabulary
    word to its final symbol sequence (``_bpe_train_chain`` — the work
    is vocabulary-sized; per-word token count = symbols in the merged
    wrapped string), then ONE word-keyed join fans the counts onto the
    corpus occurrences and a per-doc aggregate sums them. Graded for
    the 200 lowest doc_ids: words, chars, BPE token count, and chars-
    per-token compression in exact bp. Scale: train is
    vocabulary-sized; encode is one corpus explode + one uniform
    word-keyed hash join + one map-side-combined doc aggregate —
    no per-doc Python, no quadratic stage."""
    winners, vocab, dirty = _bpe_train_chain(spark, sf_dir)
    n_syms = F.size(
        F.split(F.expr("trim(BOTH '·' FROM ws)"), "··")
    ).cast("long")
    wcounts = vocab.select(
        "w", F.length("w").cast("long").alias("n_chars_w"), n_syms.alias("n_syms")
    )
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    per_doc = (
        toks.join(wcounts, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_chars_w").cast("long").alias("n_chars"),
            F.sum("n_syms").cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.round(
                F.lit(1e4) * F.col("n_chars") / F.col("n_bpe_tokens"), 0
            )
            .cast("long")
            .alias("chars_per_token_bp"),
        )
    )
    return (
        per_doc.join(F.broadcast(dirty))
        .filter(
            F.coalesce(
                F.assert_true(
                    F.col("__dirty") == 0,
                    F.lit("q251: corpus word contains the · marker"),
                ).cast("boolean"),
                F.lit(True),
            )
        )
        .drop("__dirty")
        .orderBy("doc_id")
        .limit(200)
    )



_BPE_ITER_STEPS = 24
_BPE_CKPT_EVERY = 6


def _bpe_train_iterative(
    spark: SparkSession,
    sf_dir: str,
    steps: int = _BPE_ITER_STEPS,
    ckpt_every: int = _BPE_CKPT_EVERY,
):
    """The PRODUCTION form of BPE training (VERDICT r10 item 5): a
    driver-side iteration that materializes the word-frequency table
    every ``ckpt_every`` merges, instead of unrolling every merge into
    ONE lazy plan like ``_bpe_train_chain``. The unrolled form is
    analyzer-bound — plan depth (and optimization time) grows per
    merge, so a real 32k-merge vocabulary cannot live in one plan; here
    lineage is truncated at each checkpoint, keeping plan depth ≤
    ``ckpt_every`` REPLACE layers regardless of merge count (measured
    crossover vs the unrolled form: `plans/scale_notes.md`).

    Each iteration still counts pairs / picks the winner IN-ENGINE
    (orderBy cnt desc, x, y → limit 1); only the 1-row winner crosses
    to the driver — the O(1)-rows-per-iteration collect every iterative
    Spark algorithm (Lloyd, PageRank-until-convergence) performs, never
    corpus-sized data. Merge semantics are byte-identical to
    ``_bpe_train_chain``: marker-wrapped symbol strings, one
    leftmost-non-overlap REPLACE per merge.

    Returns ``(merges, cur)`` — the driver-side merge table rows
    [(step, x, y, merged, cnt)] and the final (w, f, ws) vocabulary
    frame. NOTE: unlike the unrolled twin this RUNS Spark jobs when
    called — inherent to checkpointed iterative algorithms (the q244
    eager-materialization precedent)."""
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("f"))
    )
    cur = vocab.select(
        "w",
        "f",
        F.concat(
            F.lit("·"), F.array_join(F.split("w", ""), "··"), F.lit("·")
        ).alias("ws"),
    ).localCheckpoint()  # eager: the one corpus-sized pass
    # marker-safety audit — the iterative form is already eager, so the
    # audit can be a plain loud action instead of q241's assert_true plumbing
    if cur.filter(F.col("w").contains("·")).limit(1).count() > 0:
        raise ValueError(
            "bpe_train_iterative: corpus word contains the · marker — the "
            "wrapped-string BPE representation is unsound here"
        )
    pair_t = "array<struct<x:string,y:string>>"
    merges: list[tuple[int, str, str, str, int]] = []
    prev_ckpt = cur
    for t in range(1, steps + 1):
        sy = cur.select(
            "f", F.split(F.expr("trim(BOTH '·' FROM ws)"), "··").alias("syms")
        )
        pr = sy.select(
            "f",
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("x"),
                            F.element_at("syms", i + 1).alias("y"),
                        ),
                    ),
                ).otherwise(F.array().cast(pair_t))
            ).alias("p"),
        )
        win = (
            pr.groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
            .agg(F.sum("f").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "x", "y")
            .limit(1)
            .collect()
        )
        if not win:
            raise ValueError(
                f"bpe_train_iterative: corpus exhausted at step {t} of "
                f"{steps} — every word is a single symbol"
            )
        x, y, cnt = win[0]["x"], win[0]["y"], int(win[0]["cnt"])
        merges.append((t, x, y, x + y, cnt))
        cur = cur.select(
            "w",
            "f",
            F.replace(
                F.col("ws"),
                F.lit(f"·{x}··{y}·"),
                F.lit(f"·{x}{y}·"),
            ).alias("ws"),
        )
        if t % ckpt_every == 0 and t < steps:
            nxt = cur.localCheckpoint()  # eager: truncate lineage
            prev_ckpt.unpersist()
            cur, prev_ckpt = nxt, nxt
    return merges, cur


def q261_bpe_train_iterative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training as the CHECKPOINTED ITERATIVE LOOP at 24 merges —
    where the unrolled q241 plan stops being the right shape (VERDICT
    r10 item 5: analyzer cost and plan depth grow per unrolled merge; a
    32k-merge production vocabulary needs the loop form). Identical
    merge semantics to q241 — same pair counting, same (cnt desc, x, y)
    winner rule, same marker-wrapped leftmost-non-overlap REPLACE — so
    q241's 8-merge table is a PREFIX of this one (pinned in
    tests/test_round11.py); the oracle replays all 24 merges through
    the shared ``_bpe_chain_sql`` generator. Graded: the 24-rule merge
    table. Scale: one corpus tokenize+groupBy, then 24
    vocabulary-sized jobs with lineage truncated every 6 merges — plan
    depth is O(ckpt_every), not O(merges), which is what lets merge
    count grow to real vocab sizes; only 1-row winners ever reach the
    driver."""
    merges, _cur = _bpe_train_iterative(spark, sf_dir)
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("step", LongType()),
            StructField("x", StringType()),
            StructField("y", StringType()),
            StructField("merged", StringType()),
            StructField("cnt", LongType()),
        ]
    )
    return spark.createDataFrame(
        [(t, x, y, m, c) for t, x, y, m, c in merges], schema
    ).orderBy("step")


def _bpe_chain_sql(steps: int = _BPE_STEPS) -> str:
    """WITH-prefix replaying the SAME ``steps`` merges as
    ``_bpe_train_chain`` / ``_bpe_train_iterative``: identical
    wrapped-string representation, identical overlapping pair
    counts / (cnt desc, x, y) winner / leftmost-non-overlap REPLACE
    apply per iteration. Each v{t} carries (wd, f, ws) so both the
    merge-table grade (q241/q261) and the encode grade (q251) read off
    it. The word column is named ``wd`` — ``w`` would collide with the
    per-iteration ``win{t} w`` alias. Every per-step CTE is
    ``AS MATERIALIZED``: duckdb inlines plain CTEs, and v{t} is
    referenced twice (by p{t+1} and v{t+1}), so inlining doubles the
    scan tree per step — fine at 8 steps (2^8 leaf scans), fatal at
    q261's 24 (2^24 → fd exhaustion); materialization computes each
    step once, which is also exactly what the Spark side's lazy
    checkpoints do."""
    return (
        """
WITH w0 AS (
  SELECT w AS wd, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents) s
  WHERE w <> '' GROUP BY w
),
v0 AS (
  SELECT wd, f,
         '·' || ARRAY_TO_STRING(STRING_SPLIT(wd, ''), '··') || '·' AS ws
  FROM w0
)"""
        + "".join(
            f""",
p{t} AS MATERIALIZED (
  SELECT pr.x AS x, pr.y AS y, CAST(SUM(f) AS BIGINT) AS cnt
  FROM (
    SELECT f, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(syms) - 1),
                 i -> struct_pack(x := syms[i], y := syms[i + 1]))) AS pr
    FROM (SELECT f, STRING_SPLIT(TRIM(ws, '·'), '··') AS syms FROM v{t - 1}) q
  ) e GROUP BY 1, 2
),
win{t} AS MATERIALIZED (
  SELECT x, y, cnt FROM p{t} ORDER BY cnt DESC, x, y LIMIT 1),
v{t} AS MATERIALIZED (
  SELECT wd, f, REPLACE(ws, '·' || w.x || '··' || w.y || '·',
                    '·' || w.x || w.y || '·') AS ws
  FROM v{t - 1}, win{t} w
)"""
            for t in range(1, steps + 1)
        )
    )


QUERIES = {
    "q211_bpe_merge_step": q211_bpe_merge_step,
    "q215_vocab_coverage": q215_vocab_coverage,
    "q241_bpe_train": q241_bpe_train,
    "q251_bpe_encode": q251_bpe_encode,
    "q261_bpe_train_iterative": q261_bpe_train_iterative,
}

ORACLES = {
    "q261_bpe_train_iterative": (
        _bpe_chain_sql(_BPE_ITER_STEPS)
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(
            f"SELECT CAST({t} AS BIGINT) AS step, x, y, x || y AS merged, "
            f"cnt FROM win{t}"
            for t in range(1, _BPE_ITER_STEPS + 1)
        )
        + "\n) ORDER BY step"
    ),
    "q241_bpe_train": (
        _bpe_chain_sql()
        + "\nSELECT * FROM (\n"
        + "\nUNION ALL\n".join(
            f"SELECT CAST({t} AS BIGINT) AS step, x, y, x || y AS merged, "
            f"cnt FROM win{t}"
            for t in range(1, _BPE_STEPS + 1)
        )
        + "\n) ORDER BY step"
    ),
    # encode: merged-vocab symbol counts fanned onto corpus occurrences
    "q251_bpe_encode": (
        _bpe_chain_sql()
        + f""",
vc AS (
  SELECT wd, CAST(LENGTH(wd) AS BIGINT) AS n_chars_w,
         CAST(LEN(STRING_SPLIT(TRIM(ws, '·'), '··')) AS BIGINT) AS n_syms
  FROM v{_BPE_STEPS}
),
dt AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        FROM documents) s
  WHERE tok <> ''
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(vc.n_chars_w) AS BIGINT) AS n_chars,
       CAST(SUM(vc.n_syms) AS BIGINT) AS n_bpe_tokens,
       CAST(ROUND(1e4 * SUM(vc.n_chars_w) / SUM(vc.n_syms), 0) AS BIGINT)
         AS chars_per_token_bp
FROM dt JOIN vc ON vc.wd = dt.tok
GROUP BY doc_id
ORDER BY doc_id
LIMIT 200
"""
    ),
    # unordered window-2 pairs; lift graded as the exact integer fraction
    "q211_bpe_merge_step": """
WITH vocab AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
  ) GROUP BY w
), pairs AS (
  SELECT f, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(w) - 1),
                   i -> SUBSTR(w, CAST(i AS INT), 2))) AS pair
  FROM vocab WHERE LEN(w) >= 2
), counts AS (
  SELECT pair, CAST(SUM(f) AS BIGINT) AS cnt FROM pairs GROUP BY pair
), top5 AS (
  SELECT pair, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank
  FROM counts QUALIFY rank <= 5
), win AS (SELECT pair AS wp FROM top5 WHERE rank = 1),
eff AS (
  SELECT CAST(SUM(f * LEN(w)) AS BIGINT) AS n_sym_before,
         CAST(SUM(f * LEN(w))
              - SUM(f * (LEN(w) - LEN(REPLACE(w, win.wp, ''))) / 2)
              AS BIGINT) AS n_sym_after
  FROM vocab, win
)
SELECT rank, pair, cnt, n_sym_before, n_sym_after
FROM top5, eff ORDER BY rank
""",
    # same (cnt desc, tok) total order; 90% gate by cross-multiplication
    "q215_vocab_coverage": """
WITH counts AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents
  ) GROUP BY tok
), ranked AS (
  SELECT cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rank,
         CAST(SUM(cnt) OVER (ORDER BY cnt DESC, tok
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM counts
), tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS t, CAST(COUNT(*) AS BIGINT) AS v
  FROM counts
)
SELECT metric, value FROM (
  SELECT 'cov_bp_at_' || LPAD(CAST(rank AS VARCHAR), 2, '0') AS metric,
         CAST(ROUND(1e4 * cum / tot.t, 0) AS BIGINT) AS value
  FROM ranked, tot WHERE rank IN (5, 10, 20, 30)
  UNION ALL
  SELECT 'v_at_90pct', CAST(MIN(rank) AS BIGINT)
  FROM ranked, tot WHERE cum * 10 >= tot.t * 9
  UNION ALL
  SELECT 'vocab_size', v FROM tot
  UNION ALL
  SELECT 'total_tokens', t FROM tot
) ORDER BY metric
""",
}
