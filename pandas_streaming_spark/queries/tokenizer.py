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
from pandas_streaming_spark.functions import hb_sql


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


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer training — the second real
# tokenizer family next to BPE (VERDICT r11 item 6)
# ---------------------------------------------------------------------------

_UNIGRAM_MAX_WORD = 12  # words longer than this are excluded (both engines)
_UNIGRAM_MULTI_VOCAB = 200  # multi-char seed pieces kept (chars always kept)


def _unigram_viterbi_expr() -> str:
    """The E-step as ONE whole-stage JVM expression: per-word Viterbi
    DP via ``aggregate`` over positions 1..len(word), accumulator = the
    array of per-prefix best states ``struct(s: score, p: path)``. At
    position i, candidates end with a vocab piece of length j ∈ {1,2,3}
    (chars are always in the vocab, so every prefix is reachable and the
    fold never dead-ends); the best is picked by score desc then path
    asc via an ``array_sort`` comparator — the same (score DESC, path
    ASC) total order the oracle applies to its full enumeration, and
    the lex-min tie-break COMPOSES under suffix-append (two paths over
    the same prefix spell the same letters, so neither can be a strict
    prefix of the other — first-difference order survives appending).
    Scores are integer HALF-BIT log-probs: w2(c) = length(bin(c*c)) - 1
    = floor(2·log2 c), exact in both engines for the FULL BIGINT range
    (Spark via functions.hb_sql's decimal decomposition — no 64-bit
    square anywhere; duckdb rides HUGEINT), minus the same-quantized
    normalizer
    qt = floor(2·log2 T) per piece — the "integer micro-log-units" that
    keep the grade float-free. Model rides a 1-row broadcast map
    (q242's fastText-shipping pattern), so the corpus pass is a narrow
    map over the DISTINCT-WORD frame with no shuffle."""

    def cand(j: int) -> str:
        piece = f"substr(word, i - {j} + 1, {j})"
        prev = f"element_at(acc, i - {j} + 1)"
        return (
            f"CASE WHEN i >= {j} "
            f"AND element_at(__model, {piece}) IS NOT NULL THEN "
            f"named_struct("
            f"'s', {prev}.s + element_at(__model, {piece}) - __qt, "
            f"'p', CASE WHEN {prev}.p = '' THEN {piece} "
            f"ELSE concat({prev}.p, ' ', {piece}) END) "
            f"ELSE NULL END"
        )

    return f"""aggregate(
  sequence(1, length(word)),
  array(named_struct('s', CAST(0 AS BIGINT), 'p', '')),
  (acc, i) -> concat(acc, array(element_at(array_sort(
      filter(array({cand(1)}, {cand(2)}, {cand(3)}), x -> x IS NOT NULL),
      (a, b) -> CASE WHEN a.s > b.s THEN -1 WHEN a.s < b.s THEN 1
                     WHEN a.p < b.p THEN -1 WHEN a.p > b.p THEN 1
                     ELSE 0 END), 1))),
  acc -> element_at(acc, -1)
)"""


def _unigram_model(docs: DataFrame):
    """Shared unigram-LM chain (q275 grades the EM re-estimation table;
    q277 grades the corpus fertility readout): word-frequency table →
    seed vocab (every char + top-200 substrings of length 2-3 by
    freq-weighted occurrence count) → half-bit integer log scores →
    one Viterbi E-step over distinct words. Returns
    ``(words, vocab, seg)`` where seg = (word, freq, path, score_hb).

    Scale: like BPE (q241), everything after the first groupBy is
    VOCABULARY-sized — the corpus is touched once to build word
    frequencies; the DP runs per distinct word (bounded ≤ 12 chars →
    ≤ 36 interpreted candidate evals each) under a broadcast model."""
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(
            (F.length("word") >= 1) & (F.length("word") <= _UNIGRAM_MAX_WORD)
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        # r16 (guide §2.4/§5, scan-audit worklist): the word-frequency
        # table is the ONE corpus pass of the chain, but lazily composed
        # it was re-planned under every consumer (vocab, model, qt, seg,
        # and each of their consumers) — q275 planned 14 scans of
        # documents. Pin the data-reduced frame; every downstream number
        # is the same exact integer.
        .localCheckpoint(eager=False)
    )
    subs = words.select(
        "freq",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                "filter(array(substr(word, i, 1), "
                "IF(i + 1 <= length(word), substr(word, i, 2), NULL), "
                "IF(i + 2 <= length(word), substr(word, i, 3), NULL)), "
                "x -> x IS NOT NULL)))"
            )
        ).alias("piece"),
    )
    c0 = subs.groupBy("piece").agg(F.sum("freq").cast("long").alias("c0"))
    wm = Window.orderBy(F.col("c0").desc(), "piece")
    multi = (
        c0.filter(F.length("piece") >= 2)
        .withColumn("__rn", F.row_number().over(wm))
        .filter(F.col("__rn") <= _UNIGRAM_MULTI_VOCAB)
        .drop("__rn")
    )
    vocab = (
        c0.filter(F.length("piece") == 1)
        .unionByName(multi)
        .select(
            "piece",
            "c0",
            F.expr(hb_sql("c0")).alias("w2"),
        )
        # vocab-sized (chars + top-200), consumed by model/qt/q275's
        # join: pin it too (r16)
        .localCheckpoint(eager=False)
    )
    model = vocab.agg(
        F.map_from_entries(F.collect_list(F.struct("piece", "w2"))).alias(
            "__model"
        )
    )
    qt = vocab.agg(F.sum("c0").alias("__T")).select(
        F.expr(hb_sql("__T")).alias("__qt")
    )
    seg = (
        words.crossJoin(F.broadcast(model))
        .crossJoin(F.broadcast(qt))
        .select("word", "freq", F.expr(_unigram_viterbi_expr()).alias("__v"))
        .select(
            "word",
            "freq",
            F.col("__v.p").alias("path"),
            F.col("__v.s").cast("long").alias("score_hb"),
        )
    )
    return words, vocab, seg


def q275_unigram_lm_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One EM iteration of unigram-LM (SentencePiece, Kudo 2018)
    tokenizer training: E-step = Viterbi-segment every distinct word
    under the seed model (integer half-bit log-probs, broadcast map,
    deterministic score-desc/path-asc tie-break); M-step = re-estimate
    piece frequencies as the freq-weighted count of each piece in the
    chosen segmentations. Graded: top-30 pieces by re-estimated count
    (ties → piece asc) with seed count c0, re-estimated count c1, and
    both log-probs in half-bit units (logp = floor(2·log2 c) −
    floor(2·log2 T) — every number an exact integer; see
    _unigram_viterbi_expr for why the quantization is cross-engine
    exact). The oracle replays the identical iteration by ENUMERATING
    all vocab segmentations per word (recursive CTE over equi-joined
    DP edges) and picking the same (score desc, path asc) winner —
    so the DP's optimality itself is part of the grade.
    Scale: corpus → word-frequency table once; vocab-sized model
    broadcast; per-word bounded DP; M-step = one explode + map-side
    combined aggregate over segmented DISTINCT words."""
    docs = _t(spark, sf_dir, "documents")
    _words, vocab, seg = _unigram_model(docs)
    mstep = (
        seg.select("freq", F.explode(F.split("path", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("c1"))
        # piece-keyed (vocab-sized), consumed twice (qt1 and the graded
        # join): pin it so the Viterbi E-step runs once (r16)
        .localCheckpoint(eager=False)
    )
    qt0 = vocab.agg(F.sum("c0").alias("__T")).select(
        F.expr(hb_sql("__T")).alias("__qt0")
    )
    qt1 = mstep.agg(F.sum("c1").alias("__T1")).select(
        F.expr(hb_sql("__T1")).alias("__qt1")
    )
    w30 = Window.orderBy(F.col("c1").desc(), "piece")
    return (
        mstep.join(vocab, "piece")
        .withColumn("rank", F.row_number().over(w30).cast("long"))
        .filter(F.col("rank") <= 30)
        .crossJoin(F.broadcast(qt0))
        .crossJoin(F.broadcast(qt1))
        .select(
            "rank",
            "piece",
            "c0",
            "c1",
            (F.col("w2") - F.col("__qt0")).cast("long").alias("logp0_hb"),
            (
                F.expr(hb_sql("c1"))
                - F.col("__qt1")
            )
            .cast("long")
            .alias("logp1_hb"),
        )
        .orderBy("rank")
    )


def q277_unigram_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY by language — the eval every tokenizer ships
    with (pieces per word; chars per piece): apply the unigram-LM
    Viterbi segmentation (q275's E-step — segment once per DISTINCT
    word, then fan the piece counts onto corpus occurrences through a
    word-keyed join, the q251 encode pattern) and aggregate per
    language: token instances, total pieces, total chars, fertility
    (pieces/word) and compression (chars/piece) as exact-integer e3
    ratios. A language whose fertility runs high is under-served by
    the vocab — the readout that drives vocab-size/allocation decisions
    in multilingual tokenizer training. Scale: segmentation cost is
    vocabulary-sized; the per-lang fan-out is one broadcast-ready join
    from the distinct-word frame onto (lang, word) counts."""
    docs = _t(spark, sf_dir, "documents")
    _words, _vocab, seg = _unigram_model(docs)
    per_word = seg.select(
        "word",
        F.size(F.split("path", " ")).cast("long").alias("n_pieces_w"),
        F.length("word").cast("long").alias("n_chars_w"),
    )
    lw = (
        docs.select(
            "lang", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(
            (F.length("word") >= 1) & (F.length("word") <= _UNIGRAM_MAX_WORD)
        )
        .groupBy("lang", "word")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        lw.join(per_word, "word")
        .groupBy("lang")
        .agg(
            F.sum("n").cast("long").alias("n_words"),
            F.sum(F.col("n") * F.col("n_pieces_w")).cast("long").alias("n_pieces"),
            F.sum(F.col("n") * F.col("n_chars_w")).cast("long").alias("n_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_pieces",
            "n_chars",
            F.round(F.lit(1000.0) * F.col("n_pieces") / F.col("n_words"), 0)
            .cast("long")
            .alias("fertility_e3"),
            F.round(F.lit(1000.0) * F.col("n_chars") / F.col("n_pieces"), 0)
            .cast("long")
            .alias("chars_per_piece_e3"),
        )
        .orderBy("lang")
    )


def _unigram_sql() -> str:
    """WITH-prefix replaying the SAME seeding + Viterbi E-step as
    `_unigram_model`, by exhaustive enumeration: `wp` holds the
    equi-joinable DP edges (word, start, piece, Δscore), the recursive
    `seg` expands every vocab segmentation of every word (bounded:
    pieces ≤ 3 chars and words ≤ 12 chars → ≤ 927 paths/word before
    vocab restriction), and `best` picks the (score DESC, path ASC)
    winner per word — the global optimum the Spark DP must equal."""
    return f"""
WITH RECURSIVE words AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
  ) WHERE LEN(word) BETWEEN 1 AND {_UNIGRAM_MAX_WORD} GROUP BY word
),
subs AS (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c0 FROM (
    SELECT freq, UNNEST(LIST_TRANSFORM(
        GENERATE_SERIES(1, LEN(word)), i -> SUBSTR(word, i, 1))) AS piece
    FROM words
    UNION ALL
    SELECT freq, UNNEST(LIST_TRANSFORM(
        GENERATE_SERIES(1, GREATEST(LEN(word) - 1, 0)),
        i -> SUBSTR(word, i, 2)))
    FROM words
    UNION ALL
    SELECT freq, UNNEST(LIST_TRANSFORM(
        GENERATE_SERIES(1, GREATEST(LEN(word) - 2, 0)),
        i -> SUBSTR(word, i, 3)))
    FROM words
  ) GROUP BY piece
),
vocab AS MATERIALIZED (
  SELECT piece, c0,
         CAST(LENGTH(BIN((c0::HUGEINT) * c0)) - 1 AS BIGINT) AS w2
  FROM (
    SELECT piece, c0 FROM subs WHERE LEN(piece) = 1
    UNION ALL
    SELECT piece, c0 FROM (
      SELECT piece, c0 FROM subs WHERE LEN(piece) >= 2
      ORDER BY c0 DESC, piece LIMIT {_UNIGRAM_MULTI_VOCAB})
  )
),
tot AS (
  SELECT CAST(LENGTH(BIN((SUM(c0)::HUGEINT) * SUM(c0))) - 1 AS BIGINT) AS qt
  FROM vocab
),
wsub AS (
  SELECT word, i AS start, SUBSTR(word, i, j) AS piece, j AS pl
  FROM words,
       UNNEST(GENERATE_SERIES(1, LEN(word))) AS s(i),
       (VALUES (1), (2), (3)) lj(j)
  WHERE i + j - 1 <= LEN(word)
),
wp AS MATERIALIZED (
  SELECT ws.word, ws.start, ws.piece, ws.pl, v.w2 - t.qt AS dw
  FROM wsub ws JOIN vocab v USING (piece) CROSS JOIN tot t
),
seg(word, i, score, path) AS (
  SELECT word, 0, CAST(0 AS BIGINT), '' FROM words
  UNION ALL
  SELECT s.word, s.i + e.pl, s.score + e.dw,
         CASE WHEN s.path = '' THEN e.piece
              ELSE s.path || ' ' || e.piece END
  FROM seg s JOIN wp e ON e.word = s.word AND e.start = s.i + 1
),
best AS MATERIALIZED (
  SELECT word, path FROM (
    SELECT word, path,
           ROW_NUMBER() OVER (PARTITION BY word
                              ORDER BY score DESC, path) AS rn
    FROM seg WHERE i = LEN(word)
  ) WHERE rn = 1
)"""


_UNIGRAM_EM_ITERS = 3


def q292_unigram_em_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATIVE unigram-LM training — the full EM loop (Kudo 2018 /
    SentencePiece) that q275's single step seeds, completing the
    tokenizer-training story the way q261's iterative loop completed
    BPE: 3 EM iterations over the FIXED seed support (chars + top-200
    substrings; SentencePiece's vocab pruning is deferred — add-one
    smoothing keeps every support piece scoreable so a piece that loses
    all its mass in iteration i can re-enter in iteration i+1, and the
    grade stays engine-exact). Each iteration: E-step = per-distinct-
    word Viterbi under the smoothed model (w2 = hb(c_i + 1), normalizer
    qt = hb(T_i + V); hb = the half-bit integer quantization
    _unigram_viterbi_expr documents), M-step = freq-weighted recount of
    winning-path pieces. Graded: top-30 pieces by final count (ties →
    piece asc) with the full count TRAJECTORY c0→c1→c2→c3 and the final
    half-bit log-prob. The oracle enumerates every vocab segmentation
    of every word ONCE (the q275 recursive CTE), then re-scores the
    same path set under each iteration's counts — so the DP's
    optimality is graded at ALL THREE models, not just the seed.
    Scale/plan: the corpus is touched once (word-frequency table, then
    localCheckpoint — the distinct-word working set every trainer
    materializes); each iteration is a vocabulary-sized broadcast model
    + one bounded DP pass over distinct words + one map-side-combined
    recount, with the counts frame localCheckpoint'd so plan depth is
    O(1) per iteration at ANY iteration count (the q261 lineage
    policy measured in plans/scale_notes.md)."""
    docs = _t(spark, sf_dir, "documents")
    words, vocab, _seg = _unigram_model(docs)
    words = words.localCheckpoint()
    support = vocab.select("piece", "c0").localCheckpoint()
    cur = support.select("piece", F.col("c0").alias("c"))
    traj = []
    for _i in range(_UNIGRAM_EM_ITERS):
        model = cur.select(
            "piece",
            F.expr(hb_sql("(c + 1)")).alias("w2"),
        )
        mrow = model.agg(
            F.map_from_entries(F.collect_list(F.struct("piece", "w2"))).alias(
                "__model"
            )
        )
        qt = cur.agg((F.sum("c") + F.count("*")).alias("__tv")).select(
            F.expr(hb_sql("__tv")).alias("__qt")
        )
        seg = (
            words.crossJoin(F.broadcast(mrow))
            .crossJoin(F.broadcast(qt))
            .select("word", "freq", F.expr(_unigram_viterbi_expr()).alias("__v"))
        )
        mstep = (
            seg.select("freq", F.explode(F.split("__v.p", " ")).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("__c"))
        )
        cur = (
            support.select("piece")
            .join(mstep, "piece", "left")
            .select(
                "piece", F.coalesce("__c", F.lit(0)).cast("long").alias("c")
            )
            .localCheckpoint()
        )
        traj.append(cur)
    c1f, c2f, c3f = traj
    out = (
        support.join(c1f.withColumnRenamed("c", "c1"), "piece")
        .join(c2f.withColumnRenamed("c", "c2"), "piece")
        .join(c3f.withColumnRenamed("c", "c3"), "piece")
    )
    qt3 = c3f.agg((F.sum("c") + F.count("*")).alias("__tv")).select(
        F.expr(hb_sql("__tv")).alias("__qt3")
    )
    w30 = Window.orderBy(F.col("c3").desc(), "piece")
    return (
        out.withColumn("rank", F.row_number().over(w30).cast("long"))
        .filter(F.col("rank") <= 30)
        .crossJoin(F.broadcast(qt3))
        .select(
            "rank",
            "piece",
            "c0",
            "c1",
            "c2",
            "c3",
            (
                F.expr(hb_sql("(c3 + 1)"))
                - F.col("__qt3")
            )
            .cast("long")
            .alias("logp3_hb"),
        )
        .orderBy("rank")
    )


def q305_tokenizer_duel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vs UNIGRAM-LM fertility DUEL — the decision table a
    tokenizer bake-off actually produces (two trained families, same
    corpus, per-language pieces-per-word side by side; the repo trains
    both: q241/q261 BPE, q275/q292 unigram): encode every distinct word
    under the 8-merge BPE table (q251's vocabulary-sized encode) AND
    under the unigram Viterbi segmentation (q277's), fan both counts
    onto (lang, word) occurrences through ONE keyed join, and grade per
    language: word instances, total BPE tokens, total unigram pieces,
    both fertilities (e3) and their delta (difference of the two
    rounded e3s — exact integers). The oracle replays BOTH training
    chains in one statement (the q251 merge unroll + the q275
    enumeration) — the most end-to-end tokenizer grade in the registry.
    Scale: both trainers are vocabulary-sized after one corpus pass;
    the duel adds one broadcast-ready word-keyed join."""
    docs = _t(spark, sf_dir, "documents")
    _winners, vocab, _dirty = _bpe_train_chain(spark, sf_dir)
    n_syms = F.size(
        F.split(F.expr("trim(BOTH '·' FROM ws)"), "··")
    ).cast("long")
    bpew = vocab.select(F.col("w").alias("word"), n_syms.alias("__nsym"))
    _words, _uvocab, seg = _unigram_model(docs)
    uw = seg.select(
        "word", F.size(F.split("path", " ")).cast("long").alias("__npc")
    )
    lw = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(
            (F.length("word") >= 1) & (F.length("word") <= _UNIGRAM_MAX_WORD)
        )
        .groupBy("lang", "word")
        .agg(F.count("*").cast("long").alias("__n"))
    )
    agg = (
        lw.join(bpew, "word")
        .join(uw, "word")
        .groupBy("lang")
        .agg(
            F.sum("__n").cast("long").alias("n_words"),
            F.sum(F.col("__n") * F.col("__nsym")).cast("long").alias("bpe_tokens"),
            F.sum(F.col("__n") * F.col("__npc"))
            .cast("long")
            .alias("unigram_pieces"),
        )
    )
    bf = F.round(F.lit(1000.0) * F.col("bpe_tokens") / F.col("n_words"), 0).cast(
        "long"
    )
    uf = F.round(
        F.lit(1000.0) * F.col("unigram_pieces") / F.col("n_words"), 0
    ).cast("long")
    return agg.select(
        "lang",
        "n_words",
        "bpe_tokens",
        "unigram_pieces",
        bf.alias("bpe_fertility_e3"),
        uf.alias("unigram_fertility_e3"),
        (uf - bf).cast("long").alias("delta_e3"),
    ).orderBy("lang")


def q282_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS'-LAW vocabulary-growth curve — the scaling measurement
    behind every vocab-size decision (V(n) ≈ K·n^β: if vocabulary still
    grows steeply at the corpus edge, the tokenizer's vocab budget is
    under-provisioned and OOV/fertility will degrade on the next data
    scale-up; q215 answers "how much does a top-V vocab cover TODAY",
    this answers "where is V heading"): docs in doc_id order are cut at
    integral deciles (n_docs_d = N·d div 10, exact both engines), and
    each checkpoint reports cumulative tokens, cumulative DISTINCT
    vocabulary, and the decile's new-type count. The distinct-count is
    computed by first-occurrence rank (min doc rank per token) so the
    10 checkpoints share ONE vocabulary-sized frame instead of 10
    distinct-aggregates. Scale: one explode + min-aggregate (map-side
    combined) + two 10-row broadcast theta joins — the curve costs one
    corpus pass regardless of checkpoint count."""
    docs = _t(spark, sf_dir, "documents")
    ranked = (
        docs.select("doc_id", F.split("text", " ").alias("__t"))
        .withColumn(
            "__r", F.row_number().over(Window.orderBy("doc_id")).cast("long")
        )
    )
    n_row = ranked.agg(F.count("*").cast("long").alias("__N"))
    cps = n_row.select(
        F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"), "__N"
    ).select(
        F.col("decile").cast("long").alias("decile"),
        F.expr("CAST(__N * decile div 10 AS BIGINT)").alias("n_docs"),
    )
    first = (
        ranked.select("__r", F.explode("__t").alias("tok"))
        .groupBy("tok")
        .agg(F.min("__r").alias("fr"))
    )
    v = (
        first.crossJoin(F.broadcast(cps))
        .filter(F.col("fr") <= F.col("n_docs"))
        .groupBy("decile", "n_docs")
        .agg(F.count("*").cast("long").alias("vocab"))
    )
    c = (
        ranked.select("__r", F.size("__t").cast("long").alias("toks"))
        .crossJoin(F.broadcast(cps))
        .filter(F.col("__r") <= F.col("n_docs"))
        .groupBy("decile", "n_docs")
        .agg(F.sum("toks").cast("long").alias("n_tokens_cum"))
    )
    wd = Window.orderBy("decile")
    return (
        v.join(c, ["decile", "n_docs"])
        .withColumn(
            "new_tokens",
            (F.col("vocab") - F.lag("vocab", 1, 0).over(wd)).cast("long"),
        )
        .select("decile", "n_docs", "n_tokens_cum", "vocab", "new_tokens")
        .orderBy("decile")
    )


QUERIES = {
    "q211_bpe_merge_step": q211_bpe_merge_step,
    "q215_vocab_coverage": q215_vocab_coverage,
    "q241_bpe_train": q241_bpe_train,
    "q251_bpe_encode": q251_bpe_encode,
    "q261_bpe_train_iterative": q261_bpe_train_iterative,
    "q275_unigram_lm_step": q275_unigram_lm_step,
    "q277_unigram_fertility": q277_unigram_fertility,
    "q282_heaps_curve": q282_heaps_curve,
    "q292_unigram_em_train": q292_unigram_em_train,
    "q305_tokenizer_duel": q305_tokenizer_duel,
}

ORACLES = {
    # first-occurrence-rank vocabulary counting at integral deciles
    "q282_heaps_curve": """
WITH ranked AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS t,
         CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS r
  FROM documents
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
firsts AS (
  SELECT tok, CAST(MIN(r) AS BIGINT) AS fr
  FROM (SELECT r, UNNEST(t) AS tok FROM ranked) GROUP BY tok
),
cps AS (
  SELECT CAST(d AS BIGINT) AS decile, CAST(nn.n * d // 10 AS BIGINT) AS n_docs
  FROM UNNEST(GENERATE_SERIES(1, 10)) AS g(d), nn
),
v AS (
  SELECT decile, n_docs, CAST(COUNT(*) AS BIGINT) AS vocab
  FROM firsts, cps WHERE fr <= n_docs GROUP BY decile, n_docs
),
c AS (
  SELECT decile, n_docs, CAST(SUM(LEN(t)) AS BIGINT) AS n_tokens_cum
  FROM ranked, cps WHERE r <= n_docs GROUP BY decile, n_docs
)
SELECT v.decile, v.n_docs, c.n_tokens_cum, v.vocab,
       CAST(v.vocab - COALESCE(LAG(v.vocab) OVER (ORDER BY v.decile), 0)
            AS BIGINT) AS new_tokens
FROM v JOIN c USING (decile, n_docs)
ORDER BY decile
""",
    # BOTH training chains in one statement: the q251 BPE merge unroll
    # + the q275 enumeration, fanned onto (lang, word) occurrences
    "q305_tokenizer_duel": _unigram_sql()
    + ",\n"
    + _bpe_chain_sql(_BPE_STEPS).lstrip()[len("WITH ") :]
    + f""",
bpew AS (
  SELECT wd,
         CAST(LEN(STRING_SPLIT(TRIM(ws, '·'), '··')) AS BIGINT) AS n_syms
  FROM v{_BPE_STEPS}
),
uw AS (
  SELECT word, CAST(LEN(STRING_SPLIT(path, ' ')) AS BIGINT) AS n_pieces
  FROM best
),
lw AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
  ) WHERE LEN(word) BETWEEN 1 AND {_UNIGRAM_MAX_WORD} GROUP BY lang, word
)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * b.n_syms) AS BIGINT) AS bpe_tokens,
       CAST(SUM(n * u.n_pieces) AS BIGINT) AS unigram_pieces,
       CAST(ROUND(1000.0 * SUM(n * b.n_syms) / SUM(n), 0) AS BIGINT)
         AS bpe_fertility_e3,
       CAST(ROUND(1000.0 * SUM(n * u.n_pieces) / SUM(n), 0) AS BIGINT)
         AS unigram_fertility_e3,
       CAST(ROUND(1000.0 * SUM(n * u.n_pieces) / SUM(n), 0)
            - ROUND(1000.0 * SUM(n * b.n_syms) / SUM(n), 0) AS BIGINT)
         AS delta_e3
FROM lw JOIN bpew b ON b.wd = lw.word JOIN uw u ON u.word = lw.word
GROUP BY lang ORDER BY lang
""",
    # the SAME enumerated path set re-scored under each EM iteration's
    # smoothed counts — DP optimality graded at all three models
    "q292_unigram_em_train": _unigram_sql()
    + """,
paths AS MATERIALIZED (SELECT word, path FROM seg WHERE i = LEN(word)),
pp AS MATERIALIZED (
  SELECT word, path, UNNEST(STRING_SPLIT(path, ' ')) AS piece FROM paths
),
vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
q1 AS (
  SELECT CAST(LENGTH(BIN(((t + v)::HUGEINT) * (t + v))) - 1 AS BIGINT) AS qt
  FROM (SELECT CAST(SUM(c0) AS BIGINT) AS t FROM vocab), vv
),
s1 AS (
  SELECT pp.word, pp.path,
         CAST(SUM(LENGTH(BIN(((v.c0 + 1)::HUGEINT) * (v.c0 + 1))) - 1)
              - COUNT(*) * qq.qt AS BIGINT) AS s
  FROM pp JOIN vocab v USING (piece) CROSS JOIN q1 qq
  GROUP BY pp.word, pp.path, qq.qt
),
win1 AS MATERIALIZED (
  SELECT word, path FROM (
    SELECT word, path,
           ROW_NUMBER() OVER (PARTITION BY word ORDER BY s DESC, path) AS rn
    FROM s1
  ) WHERE rn = 1
),
cc1 AS MATERIALIZED (
  SELECT pp.piece, CAST(SUM(w.freq) AS BIGINT) AS c
  FROM win1 JOIN pp USING (word, path) JOIN words w USING (word)
  GROUP BY pp.piece
),
q2 AS (
  SELECT CAST(LENGTH(BIN(((t + v)::HUGEINT) * (t + v))) - 1 AS BIGINT) AS qt
  FROM (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS t FROM cc1), vv
),
s2 AS (
  SELECT pp.word, pp.path,
         CAST(SUM(LENGTH(BIN(((COALESCE(m.c, 0) + 1)::HUGEINT)
                             * (COALESCE(m.c, 0) + 1))) - 1)
              - COUNT(*) * qq.qt AS BIGINT) AS s
  FROM pp LEFT JOIN cc1 m USING (piece) CROSS JOIN q2 qq
  GROUP BY pp.word, pp.path, qq.qt
),
win2 AS MATERIALIZED (
  SELECT word, path FROM (
    SELECT word, path,
           ROW_NUMBER() OVER (PARTITION BY word ORDER BY s DESC, path) AS rn
    FROM s2
  ) WHERE rn = 1
),
cc2 AS MATERIALIZED (
  SELECT pp.piece, CAST(SUM(w.freq) AS BIGINT) AS c
  FROM win2 JOIN pp USING (word, path) JOIN words w USING (word)
  GROUP BY pp.piece
),
q3 AS (
  SELECT CAST(LENGTH(BIN(((t + v)::HUGEINT) * (t + v))) - 1 AS BIGINT) AS qt
  FROM (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS t FROM cc2), vv
),
s3 AS (
  SELECT pp.word, pp.path,
         CAST(SUM(LENGTH(BIN(((COALESCE(m.c, 0) + 1)::HUGEINT)
                             * (COALESCE(m.c, 0) + 1))) - 1)
              - COUNT(*) * qq.qt AS BIGINT) AS s
  FROM pp LEFT JOIN cc2 m USING (piece) CROSS JOIN q3 qq
  GROUP BY pp.word, pp.path, qq.qt
),
win3 AS MATERIALIZED (
  SELECT word, path FROM (
    SELECT word, path,
           ROW_NUMBER() OVER (PARTITION BY word ORDER BY s DESC, path) AS rn
    FROM s3
  ) WHERE rn = 1
),
cc3 AS MATERIALIZED (
  SELECT pp.piece, CAST(SUM(w.freq) AS BIGINT) AS c
  FROM win3 JOIN pp USING (word, path) JOIN words w USING (word)
  GROUP BY pp.piece
),
qfin AS (
  SELECT CAST(LENGTH(BIN(((t + v)::HUGEINT) * (t + v))) - 1 AS BIGINT) AS qt
  FROM (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS t FROM cc3), vv
)
SELECT CAST(rank AS BIGINT) AS rank, piece, c0, c1, c2, c3,
       CAST(LENGTH(BIN(((c3 + 1)::HUGEINT) * (c3 + 1))) - 1 - qfin.qt
            AS BIGINT) AS logp3_hb
FROM (
  SELECT v.piece, v.c0,
         COALESCE(a.c, 0) AS c1, COALESCE(b.c, 0) AS c2,
         COALESCE(d.c, 0) AS c3,
         ROW_NUMBER() OVER (ORDER BY COALESCE(d.c, 0) DESC, v.piece) AS rank
  FROM vocab v
  LEFT JOIN cc1 a USING (piece)
  LEFT JOIN cc2 b USING (piece)
  LEFT JOIN cc3 d USING (piece)
) CROSS JOIN qfin
WHERE rank <= 30
ORDER BY rank
""",
    # enumeration-based replay of the Viterbi E-step + M-step recount
    "q275_unigram_lm_step": _unigram_sql()
    + """,
mstep AS (
  SELECT piece, CAST(SUM(freq) AS BIGINT) AS c1 FROM (
    SELECT w.freq, UNNEST(STRING_SPLIT(b.path, ' ')) AS piece
    FROM best b JOIN words w USING (word)
  ) GROUP BY piece
),
t1 AS (
  SELECT CAST(LENGTH(BIN((SUM(c1)::HUGEINT) * SUM(c1))) - 1 AS BIGINT) AS qt1
  FROM mstep
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY c1 DESC, piece) AS BIGINT) AS rank,
       piece, v.c0, m.c1,
       CAST(v.w2 - t.qt AS BIGINT) AS logp0_hb,
       CAST(LENGTH(BIN((m.c1::HUGEINT) * m.c1)) - 1 - t1.qt1 AS BIGINT)
         AS logp1_hb
FROM mstep m JOIN vocab v USING (piece) CROSS JOIN tot t CROSS JOIN t1
QUALIFY rank <= 30
ORDER BY rank
""",
    # same segmentation fanned onto (lang, word) occurrence counts
    "q277_unigram_fertility": _unigram_sql()
    + f""",
pw AS (
  SELECT word, CAST(LEN(STRING_SPLIT(path, ' ')) AS BIGINT) AS n_pieces_w,
         CAST(LEN(word) AS BIGINT) AS n_chars_w
  FROM best
),
lw AS (
  SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
  ) WHERE LEN(word) BETWEEN 1 AND {_UNIGRAM_MAX_WORD} GROUP BY lang, word
)
SELECT lang,
       CAST(SUM(n) AS BIGINT) AS n_words,
       CAST(SUM(n * n_pieces_w) AS BIGINT) AS n_pieces,
       CAST(SUM(n * n_chars_w) AS BIGINT) AS n_chars,
       CAST(ROUND(1000.0 * SUM(n * n_pieces_w) / SUM(n), 0) AS BIGINT)
         AS fertility_e3,
       CAST(ROUND(1000.0 * SUM(n * n_chars_w) / SUM(n * n_pieces_w), 0)
            AS BIGINT) AS chars_per_piece_e3
FROM lw JOIN pw USING (word)
GROUP BY lang
ORDER BY lang
""",
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
