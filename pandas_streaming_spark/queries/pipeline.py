"""The end-to-end curation pipeline (VERDICT r8 item 6) split out of
`curation` (module rebalance, the r6/r8/r9 split convention): the
graded 5-stage composition q208 and its staged bench twin.

Same house rules and oracle discipline as the parent module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pandas_streaming_spark.catalog import load_table
from pandas_streaming_spark.operators.sampling import hash_split
from pandas_streaming_spark.operators.text import max_token_multiplicity

_BUCKET_SQL = (
    "CAST(CONCAT('0x', SUBSTR(MD5(CAST({id} AS VARCHAR)), 1, 7)) AS BIGINT) % 100"
)


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (VERDICT r8 item 6): the composition a
# 100 TB training-data build actually runs, as ONE graded + benched unit.
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "to", "and")


def _pipeline_stages(docs: DataFrame, budget: int = 512, tau: float = 0.6):
    """Build the 5-stage curation chain lazily; returns the list of
    (stage_name, DataFrame) boundaries plus the packed frame. Stages:

    1. raw corpus (doc_id, text, source, n_tok)
    2. exact dedup — keep the lowest doc_id per md5(text) (q38/q80 rule)
    3. near-dup drop — EXACT prefix-filtered simjoin at 3-shingle
       Jaccard >= tau (q183 operator: bucketed, no all-pairs); pairwise
       keep-min-id rule (drop every id_b of a verified pair)
    4. quality gates — the q185 Gopher battery, pass-ALL filter
       (integer-only comparisons, no float in the predicate)
    5. leakage-safe split — q186's group-level hash_split on source,
       keep train
    then pack — q85's concat-and-chop into ``budget``-token sequences
    per source shard.

    Scale notes: stages 2/4/5 are one window + narrow maps; stage 3 is
    the dominant cost and inherits prefix_filter_simjoin's shuffle-hash
    pinned, prefix-bounded candidate plan; packing is one running-sum
    window per source. Callers materialize boundaries as they need
    (the graded query localCheckpoints s2/s3 so the pair join and the
    per-stage aggregates share one execution of the expensive stages).
    """
    from pyspark.sql import Window

    from pandas_streaming_spark.operators.dedup import prefix_filter_simjoin
    from pandas_streaming_spark.operators.text import pack_sequences

    s1 = docs.select(
        "doc_id", "text", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    s2 = (
        s1.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    def neardup(s2m: DataFrame) -> DataFrame:
        pairs = prefix_filter_simjoin(s2m, "doc_id", "text", k=3, threshold=tau)
        dropped = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        return s2m.join(dropped, "doc_id", "left_anti")

    def gates(s3m: DataFrame) -> DataFrame:
        wsp = F.split("text", " ")
        g = s3m.select(
            "*",
            F.size(wsp).alias("__n"),
            F.length(F.regexp_replace("text", " ", "")).alias("__sl"),
            F.size(F.array_distinct(wsp)).alias("__nd"),
            F.size(
                F.array_intersect(
                    F.array_distinct(wsp),
                    F.array(*[F.lit(s) for s in _STOPWORDS]),
                )
            ).alias("__ns"),
            max_token_multiplicity(wsp).alias("__mc"),
        )
        # r16 (guide §2.3 project-early): nothing downstream of the
        # gates reads text — the split keys on source, packing on
        # (doc_id, n_tok, source), the graded rows aggregate counts —
        # so the battery's output drops the payload column here instead
        # of carrying it through split/pack/checkpoint.
        return g.filter(
            (F.col("__n") >= 30)
            & (F.col("__n") <= 10000)
            & (F.col("__sl") >= 3 * F.col("__n"))
            & (F.col("__sl") <= 10 * F.col("__n"))
            & (F.col("__nd") * 10 >= 3 * F.col("__n"))
            & (F.col("__ns") >= 2)
            & (F.col("__mc") * 5 <= F.col("__n"))
        ).select("doc_id", "source", "n_tok")

    def split_train(s4m: DataFrame) -> DataFrame:
        return (
            hash_split(s4m, "source", {"train": 80, "val": 10, "test": 10})
            .filter(F.col("split") == "train")
            .drop("split")
        )

    def pack(s5m: DataFrame) -> DataFrame:
        return pack_sequences(
            s5m, "doc_id", "n_tok", budget=budget, partition_by="source"
        )

    return s1, s2, neardup, gates, split_train, pack


def q208_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship end-to-end curation composition, graded stage by
    stage: exact-dedup -> exact near-dup simjoin -> Gopher gate battery
    -> leakage-safe source split -> 512-token packing. One summary row
    per stage boundary (n_docs, n_tokens); the '6_packed' row reports
    total packed sequences. The oracle re-derives every stage from
    scratch in SQL (dedup window, shingle-join Jaccard, gate battery,
    md5 split buckets, per-source telescoped sequence count)."""
    docs = load_table(spark, sf_dir, "documents")
    s1, s2, neardup, gates, split_train, pack = _pipeline_stages(docs)
    # the pair join and four downstream aggregates re-read s2/s3: pin one
    # execution of the expensive stages (same move as q180/q207)
    s2 = s2.localCheckpoint(eager=False)
    s3 = neardup(s2).localCheckpoint(eager=False)
    # r16: measured and REVERTED — pinning gates(s3) too (its three
    # consumers re-run the battery) read 7.28→9.22 s median at sf0.1 in
    # interleaved A/B: the pin serializes branches that previously
    # overlapped inside one job, and the battery re-runs are cheap
    # narrow maps over the s3 checkpoint. Text IS projected out of the
    # battery's output now (guide §2.3) — nothing downstream reads it.
    s4 = gates(s3)
    s5 = split_train(s4)
    packed = pack(s5)

    def row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    packed_row = (
        packed.groupBy("source")
        .agg((F.max("last_seq") + 1).alias("__k"), F.sum("n_tokens").alias("__t"))
        .agg(
            F.coalesce(F.sum("__k"), F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_tokens"),
        )
        .select(F.lit("6_packed").alias("stage"), "n_docs", "n_tokens")
    )
    out = row("1_raw", s1)
    for name, df in (
        ("2_exact_dedup", s2),
        ("3_neardup", s3),
        ("4_gates", s4),
        ("5_split_train", s5),
    ):
        out = out.unionByName(row(name, df))
    return out.unionByName(packed_row).orderBy("stage")


def _semantic_drop(spark: SparkSession, sf_dir: str, survivors: DataFrame):
    """The doc_ids the semantic-dedup stage removes from ``survivors``
    (VERDICT r10 item 4: compose the q240 machinery INTO the pipeline,
    not just beside it): join the surviving docs to their embeddings
    (vec_id ≡ doc_id in the fixtures — the replica machinery shifts both
    by the same KEY_OFFSET, so alignment holds at any scale factor), run
    ``semdedup_scaled`` over that SUBSET, and drop the dominated
    members. Docs without an embedding row pass through untouched (a
    production corpus can't semantic-dedup what it hasn't embedded).

    Shard note: survivors are a FILTERED id set, so ``id // shard_size``
    yields UNDERSIZED clusters rather than ~shard_size/k_fine ones —
    per the q240 duplicate-id-guard analysis that is a recall concern
    (fewer candidate pairs), never a linearity one; the per-cluster
    bound still holds by arithmetic."""
    from pandas_streaming_spark.operators.similarity import semdedup_scaled

    emb = load_table(spark, sf_dir, "embeddings")
    surv = emb.join(
        survivors.select(F.col("doc_id").alias("vec_id")), "vec_id"
    )
    sem = semdedup_scaled(surv, threshold=0.3, shard_size=200, k_fine=4)
    return sem.filter(F.col("kept") == 0).select(
        F.col("vec_id").alias("doc_id")
    )


def q262_curation_pipeline_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline v2 — q208 with a SEMANTIC-dedup stage composed between
    the lexical near-dup simjoin and the quality gates, the ordering the
    SemDeDup paper's production recipe prescribes (lexical dedup first
    shrinks the embedding-stage input; gates after, so borderline docs
    removed as semantic duplicates never reach gate accounting). Graded
    stage by stage like q208: one summary row per boundary (n_docs,
    n_tokens); '7_packed' reports total packed sequences. The oracle
    re-derives EVERY stage from scratch, including the semantic stage's
    membership — shards, fixed-point centroids, nearest-fine assignment,
    and the keep-farthest dominance rule over the stage-3 survivor set.
    Scale: stages inherit their graded twins' shapes (q38 window, q183
    prefix-filter simjoin, q240 sharded SemDeDup, q185 gates, q186
    split, q85 packing) — every stage bucketed/blocked/linear."""
    docs = load_table(spark, sf_dir, "documents")
    s1, s2, neardup, gates, split_train, pack = _pipeline_stages(docs)
    s2 = s2.localCheckpoint(eager=False)
    s3 = neardup(s2).localCheckpoint(eager=False)
    s4 = s3.join(
        _semantic_drop(spark, sf_dir, s3), "doc_id", "left_anti"
    ).localCheckpoint(eager=False)
    # r16: gates pin measured and reverted (see q208 note); the battery
    # output is the projected narrow frame either way.
    s5 = gates(s4)
    s6 = split_train(s5)
    packed = pack(s6)

    def row(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tok"), F.lit(0)).cast("long").alias("n_tokens"),
        ).select(F.lit(name).alias("stage"), "n_docs", "n_tokens")

    packed_row = (
        packed.groupBy("source")
        .agg((F.max("last_seq") + 1).alias("__k"), F.sum("n_tokens").alias("__t"))
        .agg(
            F.coalesce(F.sum("__k"), F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_tokens"),
        )
        .select(F.lit("7_packed").alias("stage"), "n_docs", "n_tokens")
    )
    out = row("1_raw", s1)
    for name, df in (
        ("2_exact_dedup", s2),
        ("3_neardup", s3),
        ("4_semdedup", s4),
        ("5_gates", s5),
        ("6_split_train", s6),
    ):
        out = out.unionByName(row(name, df))
    return out.unionByName(packed_row).orderBy("stage")


def run_curation_pipeline(
    spark: SparkSession, sf_dir: str, budget: int = 512, tau: float = 0.6,
    semantic: bool = False,
) -> dict:
    """Bench harness: execute the q208 pipeline with each stage boundary
    MATERIALIZED (eager localCheckpoint), so the per-stage wall seconds
    are honest (stage k+1 starts from stage k's stored result, not its
    lineage). Returns {"counts", "seconds", "total_sec"} — the 10x
    replica run of this is the closest local rehearsal of the 100 TB
    curation build (VERDICT r8 item 6)."""
    import time as _time

    counts: dict[str, int] = {}
    secs: dict[str, float] = {}

    def mat(name: str, df: DataFrame) -> DataFrame:
        t0 = _time.perf_counter()
        m = df.localCheckpoint()  # eager: runs the stage now
        counts[name] = m.count()
        secs[name] = round(_time.perf_counter() - t0, 3)
        return m

    docs = load_table(spark, sf_dir, "documents")
    s1, s2, neardup, gates, split_train, pack = _pipeline_stages(
        docs, budget=budget, tau=tau
    )
    s1 = mat("1_raw", s1)
    # rebuild downstream stages ON the materialized boundary (the lazy
    # chain from _pipeline_stages would re-run the scan per stage)
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    s2m = mat(
        "2_exact_dedup",
        s1.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn"),
    )
    s3m = mat("3_neardup", neardup(s2m))
    if semantic:  # pipeline v2 (q262): semantic stage between near-dup
        s3m = mat(  # and gates; per-stage seconds stay honest
            "3b_semdedup",
            s3m.join(_semantic_drop(spark, sf_dir, s3m), "doc_id", "left_anti"),
        )
    s4m = mat("4_gates", gates(s3m))
    s5m = mat("5_split_train", split_train(s4m))
    t0 = _time.perf_counter()
    n_seq = (
        pack(s5m)
        .groupBy("source")
        .agg((F.max("last_seq") + 1).alias("__k"))
        .agg(F.coalesce(F.sum("__k"), F.lit(0)).cast("long"))
        .collect()[0][0]
    )
    secs["6_pack"] = round(_time.perf_counter() - t0, 3)
    counts["6_pack"] = int(n_seq)
    for m in (s1, s2m, s3m, s4m, s5m):
        try:
            m.unpersist()
        except Exception:
            pass
    return {
        "counts": counts,
        "seconds": secs,
        "total_sec": round(sum(secs.values()), 3),
    }



def q239_packing_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-strategy design comparison — the report that justifies
    choosing q85's concat-and-chop over q209's whole-doc next-fit (or
    vice versa) for a corpus: both run at budget 512 per source shard,
    graded side by side as total units (sequences/bins), packed tokens,
    and padding waste in bp of capacity. Chop's unit count telescopes to
    ⌈tokens/512⌉ per source (no scan needed); next-fit's comes from the
    pack_bins operator. Scale: one aggregate + one pack_bins pass."""
    from pandas_streaming_spark.operators.text import pack_bins

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tok")
    )
    per_src = docs.groupBy("source").agg(
        F.sum("n_tok").cast("long").alias("tot")
    )
    chop = per_src.agg(
        F.sum(F.floor((F.col("tot") - 1) / 512) + 1)
        .cast("long")
        .alias("n_units"),
        F.sum("tot").cast("long").alias("n_tokens"),
    ).select(F.lit("chop_q85").alias("method"), "n_units", "n_tokens")
    bins = (
        pack_bins(docs, "doc_id", "n_tok", budget=512, partition_by="source")
        .groupBy("source")
        .agg(
            (F.max("bin") + 1).cast("long").alias("__b"),
            F.sum("n_tok").cast("long").alias("__t"),
        )
        .agg(
            F.sum("__b").cast("long").alias("n_units"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
        .select(F.lit("nextfit_q209").alias("method"), "n_units", "n_tokens")
    )
    return (
        chop.unionByName(bins)
        .select(
            "method",
            "n_units",
            "n_tokens",
            F.round(
                F.lit(1e4)
                * (F.col("n_units") * 512 - F.col("n_tokens"))
                / (F.col("n_units") * 512),
                0,
            )
            .cast("long")
            .alias("waste_bp"),
        )
        .orderBy("method")
    )


def q295_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source CORPUS DATACARD — the one-stop governance table a
    dataset release ships (HF dataset cards / Dolma-style corpus
    reports), composing the repo's graded per-metric panels into ONE
    row per source: volume (docs, tokens, chars), language makeup
    (majority language by deterministic mode — count desc, lang asc —
    and Shannon language entropy in e6 nat units, per-term-rounded
    longs, the q181 float discipline: the only float is one ln over
    exact integer ratios), near-dup exposure (q286's pairwise
    keep-smallest removals + retention ppm over the SAME verified
    ≥ 0.8 pair frame), and the Gopher gate battery pass rate (q185's
    five integer gates, all-pass funnel). The oracle re-derives every
    panel from scratch — LSH bands, candidate-scoped exact Jaccard,
    gate flags, language mode/entropy — so the composition is graded,
    not just its parts (the q262 posture applied to reporting instead
    of filtering). Scale: gates/volume are one narrow corpus pass;
    dedup rides the bucketed LSH chain; language stats are a
    |source|×|lang| frame — broadcast size at any corpus."""
    from pyspark.sql import Window

    from pandas_streaming_spark.queries.dedup_q import verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    per = docs.select(
        "source",
        "doc_id",
        F.col("n_chars").cast("long").alias("__nc"),
        F.size(w).cast("long").alias("__n"),
        F.length(F.regexp_replace("text", " ", "")).alias("__sl"),
        F.size(F.array_distinct(w)).alias("__ndist"),
        F.size(
            F.array_intersect(
                F.array_distinct(w),
                F.array(*[F.lit(s) for s in ("the", "a", "of", "to", "and")]),
            )
        ).alias("__nstop"),
        max_token_multiplicity(w).alias("__mx"),
    ).withColumn(
        "__pass",
        (
            (F.col("__n") >= 30)
            & (F.col("__n") <= 10000)
            & (F.col("__sl") >= 3 * F.col("__n"))
            & (F.col("__sl") <= 10 * F.col("__n"))
            & (F.col("__ndist") * 10 >= 3 * F.col("__n"))
            & (F.col("__nstop") >= 2)
            & (F.col("__mx") * 5 <= F.col("__n"))
        ).cast("long"),
    )
    removed = (
        verified_pairs(spark, sf_dir, 8000)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("__rm", F.lit(1))
    )
    base = (
        per.join(removed, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__n").cast("long").alias("n_tokens"),
            F.sum("__nc").cast("long").alias("n_chars"),
            F.sum(F.coalesce("__rm", F.lit(0))).cast("long").alias("nd_removed"),
            F.sum("__pass").cast("long").alias("__npass"),
        )
    )
    sl = docs.groupBy("source", "lang").agg(
        F.count("*").cast("long").alias("__ni")
    )
    wmod = Window.partitionBy("source").orderBy(F.col("__ni").desc(), "lang")
    major = (
        sl.withColumn("__rn", F.row_number().over(wmod))
        .filter(F.col("__rn") == 1)
        .select("source", F.col("lang").alias("major_lang"))
    )
    stot = sl.groupBy("source").agg(F.sum("__ni").alias("__nt"))
    ent = (
        sl.join(stot, "source")
        .select(
            "source",
            F.round(
                F.lit(1e6)
                * F.col("__ni")
                / F.col("__nt")
                * F.log(F.col("__nt") / F.col("__ni")),
                0,
            )
            .cast("long")
            .alias("__term"),
        )
        .groupBy("source")
        .agg(F.sum("__term").cast("long").alias("lang_entropy_e6"))
    )
    return (
        base.join(major, "source")
        .join(ent, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            "major_lang",
            "lang_entropy_e6",
            "nd_removed",
            F.round(
                F.lit(1e6)
                * (F.col("n_docs") - F.col("nd_removed"))
                / F.col("n_docs"),
                0,
            )
            .cast("long")
            .alias("retention_ppm"),
            F.round(F.lit(1e6) * F.col("__npass") / F.col("n_docs"), 0)
            .cast("long")
            .alias("gate_pass_ppm"),
        )
        .orderBy("source")
    )


QUERIES = {
    "q208_curation_pipeline": q208_curation_pipeline,
    "q239_packing_comparison": q239_packing_comparison,
    "q262_curation_pipeline_semantic": q262_curation_pipeline_semantic,
    "q295_corpus_datacard": q295_corpus_datacard,
}


from pandas_streaming_spark.queries.llm import _cos as _cos_sql  # noqa: E402
# (acyclic: llm imports only textq among query modules; reusing the exact
# vec_cosine-mirroring SQL grammar keeps q262's semantic stage and q240's
# oracle bit-identical)

ORACLES = {
    # chop telescopes; next-fit re-walks the q209 recursive CTE
    "q239_packing_comparison": """
WITH RECURSIVE t AS (
  SELECT source, doc_id, LEN(STRING_SPLIT(text, ' ')) AS n,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), per AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS tot FROM t GROUP BY source
), chop AS (
  SELECT 'chop_q85' AS method,
         CAST(SUM(CAST(FLOOR((tot - 1) / 512) AS BIGINT) + 1) AS BIGINT)
           AS n_units,
         CAST(SUM(tot) AS BIGINT) AS n_tokens
  FROM per
), walk AS (
  SELECT source, rn, n, CAST(0 AS BIGINT) AS bin, n AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.n,
         CASE WHEN w.fill + t.n > 512 THEN w.bin + 1 ELSE w.bin END,
         CASE WHEN w.fill + t.n > 512 THEN t.n ELSE w.fill + t.n END
  FROM walk w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
), nf_src AS (
  SELECT source, MAX(bin) + 1 AS b, SUM(n) AS tt FROM walk GROUP BY source
), nextfit AS (
  SELECT 'nextfit_q209' AS method,
         CAST(SUM(b) AS BIGINT) AS n_units,
         CAST(SUM(tt) AS BIGINT) AS n_tokens
  FROM nf_src
)
SELECT method, n_units, n_tokens,
       CAST(ROUND(1e4 * (n_units * 512 - n_tokens) / (n_units * 512), 0)
            AS BIGINT) AS waste_bp
FROM (SELECT * FROM chop UNION ALL SELECT * FROM nextfit)
ORDER BY method
""",
    # the full 5-stage pipeline re-derived: dedup window, shingle-join
    # exact Jaccard with the pairwise keep-min rule, Gopher gate battery,
    # md5 source-split buckets (train = [10, 90)), per-source telescoped
    # sequence count FLOOR((tot-1)/512)+1
    "q208_curation_pipeline": f"""
WITH t AS (
  SELECT doc_id, text, source,
         LEN(STRING_SPLIT(text, ' ')) AS n_tok
  FROM documents
),
s2 AS (
  SELECT doc_id, text, source, n_tok FROM (
    SELECT t.*, ROW_NUMBER() OVER (PARTITION BY MD5(text)
                                   ORDER BY doc_id) AS rn
    FROM t
  ) WHERE rn = 1
),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(tk) - 2, 0)),
                  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM s2)
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
cmn AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dropped AS (
  SELECT DISTINCT id_b FROM cmn
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE 1.0 * c / (na.n + nb.n - c) >= 0.6
),
s3 AS (
  SELECT * FROM s2 WHERE doc_id NOT IN (SELECT id_b FROM dropped)
),
g AS (
  SELECT doc_id, source, n_tok,
         LEN(STRING_SPLIT(text, ' ')) AS n,
         LEN(REPLACE(text, ' ', '')) AS sum_len,
         LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_dist,
         LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                            ['the','a','of','to','and'])) AS n_stop,
         LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                  x -> LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                       y -> y = x)))) AS max_cnt
  FROM s3
),
s4 AS (
  SELECT doc_id, source, n_tok FROM g
  WHERE n >= 30 AND n <= 10000
    AND sum_len >= 3*n AND sum_len <= 10*n
    AND n_dist*10 >= 3*n AND n_stop >= 2 AND max_cnt*5 <= n
),
s5 AS (
  SELECT * FROM s4
  WHERE {_BUCKET_SQL.format(id="source")} >= 10
    AND {_BUCKET_SQL.format(id="source")} < 90
),
per_src AS (SELECT source, SUM(n_tok) AS tot FROM s5 GROUP BY source),
packed AS (
  SELECT CAST(COALESCE(SUM(CAST(FLOOR((tot - 1) / 512.0) AS BIGINT) + 1), 0)
              AS BIGINT) AS n_seq,
         CAST(COALESCE(SUM(tot), 0) AS BIGINT) AS toks
  FROM per_src
)
SELECT stage, n_docs, n_tokens FROM (
  SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS n_tokens FROM t
  UNION ALL SELECT '2_exact_dedup', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s2
  UNION ALL SELECT '3_neardup', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s3
  UNION ALL SELECT '4_gates', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s4
  UNION ALL SELECT '5_split_train', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s5
  UNION ALL SELECT '6_packed', n_seq, toks FROM packed
) ORDER BY stage
""",
}

# pipeline v2: the q208 derivation with the q240 semantic stage spliced
# between near-dup and gates — shards/fixed-point centroids/nearest-fine
# assignment/keep-farthest dominance re-derived over the s3 survivor set
ORACLES["q262_curation_pipeline_semantic"] = f"""
WITH t AS (
  SELECT doc_id, text, source,
         LEN(STRING_SPLIT(text, ' ')) AS n_tok
  FROM documents
),
s2 AS (
  SELECT doc_id, text, source, n_tok FROM (
    SELECT t.*, ROW_NUMBER() OVER (PARTITION BY MD5(text)
                                   ORDER BY doc_id) AS rn
    FROM t
  ) WHERE rn = 1
),
shg AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(tk) - 2, 0)),
                  i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS tk FROM s2)
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shg GROUP BY doc_id),
cmn AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM shg a JOIN shg b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
nddrop AS (
  SELECT DISTINCT id_b FROM cmn
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE 1.0 * c / (na.n + nb.n - c) >= 0.6
),
s3 AS (
  SELECT * FROM s2 WHERE doc_id NOT IN (SELECT id_b FROM nddrop)
),
e AS MATERIALIZED (
  SELECT vec_id, embedding,
         CAST(FLOOR(vec_id / 200) AS BIGINT) AS shard,
         CAST(vec_id % 4 AS BIGINT) AS seed
  FROM embeddings WHERE vec_id IN (SELECT doc_id FROM s3)
),
comps AS (
  SELECT shard, seed, generate_subscripts(embedding, 1) AS dim,
         CAST(ROUND(1000000.0 * CAST(UNNEST(embedding) AS DOUBLE), 0) AS BIGINT) AS c_e6
  FROM e
),
cent AS (
  SELECT shard, seed AS fine,
         LIST(CAST(centroid_e6 AS DOUBLE) / 1000000.0 ORDER BY dim) AS cvec
  FROM (
    SELECT shard, seed, dim,
           CAST(ROUND(CAST(SUM(c_e6) AS DOUBLE) / COUNT(*), 0) AS BIGINT) AS centroid_e6
    FROM comps GROUP BY shard, seed, dim
  ) GROUP BY shard, seed
),
sims AS (
  SELECT e.vec_id, e.shard, c.fine, {_cos_sql("e.embedding", "c.cvec")} AS sim
  FROM e JOIN cent c ON c.shard = e.shard
),
assigned AS MATERIALIZED (
  SELECT vec_id, shard, fine,
         CAST(ROUND(10000.0 * sim, 0) AS BIGINT) AS cent_e4
  FROM (
    SELECT vec_id, shard, fine, sim,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC NULLS LAST, fine) AS rn
    FROM sims
  ) WHERE rn = 1
),
semdrop AS (
  SELECT DISTINCT x.vec_id
  FROM assigned x
  JOIN assigned y ON x.shard = y.shard AND x.fine = y.fine
                 AND x.vec_id <> y.vec_id
  JOIN e ex ON ex.vec_id = x.vec_id
  JOIN e ey ON ey.vec_id = y.vec_id
  WHERE {_cos_sql('ex.embedding', 'ey.embedding')} >= 0.3
    AND (y.cent_e4 < x.cent_e4
         OR (y.cent_e4 = x.cent_e4 AND y.vec_id < x.vec_id))
),
s4 AS (
  SELECT * FROM s3 WHERE doc_id NOT IN (SELECT vec_id FROM semdrop)
),
g AS (
  SELECT doc_id, source, n_tok,
         LEN(STRING_SPLIT(text, ' ')) AS n,
         LEN(REPLACE(text, ' ', '')) AS sum_len,
         LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_dist,
         LEN(LIST_INTERSECT(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                            ['the','a','of','to','and'])) AS n_stop,
         LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(STRING_SPLIT(text, ' ')),
                  x -> LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                       y -> y = x)))) AS max_cnt
  FROM s4
),
s5 AS (
  SELECT doc_id, source, n_tok FROM g
  WHERE n >= 30 AND n <= 10000
    AND sum_len >= 3*n AND sum_len <= 10*n
    AND n_dist*10 >= 3*n AND n_stop >= 2 AND max_cnt*5 <= n
),
s6 AS (
  SELECT * FROM s5
  WHERE {_BUCKET_SQL.format(id="source")} >= 10
    AND {_BUCKET_SQL.format(id="source")} < 90
),
per_src AS (SELECT source, SUM(n_tok) AS tot FROM s6 GROUP BY source),
packed AS (
  SELECT CAST(COALESCE(SUM(CAST(FLOOR((tot - 1) / 512.0) AS BIGINT) + 1), 0)
              AS BIGINT) AS n_seq,
         CAST(COALESCE(SUM(tot), 0) AS BIGINT) AS toks
  FROM per_src
)
SELECT stage, n_docs, n_tokens FROM (
  SELECT '1_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS n_tokens FROM t
  UNION ALL SELECT '2_exact_dedup', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s2
  UNION ALL SELECT '3_neardup', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s3
  UNION ALL SELECT '4_semdedup', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s4
  UNION ALL SELECT '5_gates', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s5
  UNION ALL SELECT '6_split_train', CAST(COUNT(*) AS BIGINT),
         CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) FROM s6
  UNION ALL SELECT '7_packed', n_seq, toks FROM packed
) ORDER BY stage
"""
