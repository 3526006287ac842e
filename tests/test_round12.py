"""Round-12 additions: candidate-scoped q52 (VERDICT r11 item 2), the
survivor-scoped q274 exact audit (item 3), and the bench external-CPU
contention probe (item 1)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_q52_candidates_cover_brute_top20(spark, sf_dir):
    """The scoping contract: at the graded SFs the LSH candidate set
    must CONTAIN every pair the brute inverted-index top-20 would
    return, so q52's candidate-scoped top-20 is identical to the brute
    top-20 (the q109-audit-style proof the VERDICT asked for)."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.dedup import (
        lsh_candidate_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    brute = ngram_jaccard_pairs(docs, k=3, threshold=0.0)
    jac_e4 = F.round(
        F.lit(10000.0)
        * F.col("common")
        / (F.col("na") + F.col("nb") - F.col("common")),
        0,
    ).cast("long")
    brute_top = (
        brute.select("id_a", "id_b", jac_e4.alias("jac_e4"))
        .orderBy(F.col("jac_e4").desc(), "id_a", "id_b")
        .limit(20)
        .collect()
    )
    cands = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            docs, n_hashes=8, bands=8, k=3, max_bucket=64
        ).collect()
    }
    missing = [
        (r["id_a"], r["id_b"])
        for r in brute_top
        if (r["id_a"], r["id_b"]) not in cands
    ]
    assert missing == [], f"LSH candidates miss brute-top-20 pairs: {missing}"


def test_q52_scoped_equals_brute_top20(spark, sf_dir):
    """End-to-end: the shipped (scoped) q52 output equals the brute
    top-20 row-for-row at the graded SF."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.dedup import ngram_jaccard_pairs
    from pandas_streaming_spark.queries.dedup_q import q52_ngram_jaccard

    docs = load_table(spark, sf_dir, "documents")
    jac_e4 = F.round(
        F.lit(10000.0)
        * F.col("common")
        / (F.col("na") + F.col("nb") - F.col("common")),
        0,
    ).cast("long")
    brute_top = [
        tuple(r)
        for r in ngram_jaccard_pairs(docs, k=3, threshold=0.0)
        .select("id_a", "id_b", jac_e4.alias("jac_e4"))
        .orderBy(F.col("jac_e4").desc(), "id_a", "id_b")
        .limit(20)
        .collect()
    ]
    scoped = [tuple(r) for r in q52_ngram_jaccard(spark, sf_dir).collect()]
    assert scoped == brute_top


def test_q274_exact_audit_scoped_to_survivors(spark, sf_dir):
    """The exact-L2 aggregate must hang off the broadcast top-10 frame
    (a semi-scoped scan), not a full-corpus second pass: the executed
    plan's exact branch must contain a broadcast join, and the output
    stays the audited 10 rows with ADC >= 0 and exact >= 0."""
    from pandas_streaming_spark.queries.vectors import q274_pq_adc_search

    df = q274_pq_adc_search(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    assert all(r["adc_e12"] >= 0 and r["exact_e12"] >= 0 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two broadcast exchanges feed the audit path: top-10 ids into the
    # component scan, then the 10-row exact frame back onto the top-10
    assert plan.count("BroadcastExchange") >= 2


def test_bench_external_cpu_probe_ignores_own_work():
    """The bench gate's contention probe must charge OUR OWN subprocess
    CPU to us (not to 'external'), else every honest run self-triggers
    the re-run path."""
    import subprocess
    import time

    import bench

    probe = bench._contention_probe()
    # burn ~1 CPU-second in a child that stays in our process tree
    subprocess.run(
        ["python", "-c", "x=0\nfor i in range(12_000_000): x+=i"],
        check=True,
    )
    time.sleep(0.2)
    ext = bench._external_cores(probe)
    assert ext < 0.75, f"own subprocess counted as external: {ext} cores"
