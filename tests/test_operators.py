"""Unit tests for custom operators: as-of join edge cases, dedup with
all-duplicate input, similarity with zero vectors (SURVEY.md §5.2 item 3).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pandas_streaming_spark.operators.asof import asof_join
from pandas_streaming_spark.operators.dedup import exact_dedup
from pandas_streaming_spark.operators.similarity import cosine_topk


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_asof_empty_right_side(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a")], "k long, t timestamp, payload string"
    )
    right = spark.createDataFrame([], "k long, rt timestamp, v double, ord long")
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        value_cols=["v"], right_ord="ord",
    ).collect()
    assert len(out) == 1 and out[0]["v"] is None


def test_asof_exact_tie_takes_max_ord(spark):
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t)], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, t, 10.0, 1), (1, t, 20.0, 2), (1, _ts("2024-01-01T11:00:00"), 99.0, 3)],
        "k long, rt timestamp, v double, ord long",
    )
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        value_cols=["v"], right_ord="ord",
    ).collect()
    # rows at exactly left_time are included (<=); max ord wins the tie;
    # the 11:00 row is in the future and must be ignored
    assert out[0]["v"] == 20.0


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00")), (1, _ts("2024-01-01T09:00:00"))],
        "k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 1.0, 1), (1, _ts("2024-01-01T11:30:00"), 2.0, 2)],
        "k long, rt timestamp, v double, ord long",
    )
    rows = {
        r["t"]: r["v"]
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            value_cols=["v"], right_ord="ord",
        ).collect()
    }
    assert rows[_ts("2024-01-01T12:00:00")] == 2.0
    assert rows[_ts("2024-01-01T09:00:00")] is None


def test_asof_rejects_value_col_collision(spark):
    import pytest

    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame([(1, t, 0.0)], "k long, t timestamp, v double")
    right = spark.createDataFrame([(1, t, 1.0)], "k long, rt timestamp, v double")
    with pytest.raises(ValueError, match="already exist in the left frame"):
        asof_join(left, right, key="k", left_time="t", right_time="rt",
                  value_cols=["v"])


def test_compare_cell_handles_inf():
    from pandas_streaming_spark.compare import _cell

    assert _cell(float("inf")) == "inf"
    assert _cell(float("-inf")) == "-inf"
    assert _cell(float("nan")) == "NULL"


def test_exact_dedup_all_duplicates(spark):
    df = spark.createDataFrame([("x",)] * 5, "text string")
    assert exact_dedup(df).count() == 1


def test_deterministic_sample_stable_and_sized(spark, sf_dir):
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.sampling import deterministic_sample

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r.doc_id for r in deterministic_sample(docs, "doc_id", 20).collect())
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(7), "doc_id", 20).collect()
    )
    assert a == b  # membership survives repartitioning (rand() wouldn't)
    n = docs.count()
    assert 0.1 * n < len(a) < 0.3 * n  # ~20%


def test_hash_split_partitions_everything(spark, sf_dir):
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.sampling import hash_split

    emb = load_table(spark, sf_dir, "embeddings")
    counts = {
        r["split"]: r["n"]
        for r in hash_split(emb, "vec_id", {"train": 80, "val": 10, "test": 10})
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sum(counts.values()) == emb.count()  # total, disjoint by CASE
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]

    # layout is a function of the mapping, not dict insertion order
    reordered = {
        r["split"]: r["n"]
        for r in hash_split(emb, "vec_id", {"test": 10, "train": 80, "val": 10})
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert reordered == counts
    import pytest

    with pytest.raises(ValueError, match="sum to 100"):
        hash_split(emb, "vec_id", {"train": 70, "test": 10})


def test_cap_per_group_bounds_and_keeps_lowest(spark, sf_dir):
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    capped = cap_per_group(docs, "source", "doc_id", n=5)
    per = capped.groupBy("source").agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    )
    assert per.filter(F.col("n") > 5).count() == 0
    # kept rows are the lowest doc_ids per source
    lowest = (
        docs.groupBy("source")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .select("source", F.slice("ids", 1, 5).alias("keep"))
    )
    got = capped.groupBy("source").agg(
        F.sort_array(F.collect_list("doc_id")).alias("got")
    )
    diff = got.join(lowest, "source").filter(F.col("got") != F.col("keep"))
    assert diff.count() == 0


def test_cosine_topk_zero_vector(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r["sim_e4"] for r in cosine_topk(df, query_id=0, k=3).collect()}
    assert out[0] == 10000          # self-similarity
    assert out[1] is None           # zero vector -> NULL, not a crash
    assert out[2] == 7071           # cos 45°


def test_minhash_identical_docs_share_signature(spark):
    from pandas_streaming_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "totally different words here x")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: tuple(r["signature"]) for r in minhash_signatures(df, n_hashes=4).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


def test_label_centroids_exact_and_partition_invariant(spark):
    from pandas_streaming_spark.operators.similarity import label_centroids

    df = spark.createDataFrame(
        [(0, [0.1, -0.5]), (0, [0.3, 0.5]), (1, [1.0, 2.0])],
        "label int, embedding array<float>",
    )
    rows = {
        (r["label"], r["dim"]): (r["n_vecs"], r["sum_e6"], r["centroid_e6"])
        for r in label_centroids(df).collect()
    }
    # float32(0.1) = 0.100000001490... -> rounds to exactly 100000 e6 units
    assert rows[(0, 1)] == (2, 400000, 200000)
    assert rows[(0, 2)] == (2, 0, 0)
    assert rows[(1, 1)] == (1, 1000000, 1000000)

    # integer sums are associative: any partitioning gives identical rows
    for n in (1, 7):
        alt = {
            (r["label"], r["dim"]): (r["n_vecs"], r["sum_e6"], r["centroid_e6"])
            for r in label_centroids(df.repartition(n)).collect()
        }
        assert alt == rows


def test_lsh_max_bucket_drops_degenerate_bucket(spark):
    from pandas_streaming_spark.operators.dedup import lsh_candidate_pairs

    # 30 identical docs -> one degenerate bucket (435 pairs if expanded);
    # 2 identical outliers -> a small legitimate bucket.
    rows = [(i, "w x y z common body") for i in range(30)]
    rows += [(100, "rare pair of docs q"), (101, "rare pair of docs q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = lsh_candidate_pairs(df, n_hashes=4, bands=2, k=2, max_bucket=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}

    uncapped = lsh_candidate_pairs(df, n_hashes=4, bands=2, k=2, max_bucket=None)
    assert uncapped.count() == 30 * 29 // 2 + 1


def test_sample_frames_shapes(spark):
    from pandas_streaming_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"a" * 130)), (2, bytearray(b""))],
        "doc_id long, payload binary",
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): r["frame_len"]
        for r in sample_frames(df, frame_len=64, every_n=2).collect()
    }
    # 130 bytes -> frames 0,1,2 (64,64,2); every 2nd keeps 0 and 2
    assert rows == {(1, 0): 64, (1, 2): 2}  # empty payload yields nothing


def test_ann_recall_thresholds(spark):
    """Retrieval-quality floor (VERDICT r3 item 7): determinism grading
    alone can't catch a pruning bug that silently loses recall. Floors
    pinned ~25% under the values measured at round 4 (bucketed n_bits=2
    mean 0.47; IVF n_probe=2 mean 0.43 — data-dependent, not noisy)."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        ivf_topk,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qids = list(range(0, 100, 5))
    rows = ann_recall(emb, qids, k=10, n_bits=2).collect()
    assert [r["query_id"] for r in rows] == qids
    mean_e4 = sum(r["recall_e4"] for r in rows) / len(rows)
    assert mean_e4 >= 3500, (
        f"mean recall {mean_e4}; floors are pinned to measurements on "
        "/root/testdata — if this fails right after a driver testdata "
        "regen, re-measure and re-pin before suspecting a code bug"
    )

    # single-bucket identity: with 0 sign bits the "ANN" candidate set is
    # the whole corpus, so recall must be exactly 1 for every query
    perfect = ann_recall(emb, qids[:5], k=10, n_bits=0).collect()
    assert all(r["recall_e4"] == 10000 for r in perfect), perfect

    # IVF: probing 2 of the learned cells must retain most of the top-10
    hits = 0
    for qid in qids[:10]:
        exact = {r["vec_id"] for r in cosine_topk(emb, qid, k=10).collect()}
        approx = {
            r["vec_id"] for r in ivf_topk(emb, qid, k=10, n_probe=2).collect()
        }
        hits += len(exact & approx)
    assert hits / 100 >= 0.35, (
        f"{hits} hits; data-dependent floor — after a testdata regen, "
        "re-measure and re-pin before suspecting a code bug"
    )


def test_lsh_audit(spark):
    """Dedup-quality floor (twin of test_ann_recall_thresholds): the LSH
    banding must keep finding the true near-dup pairs. Floors pinned
    well under the r4 measurement on sf0.01 (recall 0.96, precision
    0.13 — the truth set is the testdata's near-identical dup families)."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.dedup import lsh_audit

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    (r,) = lsh_audit(docs, threshold=0.5, n_hashes=8, bands=4, k=3).collect()
    assert r["n_truth"] > 0 and r["n_candidates"] > 0, r
    assert r["recall_e4"] >= 8500, (r.asDict(), "data-dependent floor: re-pin after testdata regen")
    assert r["precision_e4"] >= 500, (r.asDict(), "data-dependent floor: re-pin after testdata regen")

    # degenerate guard: an empty corpus yields 0 counts and NULL ratios
    empty = spark.createDataFrame([], "doc_id long, text string")
    (e,) = lsh_audit(empty).collect()
    assert (e["n_candidates"], e["n_truth"], e["n_hits"]) == (0, 0, 0)
    assert e["precision_e4"] is None and e["recall_e4"] is None


def test_simhash_audit_and_wide_fingerprints(spark):
    """Third dedup-quality audit + the r4 block-seeding fix: with one
    md5 per token, bits 33+ of a wide fingerprint froze constant for
    every doc (substring past the 32-char digest is empty). Floors from
    the r4 sf0.01 measurement (precision 0.0435, recall 0.96 at 64
    bits / Hamming<=6)."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.dedup import (
        simhash_audit,
        simhash_fingerprints,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    tails = {
        r["simhash"][32:]
        for r in simhash_fingerprints(docs.limit(8), n_bits=64).collect()
    }
    assert len(tails) > 1, "bits 33-64 must vary across docs"

    (r,) = simhash_audit(docs, threshold=0.5, max_hamming=6, n_bits=64).collect()
    assert r["recall_e4"] >= 8500, (r.asDict(), "data-dependent floor: re-pin after testdata regen")
    assert r["precision_e4"] >= 200, (r.asDict(), "data-dependent floor: re-pin after testdata regen")


def _make_bmp(rows, top_down=False):
    """Assemble an uncompressed 24-bit BMP from rows[y][x] = (r, g, b)."""
    import struct

    h, w = len(rows), len(rows[0])
    stride = (w * 3 + 3) & ~3
    order = range(h) if top_down else reversed(range(h))
    px = b"".join(
        b"".join(bytes((b, g, r)) for (r, g, b) in rows[y]).ljust(stride, b"\x00")
        for y in order
    )
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, (h if not top_down else -h), 1, 24, 0,
        len(px), 2835, 2835, 0, 0,
    )
    return hdr + info + px


def test_decode_bmp_pixel_values(spark):
    from pandas_streaming_spark.operators.multimodal import (
        _fake_decode,
        decode_bmp,
        decode_images,
    )

    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(255, 255, 255), (0, 0, 0), (128, 128, 128)],
    ]
    for top_down in (False, True):
        w, h, rows = decode_bmp(_make_bmp(pixels, top_down=top_down))
        assert (w, h) == (3, 2)
        assert rows == pixels  # padding stripped, BGR->RGB, row order fixed

    # the mapInPandas pipeline takes the real path for BMP payloads and
    # the deterministic stub for everything else (q58 oracle unchanged)
    bmp = _make_bmp(pixels)
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(b"just text bytes"))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: (r["width"], r["height"]) for r in decode_images(df).collect()}
    assert got[1] == (3, 2)
    assert got[2] == _fake_decode(b"just text bytes")

    # truncated pixel array falls back to the stub instead of crashing
    cut = bmp[:-5]
    df2 = spark.createDataFrame([(3, bytearray(cut))], "doc_id long, payload binary")
    (r3,) = decode_images(df2).collect()
    assert (r3["width"], r3["height"]) == _fake_decode(cut)


def test_connected_components_chain_and_singleton(spark):
    from pandas_streaming_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    # a 5-chain (needs several propagation rounds), a 2-clique, a singleton
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (6, 7)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 6}


def test_stratified_sample_rates_and_stability(spark, sf_dir):
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    mixed = stratified_sample(
        docs, "doc_id", "lang", {"en": 100, "de": 0}, default_pct=20
    )
    by_lang = {r["lang"]: r["n"] for r in
               mixed.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    total = {r["lang"]: r["n"] for r in
             docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == total["en"]      # 100% stratum kept whole
    assert "de" not in by_lang                   # 0% stratum dropped
    # default strata: membership == deterministic_sample at the same pct
    other = mixed.filter(~F.col("lang").isin("en", "de")).select("doc_id")
    ref = deterministic_sample(
        docs.filter(~F.col("lang").isin("en", "de")), "doc_id", pct=20
    ).select("doc_id")
    assert other.exceptAll(ref).count() == 0
    assert ref.exceptAll(other).count() == 0


def test_chunk_documents_windows(spark):
    from pandas_streaming_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(7))), (2, "solo")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["n_chunk_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    }
    # doc 1: 7 tokens, step 2 -> starts 0,2,4,6 with sizes 4,4,3,1
    assert rows == {
        (1, 0): (0, 4), (1, 1): (2, 4), (1, 2): (4, 3), (1, 3): (6, 1),
        (2, 0): (0, 1),
    }


def test_pack_sequences_concat_and_chop(spark):
    from pandas_streaming_spark.operators.text import pack_sequences

    df = spark.createDataFrame(
        [("s", 1, 6), ("s", 2, 3), ("s", 3, 8), ("t", 9, 2)],
        "source string, doc_id long, n long",
    )
    got = {
        r["doc_id"]: (r["first_seq"], r["last_seq"])
        for r in pack_sequences(
            df, "doc_id", "n", budget=8, partition_by="source"
        ).collect()
    }
    # s: doc1 tokens [0,6) seq 0; doc2 [6,9) spans seqs 0-1; doc3 [9,17) spans 1-2
    # t: fresh partition, doc9 [0,2) seq 0
    assert got == {1: (0, 0), 2: (0, 1), 3: (1, 2), 9: (0, 0)}


def test_knn_join_two_phase_equals_plain_topk(spark, sf_dir):
    """The salted two-phase rank must be result-identical to a single
    per-query window (the salt only changes partitioning)."""
    from pyspark.sql import Window

    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.functions import vec_cosine
    from pandas_streaming_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    got = knn_join(emb.filter(F.col("vec_id") < 4), emb, k=5, n_salts=3)

    q = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qvec")
    )
    sim = F.round(F.lit(10000.0) * vec_cosine("embedding", "__qvec"), 0).cast("long")
    w = Window.partitionBy("query_id").orderBy(F.col("sim_e4").desc(), "neighbor_id")
    exp = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), sim.alias("sim_e4"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_repetition_score_edges(spark):
    from pandas_streaming_spark.operators.text import repetition_score

    df = spark.createDataFrame(
        [
            (1, "a a a a a a"),          # 4 identical 3-grams -> 7500
            (2, "one two three four"),   # 2 distinct 3-grams -> 0
            (3, "xy zz"),                # < 3 tokens -> no grams, 0
            (4, None),                   # NULL text counts as empty, not NULL
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["n_grams"], r["n_distinct"], r["rep_e4"])
            for r in repetition_score(df).collect()}
    assert rows[1] == (4, 1, 7500)
    assert rows[2] == (2, 2, 0)
    assert rows[3] == (0, 0, 0)
    assert rows[4] == (0, 0, 0)  # matches the q89 oracle's COALESCE-to-0


def test_contamination_check_bounds(spark):
    from pandas_streaming_spark.operators.text import contamination_check

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # both 5-grams in benchmark
            (2, "p q r s t u"),        # disjoint
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "a b c d e f")], "doc_id long, text string")
    rows = {r["doc_id"]: (r["n_matched"], r["contam_e4"])
            for r in contamination_check(docs, bench, k=5).collect()}
    assert rows[1] == (2, 10000)
    assert rows[2] == (0, 0)


def test_assign_to_centroids_separated_clusters(spark):
    from pandas_streaming_spark.operators.similarity import assign_to_centroids

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 1), (3, [0.1, 0.9], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["vec_id"]: r["assigned_label"] for r in assign_to_centroids(df).collect()}
    # well-separated clusters: every vector lands on its own label's centroid
    assert out == {0: 0, 1: 0, 2: 1, 3: 1}


def test_ivf_topk_probe_semantics(spark):
    from pandas_streaming_spark.operators.similarity import cosine_topk, ivf_topk

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0), (1, [0.95, 0.05], 0), (2, [0.9, 0.1], 0),
            (3, [0.0, 1.0], 1), (4, [0.05, 0.95], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    # n_probe=1: only the query's own cell is searched
    one = {r["vec_id"] for r in ivf_topk(df, query_id=0, k=5, n_probe=1).collect()}
    assert one == {0, 1, 2}
    # n_probe = all cells: identical to brute force
    exact = [(r["vec_id"], r["sim_e4"]) for r in cosine_topk(df, query_id=0, k=5).collect()]
    full = [(r["vec_id"], r["sim_e4"]) for r in ivf_topk(df, query_id=0, k=5, n_probe=2).collect()]
    assert full == exact


def test_funnel_strict_order_and_ties(spark):
    """Stage k needs a type-k event STRICTLY after stage k-1: same-ts
    events never advance; pre-signup views don't count unless a later
    view exists; stage times are the EARLIEST qualifying event."""
    rows = [
        # user 1: full ordered chain
        (1, _ts("2024-01-01T10:00:00"), "signup"),
        (1, _ts("2024-01-01T10:01:00"), "view"),
        (1, _ts("2024-01-01T10:02:00"), "click"),
        (1, _ts("2024-01-01T10:03:00"), "purchase"),
        # user 2: view at the exact signup ts -> never advances
        (2, _ts("2024-01-01T10:00:00"), "signup"),
        (2, _ts("2024-01-01T10:00:00"), "view"),
        # user 3: view BEFORE signup, plus a later view; purchase before
        # click time -> reaches view+click but not purchase
        (3, _ts("2024-01-01T09:00:00"), "view"),
        (3, _ts("2024-01-01T10:00:00"), "signup"),
        (3, _ts("2024-01-01T11:00:00"), "view"),
        (3, _ts("2024-01-01T12:00:00"), "click"),
        (3, _ts("2024-01-01T11:30:00"), "purchase"),
        # user 4: never signs up
        (4, _ts("2024-01-01T10:00:00"), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    from pandas_streaming_spark.operators.funnel import funnel_counts

    out = funnel_counts(ev, ["signup", "view", "click", "purchase"]).collect()
    by_stage = {r["stage"]: r["n_users"] for r in out}
    assert by_stage == {"signup": 3, "view": 2, "click": 2, "purchase": 1}
    assert [r["stage_no"] for r in out] == [1, 2, 3, 4]


def test_redact_terms_counts_and_rewrite(spark):
    from pandas_streaming_spark.operators.text import redact_terms

    docs = spark.createDataFrame(
        [(1, "the key and the hash key"), (2, "monkey business"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in redact_terms(docs, r"\b(key|hash)\b", repl="#").collect()
    }
    assert out[1]["n_hits"] == 3  # 'key' twice + 'hash'; word-bounded
    assert out[1]["redacted_len"] == len("the # and the # #")
    assert out[2]["n_hits"] == 0  # 'monkey' must NOT match \bkey\b
    assert out[3]["n_hits"] == 0 and out[3]["redacted_len"] == 0


def test_quantize_int8_range_and_zero_vector(spark):
    from pandas_streaming_spark.operators.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(1, [2.0, -4.0, 1.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
    # scale = 4.0; codes = round(127 * x / 4) = [64, -127, 32]
    assert out[1]["scale_e6"] == 4_000_000
    assert out[1]["codes"] == [64, -127, 32]
    assert max(abs(c) for c in out[1]["codes"]) == 127
    assert out[2]["scale_e6"] == 0 and out[2]["codes"] == [0, 0, 0]


def test_kmeans_step_stable_on_separated_clusters(spark):
    """On well-separated clusters Lloyd is a fixed point: the E-step
    keeps every vector's label and the M-step reproduces the label
    centroids exactly (same fixed-point units)."""
    from pandas_streaming_spark.operators.similarity import (
        kmeans_step,
        label_centroids,
    )

    rows = [
        (1, [1.0, 0.0, 0.0], 0), (2, [0.9, 0.1, 0.0], 0),
        (3, [0.0, 1.0, 0.0], 1), (4, [0.0, 0.9, 0.1], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    stepped = {
        (r["assigned_label"], r["dim"]): (r["n_vecs"], r["centroid_e6"])
        for r in kmeans_step(emb).collect()
    }
    direct = {
        (r["label"], r["dim"]): (r["n_vecs"], r["centroid_e6"])
        for r in label_centroids(emb).collect()
    }
    assert stepped == direct


def test_normalize_embeddings_exact_and_zero(spark):
    from pandas_streaming_spark.operators.similarity import normalize_embeddings

    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r for r in normalize_embeddings(emb).collect()}
    assert out[1]["norm_e6"] == 5_000_000
    assert out[1]["unit_e6"] == [600_000, 800_000]  # (0.6, 0.8) exactly
    assert out[2]["norm_e6"] == 0 and out[2]["unit_e6"] == [0, 0]
    # matryoshka: truncate to 1 dim -> unit vector is sign(x)*1e6
    t = {r["vec_id"]: r for r in normalize_embeddings(emb, dims=1).collect()}
    assert t[1]["norm_e6"] == 3_000_000 and t[1]["unit_e6"] == [1_000_000]


def test_cdc_chunks_cover_and_locality(spark):
    from pandas_streaming_spark.operators.text import cdc_chunks

    base = " ".join(f"w{(i * 7) % 23}" for i in range(120))
    edited = "zzz qqq " + base  # prefix insertion
    docs = spark.createDataFrame(
        [(1, base), (2, edited), (3, "a b")],  # doc 3: shorter than k
        "doc_id long, text string",
    )
    rows = cdc_chunks(docs, k=3, divisor=8).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # chunks tile the token sequence exactly
    assert sum(r["n_tokens"] for r in by_doc[1]) == 120
    assert sum(r["n_tokens"] for r in by_doc[2]) == 122
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 2
    # content-defined locality: a prefix edit leaves MOST chunk hashes
    # intact (fixed-size chunking would shift every chunk)
    h1 = {r["chunk_md5"] for r in by_doc[1]}
    h2 = {r["chunk_md5"] for r in by_doc[2]}
    shared = len(h1 & h2)
    assert shared >= max(1, len(h1) - 2), (len(h1), len(h2), shared)


def test_cdc_and_normalize_are_shuffle_free(spark, sf_dir):
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.similarity import normalize_embeddings
    from pandas_streaming_spark.operators.text import cdc_chunks
    from pandas_streaming_spark.plans import physical_plan

    docs = load_table(spark, sf_dir, "documents")
    assert "Exchange" not in physical_plan(cdc_chunks(docs))
    emb = load_table(spark, sf_dir, "embeddings")
    assert "Exchange" not in physical_plan(normalize_embeddings(emb, dims=16))


def test_text_ops_null_and_unicode_safety(spark):
    """NULL text: redaction null-propagates (SQL semantics), chunking
    emits no chunks; unicode survives both (regexp + md5 operate on the
    decoded string, duckdb parity pinned by the ASCII-guarded oracles)."""
    from pandas_streaming_spark.operators.text import cdc_chunks, redact_terms

    docs = spark.createDataFrame(
        [(1, None), (2, "héllo wörld ünïcode key"), (3, "")],
        "doc_id long, text string",
    )
    red = {r["doc_id"]: r for r in redact_terms(docs, r"\b(key)\b").collect()}
    assert red[1]["n_hits"] is None and red[1]["redacted_md5"] is None
    assert red[2]["n_hits"] == 1
    chunks = cdc_chunks(docs, k=2, divisor=2).collect()
    assert {r["doc_id"] for r in chunks} == {2, 3}  # null doc -> no rows


def test_sessionize_matches_session_window(spark, sf_dir):
    """Per-event labels must reproduce Spark's session_window session
    counts per user (same 30-min gap contract q45 grades), and label
    events in time order starting at 1."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.sessionize import sessionize

    ev = load_table(spark, sf_dir, "events")
    lab = sessionize(ev, gap_minutes=30)
    got = {
        r["user_id"]: r["n"]
        for r in lab.groupBy("user_id")
        .agg(F.max("session_idx").alias("n"))
        .collect()
    }
    exp = {
        r["user_id"]: r["n"]
        for r in ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == exp
    first = lab.orderBy("user_id", "ts", "event_id").limit(1).collect()[0]
    assert first["session_idx"] == 1


def test_sessionize_exact_boundary_merges(spark):
    """Pin the boundary rule: a gap of exactly the threshold MERGES
    (session_window coalesces touching windows); only strictly-greater
    gaps split. Mirrors tests/test_session_property.py for the
    per-event labeling form."""
    import datetime

    from pandas_streaming_spark.operators.sessionize import sessionize

    t0 = datetime.datetime(2024, 1, 1)
    gap = datetime.timedelta(minutes=30)
    rows = [
        (1, 1, t0),
        (2, 1, t0 + gap),  # exactly the threshold -> same session
        (3, 1, t0 + gap + gap + datetime.timedelta(microseconds=1)),  # > -> new
    ]
    lab = sessionize(
        spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp"),
        gap_minutes=30,
    )
    got = {r["event_id"]: r["session_idx"] for r in lab.collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_global_index_matches_window_rank(spark):
    """operators/indexing.global_index == row_number()-1 under the same
    total order, for data whose key range is wildly non-dense (the 10x
    replica shape that broke the id-arithmetic replay split)."""
    import random

    from pyspark.sql import functions as F

    from pandas_streaming_spark.operators.indexing import global_index

    rng = random.Random(20260814)
    rows = [(rng.randrange(10**12) * 2 + (i % 2), i) for i in range(5000)]
    rows = list({(k, v) for k, v in rows})  # unique keys = total order
    df = spark.createDataFrame(rows, "k long, v long").repartition(16)
    baseline = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    gi = global_index(df, ["k"], "idx")
    got = {r["k"]: r["idx"] for r in gi.df.collect()}
    expect = {k: i for i, (k, _) in enumerate(sorted(rows))}
    assert got == expect
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() > baseline
    gi.release()  # explicit contract (ADVICE r7) — the pin must be gone
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == baseline


import pytest


@pytest.mark.parametrize("tau", [0.5, 0.6, 0.75, 0.9])
def test_prefix_filter_simjoin_exactness(spark, tau):
    """PPJoin prefix filtering is EXACT: against the brute-force
    inverted-index join (ngram_jaccard_pairs) on seeded random docs with
    near-duplicate structure, the pair sets must be identical at every
    threshold — a missed candidate (too-short prefix, over-eager size
    filter) or phantom pair would diverge."""
    import random

    from pandas_streaming_spark.operators.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_simjoin,
    )

    rng = random.Random(20260814 + int(tau * 100))
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(60):
        n = rng.randrange(5, 15)
        words = [vocab[rng.randrange(len(vocab))] for _ in range(n)]
        rows.append((i, " ".join(words)))
        if rng.random() < 0.3:  # near-dup: perturb one word
            dup = list(words)
            dup[rng.randrange(len(dup))] = vocab[rng.randrange(len(vocab))]
            rows.append((1000 + i, " ".join(dup)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_simjoin(df, k=3, threshold=tau).collect()
    }
    want = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, k=3, threshold=tau).collect()
    }
    assert got == want


def test_sorted_neighborhood_pairs_reference(spark):
    """SNM candidates == the definitional rank-window pairs: sort by
    (key, id), every pair within 5 ranks — checked against a pure-Python
    enumeration on ids deliberately uncorrelated with the sort key, and
    the index pin is released through the returned hook."""
    import random

    from pyspark.sql import functions as F

    from pandas_streaming_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rng = random.Random(20260815)
    rows = [
        (i * 7 + 3, f"k{rng.randrange(40):02d}") for i in range(200)
    ]  # 40 key values over 200 ids: heavy ties, id tiebreak matters
    df = spark.createDataFrame(rows, "doc_id long, txt string").repartition(8)
    baseline = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    pairs, release = sorted_neighborhood_pairs(
        df, key=F.col("txt"), window=5, id_col="doc_id"
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    expect = {
        (min(order[i], order[j]), max(order[i], order[j]))
        for i in range(len(order))
        for j in range(i + 1, min(i + 6, len(order)))
    }
    assert got == expect
    release()
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == baseline


def test_clamped_running_balance_reference(spark):
    """The saturating scan == the pure-Python fold, under adversarial
    partitioning (repartition(7) destroys input order, ts ties resolved
    by the id tiebreak), including per-row clipped flags."""
    import random

    from pandas_streaming_spark.operators.stateful import (
        clamped_running_balance,
    )

    rng = random.Random(20260815)
    rows = []
    for i in range(300):
        # ts collisions on purpose: i // 3 repeats each ts three times
        rows.append((i % 5, i // 3, i, rng.randrange(-40, 41)))
    df = spark.createDataFrame(
        rows, "k long, ts long, rid long, delta long"
    ).repartition(7)
    out = clamped_running_balance(
        df, "k", ["ts", "rid"], "delta", floor=0, cap=60
    ).collect()
    got = {(r["k"], r["rid"]): (r["bal"], r["clipped"]) for r in out}
    expect = {}
    for k in range(5):
        bal = 0
        for _, ts, rid, d in sorted(
            (r for r in rows if r[0] == k), key=lambda r: (r[1], r[2])
        ):
            raw = bal + d
            bal = min(60, max(0, raw))
            c = -1 if raw < 0 else (1 if raw > 60 else 0)
            expect[(k, rid)] = (bal, c)
    assert got == expect


def test_clamped_scan_numpy_differential():
    """The vectorized kernel == the per-row reference loop on random
    multi-key batches spanning the whole clip-density spectrum (wide
    band: clips rare; tight band floor=0/cap=3: clips almost every row,
    which also exercises the max_rounds fallback), plus cross-batch
    carry hand-off."""
    import random

    import numpy as np

    from pandas_streaming_spark.operators.stateful import (
        _clamped_scan_numpy,
        _clamped_scan_reference,
    )

    rng = random.Random(20260815)
    for trial in range(40):
        n = rng.randrange(1, 120)
        keys = np.array(sorted(rng.randrange(4) for _ in range(n)), dtype=np.int64)
        deltas = np.array([rng.randrange(-9, 10) for _ in range(n)], dtype=np.int64)
        floor, cap = (0, 3) if trial % 2 else (-20, 20)
        carry_key = 0 if trial % 3 == 0 else object()
        carry_bal = rng.randrange(floor, cap + 1)
        # low max_rounds on half the trials forces the fallback path
        mr = 1 if trial % 4 == 0 else 64
        got = _clamped_scan_numpy(keys, deltas, floor, cap, carry_key, carry_bal, max_rounds=mr)
        ref = _clamped_scan_reference(keys, deltas, floor, cap, carry_key, carry_bal)
        assert list(got[0]) == list(ref[0]), f"bals diverge (trial {trial})"
        assert list(got[1]) == list(ref[1]), f"clipped diverge (trial {trial})"
        assert got[2] == ref[2] and got[3] == ref[3]


def test_clamped_running_balance_rejects_bad_input(spark):
    """ADVICE r8: float deltas and output-column collisions fail loudly."""
    import pytest

    from pandas_streaming_spark.operators.stateful import (
        clamped_running_balance,
    )

    fdf = spark.createDataFrame([(1, 1, 1.5)], "k long, ts long, delta double")
    with pytest.raises(ValueError, match="integral type"):
        clamped_running_balance(fdf, "k", ["ts"], "delta", floor=0, cap=10)
    cdf = spark.createDataFrame([(1, 1, 1, 0)], "k long, ts long, delta long, bal long")
    with pytest.raises(ValueError, match="collide"):
        clamped_running_balance(cdf, "k", ["ts"], "delta", floor=0, cap=10)


def test_sorted_neighborhood_rejects_bad_window(spark):
    """ADVICE r8: window=0 would build a DESCENDING F.sequence and emit
    spurious pairs; the operator must refuse instead."""
    import pytest

    from pandas_streaming_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, F.col("text"), window=0)


def test_semdedup_dominance_rule(spark):
    """semdedup == the brute-force definition on a hand-checkable frame:
    two separated clusters; within a cluster, a member is dropped iff a
    cosine>=tau neighbor sits strictly nearer the centroid (ties to the
    smaller id — the SemDeDup keep-farthest rule)."""
    import itertools
    import math

    from pandas_streaming_spark.operators.similarity import semdedup

    # cluster A hugs +x (ids 0-2 nearly parallel => dups), cluster B hugs
    # +y with one oblique member that clears tau with nobody
    rows = [
        (0, "a", [1.0, 0.00, 0.0]),
        (1, "a", [1.0, 0.02, 0.0]),
        (2, "a", [1.0, -0.02, 0.0]),
        (3, "b", [0.0, 1.0, 0.0]),
        (4, "b", [0.0, 1.0, 0.05]),
        (5, "b", [0.6, 0.0, 0.8]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<double>"
    )
    tau = 0.9
    got = {
        r["vec_id"]: (r["assigned_label"], r["kept"])
        for r in semdedup(df, threshold=tau).collect()
    }

    def cos(u, v):
        d = sum(a * b for a, b in zip(u, v))
        return d / (math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v)))

    # brute force: centroids in e6 fixed point per the operator contract
    cents = {}
    for lab in ("a", "b"):
        vs = [v for _, l, v in rows if l == lab]
        cents[lab] = [
            round(round(sum(round(1e6 * x[i]) for x in vs) / len(vs))) / 1e6
            for i in range(3)
        ]
    assign = {}
    for i, _, v in rows:
        best = max(cents, key=lambda l: (cos(v, cents[l]), -ord(l)))
        assign[i] = (best, round(1e4 * cos(v, cents[best])))
    for i, _, v in rows:
        cl, ce = assign[i]
        dominated = any(
            cos(v, w) >= tau
            and (assign[j][1] < ce or (assign[j][1] == ce and j < i))
            for j, _, w in rows
            if j != i and assign[j][0] == cl
        )
        assert got[i] == (cl, 0 if dominated else 1), f"vec {i}"


def test_pack_bins_nextfit_reference(spark):
    """pack_bins == the definitional next-fit loop, including oversized
    docs (own bin) and a tight budget that forces frequent closes."""
    import random

    from pandas_streaming_spark.operators.text import pack_bins

    rng = random.Random(20260815)
    rows = []
    for g in ("a", "b", "c"):
        for i in range(60):
            # mix tiny docs with occasional oversized (> budget) ones;
            # group b STARTS oversized (the bin-0 edge: first doc always
            # takes bin 0 even when it alone exceeds the budget)
            n = 25 if (g == "b" and i == 0) else rng.choice([1, 3, 7, 12, 25])
            rows.append((g, i, n))
    df = spark.createDataFrame(rows, "src string, doc_id long, n long")
    got = {
        (r["src"], r["doc_id"]): (r["bin"], r["fill"])
        for r in pack_bins(
            df, "doc_id", "n", budget=20, partition_by="src"
        ).collect()
    }
    for g in ("a", "b", "c"):
        fill, b, first = 0, 0, True
        for _, i, n in sorted(r for r in rows if r[0] == g):
            if first:
                fill, first = n, False
            elif fill + n > 20:
                b += 1
                fill = n
            else:
                fill += n
            assert got[(g, i)] == (b, fill), f"{g}/{i}"


def test_pack_bins_rejects_bad_input(spark):
    import pytest

    from pandas_streaming_spark.operators.text import pack_bins

    df = spark.createDataFrame([(1, 1)], "doc_id long, n long")
    with pytest.raises(ValueError, match="budget"):
        pack_bins(df, "doc_id", "n", budget=0)
    df2 = spark.createDataFrame([(1, 1, 0)], "doc_id long, n long, bin long")
    with pytest.raises(ValueError, match="collide"):
        pack_bins(df2, "doc_id", "n", budget=10)


def test_curation_pipeline_staged_matches_graded(spark, sf_dir):
    """run_curation_pipeline's materialized per-stage counts == the
    graded q208 summary on the same data (the bench harness and the
    oracle-graded query must describe the same pipeline)."""
    from pandas_streaming_spark.queries.curation import (
        q208_curation_pipeline,
        run_curation_pipeline,
    )

    staged = run_curation_pipeline(spark, sf_dir)
    graded = {
        r["stage"]: (r["n_docs"], r["n_tokens"])
        for r in q208_curation_pipeline(spark, sf_dir).collect()
    }
    for stage in ("1_raw", "2_exact_dedup", "3_neardup", "4_gates",
                  "5_split_train"):
        assert staged["counts"][stage] == graded[stage][0], stage
    assert staged["counts"]["6_pack"] == graded["6_packed"][0]


def test_mmr_rerank_matches_bruteforce(spark, sf_dir):
    """q218's unrolled 5-step MMR plan == a pure-Python greedy reference
    computed from the same e4-rounded relevance/pair sims (the integer
    objective makes the comparison exact, no float tolerance)."""
    import math

    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.queries.vectors import q218_mmr_rerank

    got = [
        (r["step"], r["vec_id"], r["mmr_2e4"])
        for r in q218_mmr_rerank(spark, sf_dir).collect()
    ]

    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(u, v):
        d = sum(float(a) * float(b) for a, b in zip(u, v))
        nu = math.sqrt(sum(float(a) * float(a) for a in u))
        nv = math.sqrt(sum(float(b) * float(b) for b in v))
        return d / (nu * nv)

    q = emb[0]
    rel = {
        i: round(10000.0 * cos(v, q)) for i, v in emb.items() if i != 0
    }
    cand = sorted(rel, key=lambda i: (-rel[i], i))[:20]
    sel, expect = [], []
    for step in range(1, 6):
        best = None
        for c in cand:
            if c in sel:
                continue
            if not sel:
                score = 2 * rel[c]
            else:
                score = 2 * rel[c] - max(
                    round(10000.0 * cos(emb[c], emb[s])) for s in sel
                )
            if best is None or (score, -c) > (best[1], -best[0]):
                best = (c, score)
        sel.append(best[0])
        expect.append((step, best[0], best[1]))
    assert got == expect
