"""Round-14 regression tests.

Covers the VERDICT/ADVICE r13 closures:
- the directory-shaped corpus fingerprint now includes per-part mtimes,
  so a regenerated same-size corpus forces a verified-pairs recompute
  (VERDICT item 2 / ADVICE item 4);
- the artifact tag carries the kernel-version token so a changed
  near-dup kernel can never serve stale pairs (ADVICE item 1);
- the artifact GC never reaps a directory touched within the last 30
  minutes, protecting concurrent sessions (ADVICE item 2).
"""

from __future__ import annotations

import os
import shutil

import pytest


def _dir_corpus(tmp_path, sf_dir):
    """A dir-of-parquet documents table (the replica shape) built from
    the single-file sf table, same bytes."""
    src = os.path.join(sf_dir, "documents.parquet")
    d = tmp_path / "documents.parquet"
    d.mkdir()
    shutil.copy(src, d / "part-00000.parquet")
    return str(tmp_path)


def test_dir_fingerprint_tracks_mtime(tmp_path, sf_dir):
    """A regenerated corpus with byte-identical part sizes but a new
    mtime must map to a DIFFERENT fingerprint (ADVICE r13: the dir
    branch used to hash names+sizes only)."""
    from pandas_streaming_spark.queries.dedup_q import _corpus_fingerprint

    corpus = _dir_corpus(tmp_path, sf_dir)
    part = os.path.join(corpus, "documents.parquet", "part-00000.parquet")
    fp1 = _corpus_fingerprint(corpus)
    st = os.stat(part)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    fp2 = _corpus_fingerprint(corpus)
    assert fp1 != fp2  # same sizes, different mtime -> fresh artifact


def test_dir_fingerprint_regeneration_forces_recompute(spark, tmp_path, sf_dir):
    """End-to-end form of the above: verified_pairs on a dir-shaped
    corpus, then 'regenerate' it (same sizes, bumped mtime) — the
    second call must commit a SECOND artifact (recompute), not serve
    the first one."""
    from pandas_streaming_spark.queries.dedup_q import (
        _PAIRS_ALGO_V,
        _corpus_fingerprint,
        verified_pairs,
    )
    from pandas_streaming_spark.streaming.replay import SCRATCH
    from pandas_streaming_spark.streaming.upsert import KeyedUpsertSink

    corpus = _dir_corpus(tmp_path, sf_dir)
    part = os.path.join(corpus, "documents.parquet", "part-00000.parquet")
    root = os.path.join(SCRATCH, "verified_pairs")

    tag1 = f"{_corpus_fingerprint(corpus)}-t8000-{_PAIRS_ALGO_V}"
    n1 = verified_pairs(spark, corpus, 8000).count()
    st = os.stat(part)
    os.utime(part, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000_000))
    tag2 = f"{_corpus_fingerprint(corpus)}-t8000-{_PAIRS_ALGO_V}"
    n2 = verified_pairs(spark, corpus, 8000).count()

    assert tag1 != tag2 and n1 == n2 > 0
    for tag in (tag1, tag2):  # each build committed its own artifact
        sink = KeyedUpsertSink(
            os.path.join(root, tag), key_cols=["id_a", "id_b"], seq_cols=["jac_e4"]
        )
        assert sink.versions() == [1]


def test_algo_version_token_derived_from_kernel():
    """The tag token is DERIVED from the kernel parameter dict — the
    two cannot drift apart (ADVICE r13 item 1)."""
    from pandas_streaming_spark.queries.dedup_q import (
        _PAIRS_ALGO_V,
        _PAIRS_KERNEL,
    )

    assert _PAIRS_KERNEL == {"n_hashes": 8, "bands": 4, "k": 3, "max_bucket": 64}
    assert _PAIRS_ALGO_V == "a2-b4k3m64n8"
    # a parameter change would change the token
    bumped = dict(_PAIRS_KERNEL, bands=8)
    tok = "a2-" + "".join(f"{k[0]}{v}" for k, v in sorted(bumped.items()))
    assert tok != _PAIRS_ALGO_V


def test_gc_spares_recent_artifact_dirs(spark, tmp_path, sf_dir):
    """The GC keeps the 8 mtime-newest dirs AND never reaps anything
    touched in the last 30 minutes — so >8 concurrent recent sessions
    cannot delete each other's artifacts, while dead old fingerprints
    are still collected (ADVICE r13 item 2)."""
    import time

    from pandas_streaming_spark.queries.dedup_q import (
        _PAIRS_ALGO_V,
        _corpus_fingerprint,
        verified_pairs,
    )
    from pandas_streaming_spark.streaming.replay import SCRATCH

    root = os.path.join(SCRATCH, "verified_pairs")
    os.makedirs(root, exist_ok=True)
    now = time.time()
    recent = [os.path.join(root, f"fake-recent-{i}") for i in range(10)]
    old = [os.path.join(root, f"fake-old-{i}") for i in range(10)]
    for i, d in enumerate(recent):
        os.makedirs(d, exist_ok=True)
        os.utime(d, (now - i, now - i))  # all within the last minute
    for i, d in enumerate(old):
        os.makedirs(d, exist_ok=True)
        t = now - 7200 - i
        os.utime(d, (t, t))  # hours old

    # force a first-build (GC runs only in that branch)
    corpus = _dir_corpus(tmp_path, sf_dir)
    tag = f"{_corpus_fingerprint(corpus)}-t8000-{_PAIRS_ALGO_V}"
    shutil.rmtree(os.path.join(root, tag), ignore_errors=True)
    verified_pairs(spark, corpus, 8000).count()

    survivors = set(os.listdir(root))
    for d in recent:  # recent dirs are untouchable regardless of count
        assert os.path.basename(d) in survivors
    # old dead fingerprints beyond the newest-8 were collected
    assert sum(1 for d in old if os.path.basename(d) in survivors) == 0
    for d in recent + old:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("k", [1, 3, 5])
def test_q309_split_invariance(spark, sf_dir, k):
    """The incremental near-dup MERGE's final pair table equals the
    from-scratch full-corpus recompute under ANY shard batch split —
    the repo's core streaming grading contract (VERDICT r13 item 3:
    the shard replay's flagged candidates are delta-verified and
    MERGEd, never recomputed from the corpus)."""
    from pandas_streaming_spark.compare import compare_frames, duckdb_connect
    from pandas_streaming_spark.queries import ORACLES
    from pandas_streaming_spark.queries.streaming_q import (
        q309_incremental_neardup_merge,
    )

    got = q309_incremental_neardup_merge(spark, sf_dir, k=k).toPandas()
    con = duckdb_connect(sf_dir)
    want = con.execute(ORACLES["q309_incremental_neardup_merge"]).df()
    r = compare_frames(f"q309-k{k}", got, want)
    assert r.ok, r.detail


def test_q309_uncapped_kernel_identity(spark, sf_dir):
    """The no-retraction argument: with the UNCAPPED kernel, full-corpus
    candidates = within-corpus candidates ∪ candidates with >=1 shard
    endpoint — verified literally on the test corpus."""
    from pandas_streaming_spark.catalog import load_table
    from pandas_streaming_spark.operators.dedup import lsh_candidate_pairs

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter("doc_id % 5 != 0")

    def pairs(df):
        return {
            (r.id_a, r.id_b)
            for r in lsh_candidate_pairs(
                df, n_hashes=8, bands=4, k=3, max_bucket=None
            ).collect()
        }

    full = pairs(docs)
    base = pairs(corpus)
    shard_ids = {r.doc_id for r in docs.filter("doc_id % 5 = 0").select("doc_id").collect()}
    delta = {p for p in full if p[0] in shard_ids or p[1] in shard_ids}
    assert base <= full and full == base | delta


def test_stateful_no_unused_stringtype():
    """ADVICE r13 item 3: the leftover StringType import is gone and
    the bucket-claim docstring no longer claims a string in state."""
    import inspect

    from pandas_streaming_spark.operators import stateful

    src = inspect.getsource(stateful)
    assert "StringType" not in src
    assert "one long + one string" not in src
