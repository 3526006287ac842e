"""Property test: the md5 hash-bucket that q74–q76's curation operators
cut on is computed identically by Spark and duckdb for arbitrary ids —
the cross-engine contract everything in operators/sampling.py rests on.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pandas_streaming_spark.operators.sampling import hash_bucket

IDS = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62),
    min_size=1,
    max_size=50,
    unique=True,
)


@pytest.mark.slow
@settings(max_examples=10, deadline=None)
@given(ids=IDS)
def test_hash_bucket_matches_duckdb(spark, ids):
    sdf = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["b"]
        for r in sdf.select("id", hash_bucket("id").alias("b")).collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.execute(
            "SELECT id, CAST(CONCAT('0x', SUBSTR(MD5(CAST(id AS VARCHAR)), 1, 7)) "
            "AS BIGINT) % 100 AS b FROM (SELECT UNNEST(?) AS id)",
            [ids],
        ).fetchall()
    )
    con.close()
    assert got == exp
    assert all(0 <= b < 100 for b in got.values())
