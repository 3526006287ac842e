"""Property test: connected_components == union-find on random graphs
(differential-test idiom of SURVEY.md §5.1; exercises the pointer-jump
and sum-fixpoint paths on shapes the LSH graph never produces)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from pandas_streaming_spark.operators.dedup import connected_components

EDGE = st.tuples(
    st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)
)


def _union_find(n: int, edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id of the set
    return {x: find(x) for x in range(n)}


@pytest.mark.slow
@settings(max_examples=6, deadline=None)
@given(edges=st.lists(EDGE, min_size=0, max_size=20))
def test_connected_components_matches_union_find(spark, edges):
    n = 15
    pairs = [(a, b) for a, b in edges if a != b]
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs_df = spark.createDataFrame(pairs or [(0, 0)], "id_a long, id_b long")
    if not pairs:
        pairs_df = pairs_df.filter("id_a < 0")  # empty edge set
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes_df, pairs_df).collect()
    }
    exp = _union_find(n, pairs)
    assert got == exp
