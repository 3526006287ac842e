"""Custom operators the reference supports but Spark lacks as a single
primitive (SURVEY.md §2.3/§2.9/§4.2). Each is a composition of built-in
DataFrame ops where semantics allow; Arrow-batched pandas UDFs only where
they genuinely don't.
"""

from pandas_streaming_spark.operators.asof import asof_join  # noqa: F401
from pandas_streaming_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    lsh_candidate_pairs,
    simhash_fingerprints,
    ngram_jaccard_pairs,
)
from pandas_streaming_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    similarity_join,
    ann_bucketed_topk,
)
from pandas_streaming_spark.operators.skew import (  # noqa: F401
    salted_groupby,
    salted_join,
)
from pandas_streaming_spark.operators.text import (  # noqa: F401
    language_id,
    quality_score,
    token_stats,
    winnow_fingerprints,
)
