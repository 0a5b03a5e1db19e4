"""Operator surface: rule engine + training-data pipeline operators."""

from validatelite_spark.operators.engine import RuleEngine
from validatelite_spark.operators.dedup import (
    dedup_groups,
    exact_dedup,
    keep_representatives,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from validatelite_spark.operators.joins import asof_join, range_join
from validatelite_spark.operators.multimodal import (
    decode_media,
    frame_sample,
)
from validatelite_spark.operators.rollup import time_rollup
from validatelite_spark.operators.sampling import (
    hash_sample,
    token_budget_filter,
)
from validatelite_spark.operators.similarity import (
    brute_force_topk,
    embedding_cosine_pairs,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
)

__all__ = [
    "RuleEngine",
    "asof_join",
    "brute_force_topk",
    "decode_media",
    "dedup_groups",
    "embedding_cosine_pairs",
    "exact_dedup",
    "frame_sample",
    "hash_sample",
    "ivf_topk",
    "keep_representatives",
    "kmeans_centroids",
    "lsh_topk",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "range_join",
    "simhash_pairs",
    "time_rollup",
    "token_budget_filter",
]
