"""Operator surface: rule engine + training-data pipeline operators."""

from validatelite_spark.operators.engine import RuleEngine
from validatelite_spark.operators.dedup import (
    dedup_groups,
    exact_dedup,
    incremental_exact_dedup,
    incremental_minhash_pairs,
    keep_representatives,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    url_decontaminate,
    url_dedup,
)
from validatelite_spark.operators.lines import (
    chunk_dedup,
    line_dedup,
    strip_blocklisted_lines,
    top_lines,
)
from validatelite_spark.operators.joins import asof_join, range_join
from validatelite_spark.operators.multimodal import (
    decode_media,
    frame_sample,
)
from validatelite_spark.operators.dsir import (
    dsir_resample,
    dsir_weights,
)
from validatelite_spark.operators.rollup import time_rollup
from validatelite_spark.operators.semdedup import (
    semdedup_flags,
    semdedup_keep,
)
from validatelite_spark.operators.domains import (
    domain_blocklist_filter,
    domain_quality_filter,
    domain_stats,
)
from validatelite_spark.operators.drift import (
    categorical_drift,
    drift_report,
)
from validatelite_spark.operators.overlap import (
    rule_marginals,
    rule_overlap,
)
from validatelite_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)
from validatelite_spark.operators.sampling import (
    hash_sample,
    mixture_budget_filter,
    prefix_sums,
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
    "chunk_dedup",
    "decode_media",
    "dedup_groups",
    "categorical_drift",
    "domain_blocklist_filter",
    "domain_quality_filter",
    "domain_stats",
    "drift_report",
    "dsir_resample",
    "dsir_weights",
    "embedding_cosine_pairs",
    "exact_dedup",
    "frame_sample",
    "hash_sample",
    "incremental_exact_dedup",
    "incremental_minhash_pairs",
    "ivf_topk",
    "keep_representatives",
    "kmeans_centroids",
    "line_dedup",
    "lsh_topk",
    "minhash_lsh_pairs",
    "mixture_budget_filter",
    "ngram_jaccard_pairs",
    "pack_sequences",
    "packing_stats",
    "prefix_sums",
    "range_join",
    "rule_marginals",
    "rule_overlap",
    "semdedup_flags",
    "semdedup_keep",
    "simhash_pairs",
    "strip_blocklisted_lines",
    "time_rollup",
    "token_budget_filter",
    "top_lines",
    "url_decontaminate",
    "url_dedup",
]
