"""Leakage-safe train/valid/test splitting.

Splitting web text by ROW leaks: near-duplicate pages from one site
land on both sides of the split and the eval set stops measuring
generalization (the classic train/test contamination mode alongside
benchmark n-gram contamination, handled by
``operators/repetition.decontaminate``). The fix is to split by GROUP
— every page of a domain goes to exactly one split — which is what
``leakage_safe_split`` guarantees by construction: the split label is
a pure function of the group key's hash, so it is deterministic,
engine-portable (the ``sampling._hash_bucket`` md5 contract), and
stable under re-partitioning, incremental appends, and re-crawls (a
domain seen next month lands in the same split).

Scale shape: assignment is one pure-Column projection (no shuffle, no
lookup table to distribute); the summary is one aggregate; the leakage
checker is one (group, split) distinct + one group aggregate — all
linear, all partition-count invariant.

reference: litedatum/validatelite has no splitting surface; the
group-atomic hash contract follows operators/sampling.hash_sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validatelite_spark.operators.sampling import _DENOM, _hash_bucket

#: default split fractions (order defines threshold precedence)
DEFAULT_WEIGHTS: dict[str, float] = {
    "train": 0.9, "valid": 0.05, "test": 0.05}


def _split_col(by: str, weights: dict[str, float], seed: int):
    """Pure-Column split label from the group key's hash bucket.
    NULL group keys hash as the bare seed string (concat_ws skips
    NULLs) — all NULL-key rows land together in one split, which is
    the leakage-safe behavior for an unattributable page."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = _hash_bucket(by, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * _DENOM))
        expr = (F.when(cond, name) if expr is None
                else expr.when(cond, name))
    last = names[-1]
    return (F.lit(last) if expr is None else expr.otherwise(last))


def leakage_safe_split(
    df: DataFrame,
    by: str = "source",
    weights: dict[str, float] | None = None,
    seed: int = 0,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label such that all rows sharing
    ``by`` (the leakage unit — registrable domain for web text) get
    the SAME label. One projection, no shuffle."""
    w = weights or DEFAULT_WEIGHTS
    return df.withColumn(split_col, _split_col(by, w, seed))


def split_summary(
    df: DataFrame,
    by: str = "source",
    weights: dict[str, float] | None = None,
    seed: int = 0,
    size_col: str | None = None,
) -> DataFrame:
    """(split, n_docs, n_groups[, size]) — one aggregate over the
    assigned corpus, for checking realized shares against the target
    weights (hash splits are exact in expectation; realized share
    tracks the group-size distribution)."""
    w = weights or DEFAULT_WEIGHTS
    aggs = [F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(by).alias("n_groups")]
    if size_col:
        aggs.append(F.sum(size_col).alias("size"))
    return (leakage_safe_split(df, by, w, seed)
            .groupBy("split").agg(*aggs).orderBy("split"))


def split_leakage(
    df: DataFrame,
    by: str = "source",
    split_col: str = "split",
) -> DataFrame:
    """Groups present in MORE than one split: (group, n_splits,
    splits). Empty for any assignment produced by
    ``leakage_safe_split``; non-empty when split corpora from
    different runs/seeds/policies were unioned — the audit a training
    pipeline runs before trusting its eval set. NULL groups
    participate (eqNullSafe semantics via groupBy, which keeps NULL
    keys)."""
    return (df.select(F.col(by).alias("grp"), F.col(split_col))
            .distinct()
            .groupBy("grp")
            .agg(F.countDistinct(split_col).alias("n_splits"),
                 F.sort_array(F.collect_set(split_col)).alias("splits"))
            .filter(F.col("n_splits") > 1)
            .orderBy("grp"))
