"""Crawl snapshot delta: new / gone / changed / unchanged per key.

Re-crawl pipelines budget work by the delta between two snapshots —
which urls appeared, vanished, or changed content — before any
re-filtering runs (the changed+new slice is what flows into
``dedup.incremental_dedup``). The reference compares nothing across
tables (row-local rules); closest surface is its uniqueness metrics
(reference: core/executors/uniqueness_executor.py). This operator is
the two-snapshot census those pipelines start from, and composes with
``operators/drift.py`` (distribution drift) for the content side.

Content identity is the corpus fingerprint
(``functions/textquality.fingerprint``: md5 of whitespace-normalized
lowercased text — engine-portable). Comparison is null-safe
(``eqNullSafe``): two NULL-text versions of a url count as unchanged,
NULL-vs-text counts as changed (a plain ``=`` would silently call
every NULL pair "changed").

Scale shape: each snapshot reduces to (key, min-fingerprint) with ONE
map-side-combining groupBy (duplicate keys within a snapshot —
re-fetches — collapse deterministically to the min fingerprint, so the
delta is well-defined and partition-invariant); the full-outer join
shuffles on the key with AQE free to pick the strategy; the census is
a tiny groupBy(status). No window, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validatelite_spark.functions.textquality import fingerprint

STATUSES = ("changed", "gone", "new", "unchanged")


def _fp_table(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    return (df.select(F.col(key_col).alias("k"),
                      fingerprint(F.col(text_col)).alias("fp"))
            .groupBy("k").agg(F.min("fp").alias("fp")))


def snapshot_delta(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(key, status) over the union of both snapshots' keys; status in
    ``STATUSES``."""
    o = _fp_table(old, key_col, text_col)
    n = (_fp_table(new, key_col, text_col)
         .withColumnRenamed("k", "nk").withColumnRenamed("fp", "nfp"))
    j = o.join(n, F.col("k").eqNullSafe(F.col("nk")), "full_outer")
    status = (F.when(F.col("k").isNull() & F.col("nk").isNull(),
                     F.lit(None))  # unreachable; keeps CASE total
              .when(F.col("k").isNull(), F.lit("new"))
              .when(F.col("nk").isNull(), F.lit("gone"))
              .when(F.col("fp").eqNullSafe(F.col("nfp")),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return (j.select(F.coalesce(F.col("k"), F.col("nk")).alias(key_col),
                     status.alias("status")))


def snapshot_delta_report(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(status, n) census of the delta — the re-crawl budget line."""
    return (snapshot_delta(old, new, key_col, text_col)
            .groupBy("status").agg(F.count(F.lit(1)).alias("n")))
