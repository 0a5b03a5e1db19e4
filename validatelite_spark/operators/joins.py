"""Join operators Spark's API lacks, composed scale-safe.

- **as-of join** (merge-asof): for every left row, the latest right row
  with ``right.ts <= left.ts`` within the same key. Spark has no native
  ASOF; the naive encoding (non-equi range join + groupBy max) explodes
  quadratically on hot keys. This implementation is the linear shape:
  union both sides, ONE shuffle on the key, sort within partitions, and
  a running ``last(right, ignorenulls=True)`` window carries the most
  recent right row forward onto each left row. Cost is a single
  sort-shuffle of |L|+|R| rows at any scale; skewed keys behave exactly
  like any window partition (salt upstream if one key dominates).

DuckDB's native ``ASOF JOIN`` is the oracle for the driver query
(__spark_entry__.py: asof_purchase_click).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "right_",
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join (pandas ``merge_asof`` semantics).

    Output: every left row + the columns of the latest right row with
    ``right_ts <= left_ts`` and the same ``by`` key, prefixed with
    ``right_prefix`` (NULL columns when no right row precedes). At equal
    timestamps the right row matches (inclusive). ``tiebreak``: a right
    column ordered ascending to break equal-timestamp ties between
    right rows deterministically (e.g. an id — the max wins)."""
    lcols = left.columns
    rcols = right.columns
    l = left.select(
        F.col(by).alias("__by"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_l"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(
            right.select(F.struct(*rcols).alias("s")).schema["s"].dataType
        ).alias("__r"))
    r = right.select(
        F.col(by).alias("__by"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_l"),
        F.lit(None).cast(
            left.select(F.struct(*lcols).alias("s")).schema["s"].dataType
        ).alias("__l"),
        (F.col(tiebreak).cast("long") if tiebreak
         else F.lit(0).cast("long")).alias("__tb"),
        F.struct(*[F.col(c) for c in rcols]).alias("__r"))
    # right rows sort BEFORE left at the same timestamp (__is_l 0 < 1)
    # so an equal-ts right row is visible to the left row (inclusive);
    # among equal-ts right rows the max tiebreak wins (last in order)
    w = (Window.partitionBy("__by")
         .orderBy("__ts", "__is_l", "__tb")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l.unionByName(r)
               .withColumn("__rm", F.last("__r", ignorenulls=True).over(w))
               .filter(F.col("__is_l") == 1))
    out = [F.col(f"__l.{c}").alias(c) for c in lcols]
    out += [F.col(f"__rm.{c}").alias(f"{right_prefix}{c}") for c in rcols]
    return matched.select(*out)
