"""Key-skew diagnostics — the planning step before salting.

Every skew mitigation in this engine (salted group-bys in
pipeline/quality.py, ``asof_join(salt=N)``, AQE skew-join) needs to know
WHICH keys are hot and HOW hot. ``key_skew_report`` answers that with
one aggregate pass: the top-k keys by row count, each with its corpus
share and a suggested salt factor (ceil(rows / target_rows_per_task) —
the number of sub-partitions that brings the key's largest task back
under the target).

Scale shape: one partial-aggregating groupBy(key) (the count table is
|distinct keys| rows), a broadcast of the single-row total, and a
``TakeOrderedAndProject`` top-k — no global sort, no collect of the
count table. Deterministic: ties break by key ascending.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    target_rows_per_task: int = 1_000_000,
    round_to: int = 6,
) -> DataFrame:
    """Top-``top_k`` hottest keys: (key, n, share, suggested_salt).

    ``share`` is the key's fraction of all rows (rounded, +1e-9
    tie-break); ``suggested_salt`` is how many sub-partitions the key
    needs so no task exceeds ``target_rows_per_task`` rows (1 = no
    salting needed)."""
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("n")))
    total = df.select(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "key", "n",
            F.round(F.col("n") / F.col("__total") + 1e-9, round_to)
            .alias("share"),
            F.ceil(F.col("n") / F.lit(target_rows_per_task))
            .alias("suggested_salt"))
        .orderBy(F.desc("n"), F.col("key"))
        .limit(top_k)
    )
