"""Hierarchical time rollup — continuous-aggregate-style multi-level
aggregation (the "hypertable rollup" shape).

The naive encoding scans the fact table once per granularity. Here the
FINEST granularity is aggregated from raw data exactly once (cached: its
output is #buckets rows — trivially small at any input scale), and every
coarser level re-aggregates a FINER level's output, because
count/sum/min/max compose across bucket containment (avg = sum/count at
read time). At 100 TB that is one full scan + k-1 aggregations over
kilobytes.

Containment is checked, not assumed: ISO weeks do NOT nest inside
months/quarters/years (a week can straddle a month boundary), so a
coarser level only derives from a finer one when every finer bucket lies
inside one coarser bucket (``_nests``). Levels that nothing finer nests
into fall back to aggregating the raw table — correct, at the price of
one extra scan (only reachable when 'week' is the finest granularity
requested together with coarser units).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: truncation units orderable fine → coarse (Spark date_trunc accepts all)
_GRAN_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]


def _nests(a: str, b: str) -> bool:
    """True iff every ``a``-bucket lies inside exactly one ``b``-bucket
    (so ``b`` aggregates can re-aggregate ``a`` output). ISO weeks break
    the otherwise-total order: minute/hour/day nest into week, but week
    nests into nothing coarser, and months/quarters don't nest into
    weeks either."""
    if a == b:
        return True
    if b == "week":
        return a in ("minute", "hour", "day")
    if a == "week":
        return False
    return _GRAN_ORDER.index(a) < _GRAN_ORDER.index(b)


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    granularities: tuple[str, ...] = ("hour", "day", "month"),
    round_to: int = 4,
) -> DataFrame:
    """Aggregate ``value_col`` at several time granularities in one pass.

    Output: (gran, bucket, n, sum_value, min_value, max_value) — one row
    per (granularity, time bucket). ``bucket`` is formatted as
    'yyyy-MM-dd HH:mm:ss' for cross-engine comparability. Each coarser
    level derives from the finest aggregate whenever its buckets nest
    inside the coarser unit (``_nests``); otherwise it aggregates the
    raw table directly (only when 'week' is the finest level and coarser
    units are also requested — weeks straddle month boundaries)."""
    for g in granularities:
        if g not in _GRAN_ORDER:
            raise ValueError(f"unknown granularity {g!r}")
    grans = sorted(granularities, key=_GRAN_ORDER.index)

    ts = F.col(ts_col).cast("timestamp")

    def _from_raw(g):
        return (df.groupBy(F.date_trunc(g, ts).alias("bucket"))
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(value_col).alias("sum_value"),
                     F.min(value_col).alias("min_value"),
                     F.max(value_col).alias("max_value")))

    # tiny (#buckets rows); reused by every coarser level it nests into
    finest = _from_raw(grans[0]).cache()

    levels = []
    for i, g in enumerate(grans):
        if i == 0:
            cur = finest
        elif _nests(grans[0], g):
            cur = (finest.groupBy(F.date_trunc(g, "bucket").alias("bucket"))
                   .agg(F.sum("n").alias("n"),
                        F.sum("sum_value").alias("sum_value"),
                        F.min("min_value").alias("min_value"),
                        F.max("max_value").alias("max_value")))
        else:
            cur = _from_raw(g)
        levels.append(cur.withColumn("gran", F.lit(g)))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out.select(
        "gran",
        F.date_format("bucket", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        "n",
        F.round(F.col("sum_value") + 1e-9, round_to).alias("sum_value"),
        F.round(F.col("min_value") + 1e-9, round_to).alias("min_value"),
        F.round(F.col("max_value") + 1e-9, round_to).alias("max_value"))
