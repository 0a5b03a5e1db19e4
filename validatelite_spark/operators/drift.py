"""Snapshot drift detection: distribution comparison between two
corpus snapshots (crawl N vs crawl N+1, or pre-filter vs post-filter).

A validation engine that only checks rules row-by-row misses the
second failure mode of a living pipeline: every row passes, but the
DISTRIBUTION moved — the new crawl's document lengths collapsed, a
filter started eating one language, perplexity crept up. This module
produces the standard drift report over numeric columns:

- **PSI** (population stability index, Σ (p_ref−p_new)·ln(p_ref/p_new)
  over equal-width bins; the credit-scoring / ML-monitoring staple —
  rule of thumb: <0.1 stable, 0.1–0.25 moderate shift, >0.25 major)
- **KS statistic** (max CDF gap over the same bin boundaries — the
  binned Kolmogorov-Smirnov distance; NULLs excluded from CDFs but
  reported separately, since a nullness shift is its own drift)

Scale shape: ONE fused aggregate per snapshot (the fused-rules shape
— cols × bins conditional sums in a single partial+final agg, one
FileScan each, no UDFs). Bin ranges come from the REFERENCE snapshot:
one tiny min/max agg whose single row is collected and inlined as
literals (a cross-joined range subplan would re-evaluate the full
reference scan inside BOTH histogram plans). Everything after the two
fused aggs operates on a cols × (bins+2) row table.

Determinism / oracle parity: bin edges, the epsilon smoothing, and
the final rounding are all fixed here and replayed verbatim in the
DuckDB oracle (CLAUDE.md rule 2: identical rounding both sides).

Reference: no drift surface exists in the reference (its
metrics are per-run absolutes); this extends its validation-report
idea (core/results.py) across snapshots for the monitoring mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: smoothing added to every bin proportion numerator (and bins×eps to
#: the denominator) so empty bins cannot blow up the PSI log — the
#: standard monitoring-library convention, fixed for oracle parity
PSI_EPS = 1e-4


def _bin_expr(col: str, lo, hi, bins: int):
    """Equal-width bin id on REFERENCE range [lo, hi] (python floats,
    inlined as literals): -1 for NULL, clamped to [0, bins-1]
    (new-snapshot outliers land in the edge bins — exactly what PSI
    wants to see), bin 0 when the reference range is degenerate or the
    reference column was all-NULL."""
    x = F.col(col).cast("double")
    if lo is None or hi is None or hi - lo <= 0:
        return F.when(x.isNull(), F.lit(-1)).otherwise(F.lit(0))
    return (F.when(x.isNull(), F.lit(-1))
            .otherwise(F.greatest(F.lit(0), F.least(
                F.lit(bins - 1),
                F.floor((x - F.lit(lo)) / F.lit(hi - lo) * bins)
                .cast("int")))))


def _hist_row(df: DataFrame, ranges: dict, cols, bins: int):
    """ONE fused agg: a single row with cnt_{col}_{bin} columns
    (bin -1 = NULL bucket)."""
    aggs = []
    for c in cols:
        b = _bin_expr(c, *ranges[c], bins)
        for k in range(-1, bins):
            aggs.append(F.sum(F.when(b == k, 1).otherwise(0))
                        .cast("long").alias(f"cnt_{c}_{k}"))
    return df.agg(*aggs)


def drift_report(
    df_ref: DataFrame,
    df_new: DataFrame,
    cols: list[str],
    bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """One row per column: ``col_name``, ``n_ref``/``n_new`` (non-null
    counts), ``null_ref``/``null_new``, ``psi`` (NULL bucket included
    as its own bin), ``ks`` (NULLs excluded). Bin ranges are the
    reference snapshot's min/max."""
    if not cols:
        raise ValueError("drift_report needs at least one column")
    if bins < 2:
        raise ValueError("bins must be >= 2")
    # one bounded 1-row collect (2·|cols| scalars — the same
    # driver-safe class as domain_quality_filter's threshold): inlining
    # the reference ranges as literals keeps each histogram ONE scan;
    # carrying the range agg as a cross-joined subplan re-evaluates the
    # full reference scan inside BOTH histogram plans
    (rrow,) = df_ref.agg(*[f for c in cols for f in (
        F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
        F.max(F.col(c).cast("double")).alias(f"__hi_{c}"))]).collect()
    ranges = {c: (rrow[f"__lo_{c}"], rrow[f"__hi_{c}"]) for c in cols}
    hr = _hist_row(df_ref, ranges, cols, bins)
    hn = _hist_row(df_new, ranges, cols, bins)

    # unpivot the two 1-row histograms into (col_name, bin, cr, cn):
    # stack over a tiny cross join — everything below is O(cols×bins)
    pairs = hr.crossJoin(hn.select(
        *[F.col(f"cnt_{c}_{k}").alias(f"new_{c}_{k}")
          for c in cols for k in range(-1, bins)]))
    stacked = pairs.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.lit(k).alias("bin"),
                 F.col(f"cnt_{c}_{k}").alias("cr"),
                 F.col(f"new_{c}_{k}").alias("cn"))
        for c in cols for k in range(-1, bins)])).alias("s")) \
        .select("s.*")

    wtot = Window.partitionBy("col_name")
    tot_r = F.sum("cr").over(wtot)
    tot_n = F.sum("cn").over(wtot)
    nb = F.lit(float(bins + 1))
    pr = (F.col("cr") + F.lit(PSI_EPS)) / (tot_r + nb * F.lit(PSI_EPS))
    pn = (F.col("cn") + F.lit(PSI_EPS)) / (tot_n + nb * F.lit(PSI_EPS))
    psi_term = (pr - pn) * F.log(pr / pn)

    # KS over non-null bins: cumulative proportions of the NON-NULL
    # totals; the NULL bucket is excluded from the CDF but kept in the
    # report columns
    nn_r = tot_r - F.sum(F.when(F.col("bin") == -1, F.col("cr"))
                         .otherwise(0)).over(wtot)
    nn_n = tot_n - F.sum(F.when(F.col("bin") == -1, F.col("cn"))
                         .otherwise(0)).over(wtot)
    wcum = (Window.partitionBy("col_name").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum_r = F.sum(F.when(F.col("bin") >= 0, F.col("cr"))
                  .otherwise(0)).over(wcum)
    cum_n = F.sum(F.when(F.col("bin") >= 0, F.col("cn"))
                  .otherwise(0)).over(wcum)
    gap = F.when(F.col("bin") >= 0, F.abs(
        cum_r / F.nullif(nn_r.cast("double"), F.lit(0.0))
        - cum_n / F.nullif(nn_n.cast("double"), F.lit(0.0))))

    return (stacked
            .withColumn("__psi", psi_term)
            .withColumn("__gap", gap)
            .groupBy("col_name")
            .agg(F.sum(F.when(F.col("bin") >= 0, F.col("cr"))
                       .otherwise(0)).cast("long").alias("n_ref"),
                 F.sum(F.when(F.col("bin") >= 0, F.col("cn"))
                       .otherwise(0)).cast("long").alias("n_new"),
                 F.sum(F.when(F.col("bin") == -1, F.col("cr"))
                       .otherwise(0)).cast("long").alias("null_ref"),
                 F.sum(F.when(F.col("bin") == -1, F.col("cn"))
                       .otherwise(0)).cast("long").alias("null_new"),
                 F.round(F.sum("__psi") + F.lit(1e-9), round_to)
                 .alias("psi"),
                 F.round(F.coalesce(F.max("__gap"), F.lit(0.0))
                         + F.lit(1e-9), round_to).alias("ks")))


def categorical_drift(
    df_ref: DataFrame,
    df_new: DataFrame,
    col: str,
    round_to: int = 6,
) -> DataFrame:
    """PSI over a categorical column's value proportions (NULL is its
    own category): one row per category observed in EITHER snapshot,
    with both proportions and the category's PSI contribution, plus
    the drift direction. Full outer join of two tiny per-category
    count aggs — each snapshot is scanned once."""
    def counts(df, name):
        return (df.groupBy(F.col(col).alias("cat"))
                .agg(F.count(F.lit(1)).alias(name)))
    cr = counts(df_ref, "cnt_ref")
    cn = counts(df_new, "cnt_new")
    j = (cr.join(cn, on=cr["cat"].eqNullSafe(cn["cat"]), how="full")
         .select(F.coalesce(cr["cat"], cn["cat"]).alias("category"),
                 F.coalesce("cnt_ref", F.lit(0)).alias("cnt_ref"),
                 F.coalesce("cnt_new", F.lit(0)).alias("cnt_new")))
    w = Window.partitionBy()
    ncat = F.count(F.lit(1)).over(w).cast("double")
    pr = ((F.col("cnt_ref") + F.lit(PSI_EPS))
          / (F.sum("cnt_ref").over(w) + ncat * F.lit(PSI_EPS)))
    pn = ((F.col("cnt_new") + F.lit(PSI_EPS))
          / (F.sum("cnt_new").over(w) + ncat * F.lit(PSI_EPS)))
    return j.select(
        "category", "cnt_ref", "cnt_new",
        F.round(pr + F.lit(1e-9), round_to).alias("p_ref"),
        F.round(pn + F.lit(1e-9), round_to).alias("p_new"),
        F.round((pr - pn) * F.log(pr / pn) + F.lit(1e-9), round_to)
        .alias("psi_term"))
