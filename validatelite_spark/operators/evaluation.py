"""Dedup-candidate evaluation: precision / recall / F1 over pair sets.

Tuning an approximate near-dup detector (SimHash hamming radius,
MinHash banding, embedding threshold) needs a measured answer to "how
well does the cheap pair set approximate the expensive truth set" —
CLAUDE.md rule 10 is exactly the kind of recall leak this surfaces.
``pair_metrics`` compares any predicted pair set against a truth pair
set (at test scale: the exhaustive ``ngram_jaccard_pairs``) and
reports the confusion counts plus P/R/F1 in one row.

Pairs are canonicalized first (least/greatest, self-pairs dropped,
distinct) so orientation and duplicates never skew counts. The
comparison is ONE full-outer join on the canonical pair key followed
by a single aggregate — no collect, no window; at web scale both pair
sets are candidate-stage outputs (already bucketed/bounded by the
dedup operators' caps), so the join input is pairs, never documents.

The reference has no evaluation surface; the pattern follows its
test-side metric builders (reference:
tests/shared/builders/performance_test_base.py result assertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_pairs(df: DataFrame, id1: str = "id1",
                    id2: str = "id2") -> DataFrame:
    """(a, b) with a < b, self-pairs dropped, distinct."""
    a, b = F.col(id1), F.col(id2)
    return (df.select(F.least(a, b).alias("a"),
                      F.greatest(a, b).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct())


def pair_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
    round_to: int = 6,
) -> DataFrame:
    """One row: (tp, fp, fn, precision, recall, f1). Precision/recall
    are NULL (not 0) when their denominator is empty — "no predictions"
    is not "all predictions wrong"."""
    p = canonical_pairs(pred, id1, id2).withColumn("__p", F.lit(1))
    t = canonical_pairs(truth, id1, id2).withColumn("__t", F.lit(1))
    j = p.join(t, ["a", "b"], "full_outer")
    counts = j.agg(
        F.coalesce(F.sum(F.when(F.col("__p").isNotNull()
                                & F.col("__t").isNotNull(), 1)),
                   F.lit(0)).alias("tp"),
        F.coalesce(F.sum(F.when(F.col("__p").isNotNull()
                                & F.col("__t").isNull(), 1)),
                   F.lit(0)).alias("fp"),
        F.coalesce(F.sum(F.when(F.col("__p").isNull(), 1)),
                   F.lit(0)).alias("fn"))
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")

    def _safe(num, den):
        return F.when(den > 0, F.round(num.cast("double") / den + 1e-9,
                                       round_to))
    prec = _safe(tp, tp + fp)
    rec = _safe(tp, tp + fn)
    f1 = F.when((tp + fp > 0) & (tp + fn > 0) & (tp > 0),
                F.round(2.0 * tp / ((tp + fp) + (tp + fn)) + 1e-9,
                        round_to)).otherwise(
        F.when((tp + fp > 0) & (tp + fn > 0), F.lit(0.0)))
    return counts.select(
        "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"))


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reliability curve for a quality classifier: equal-width bins
    over a [0, 1] score vs an observed binary label.

    Per bin: ``(bin, n, confidence, accuracy)`` where confidence is the
    mean score and accuracy the label rate — a well-calibrated
    classifier has accuracy ≈ confidence in every bin, and the curve
    tells you whether a keep-threshold of 0.7 actually keeps ~70%-good
    documents. ``bin = least(floor(score * n_bins), n_bins - 1)`` (the
    score 1.0 edge folds into the top bin). Rows with NULL score or
    label are excluded (they carry no calibration evidence).

    ONE map-side-combinable aggregate over n_bins groups — no window,
    no collect; scales to any corpus size. Rounding follows the repo
    +1e-9 convention so any engine replays it."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int").cast("double")
    b = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    return (df.filter(s.isNotNull() & y.isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg(s) + 1e-9, round_to).alias("confidence"),
                 F.round(F.avg(y) + 1e-9, round_to).alias("accuracy"))
            .orderBy("bin"))


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """One row ``(n, ece)``: the standard Expected Calibration Error,
    sum over bins of (n_b / N) * |accuracy_b - confidence_b| — the
    scalar a threshold-tuning loop watches. Same bin/NULL semantics as
    ``calibration_bins``; the second aggregate runs over ≤ n_bins rows.

    The per-bin means are NOT pre-rounded (rounding then weighting
    compounds error); only the final scalar is rounded."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("int").cast("double")
    b = F.least(F.floor(s * n_bins), F.lit(n_bins - 1)).cast("int")
    per = (df.filter(s.isNotNull() & y.isNotNull())
           .groupBy(b.alias("bin"))
           .agg(F.count(F.lit(1)).alias("nb"),
                F.avg(s).alias("conf"), F.avg(y).alias("acc")))
    return per.agg(
        F.sum("nb").alias("n"),
        F.round(F.sum(F.abs(F.col("acc") - F.col("conf"))
                      * F.col("nb")) / F.sum("nb") + 1e-9,
                round_to).alias("ece"))
