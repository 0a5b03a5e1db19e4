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
