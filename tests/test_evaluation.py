"""Pair-set P/R/F1 (operators/evaluation.py)."""

import pytest


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id1 long, id2 long")


class TestPairMetrics:
    def test_counts_and_scores(self, spark):
        from validatelite_spark.operators.evaluation import pair_metrics
        pred = _pairs(spark, [(1, 2), (3, 4), (5, 6)])
        truth = _pairs(spark, [(1, 2), (3, 4), (7, 8)])
        (r,) = pair_metrics(pred, truth).collect()
        assert (r["tp"], r["fp"], r["fn"]) == (2, 1, 1)
        assert r["precision"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["recall"] == pytest.approx(2 / 3, abs=1e-6)
        assert r["f1"] == pytest.approx(2 / 3, abs=1e-6)

    def test_canonicalization(self, spark):
        from validatelite_spark.operators.evaluation import pair_metrics
        # reversed orientation, duplicates, and self-pairs must not
        # inflate any count
        pred = _pairs(spark, [(2, 1), (1, 2), (3, 3)])
        truth = _pairs(spark, [(1, 2)])
        (r,) = pair_metrics(pred, truth).collect()
        assert (r["tp"], r["fp"], r["fn"]) == (1, 0, 0)
        assert r["f1"] == 1.0

    def test_empty_pred_null_precision(self, spark):
        from validatelite_spark.operators.evaluation import pair_metrics
        pred = _pairs(spark, []).limit(0) if False else \
            spark.createDataFrame([], "id1 long, id2 long")
        truth = _pairs(spark, [(1, 2)])
        (r,) = pair_metrics(pred, truth).collect()
        assert (r["tp"], r["fp"], r["fn"]) == (0, 0, 1)
        assert r["precision"] is None
        assert r["recall"] == 0.0

    def test_lsh_recall_leak_is_measurable(self, spark):
        # CLAUDE.md rule 10 made operational: exhaustive jaccard truth
        # vs minhash banding predictions on a tiny planted corpus
        from validatelite_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )
        from validatelite_spark.operators.evaluation import pair_metrics
        texts = ["the quick brown fox jumps over the lazy dog today",
                 "the quick brown fox jumps over the lazy cat today",
                 "completely different text about spark shuffles here",
                 "completely different text about spark shuffles there"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        truth = ngram_jaccard_pairs(df, "text", "doc_id", n=3,
                                    threshold=0.5)
        pred = minhash_lsh_pairs(df, "text", "doc_id", n=3,
                                 threshold=0.5, rows_per_band=2)
        (r,) = pair_metrics(pred, truth).collect()
        # verified LSH pairs are a subset of truth: perfect precision,
        # recall measured (1.0 here -- banding margin covers j=0.5)
        assert r["precision"] == 1.0
        assert r["recall"] == 1.0
