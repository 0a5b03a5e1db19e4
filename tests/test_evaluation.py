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


class TestCalibration:
    def _df(self, spark):
        # bin 2 (0.25): 4 rows, 1 positive -> acc .25 == conf (calibrated)
        # bin 7 (0.75): 4 rows, 2 positive -> acc .50, conf .75 (off .25)
        # plus a score-1.0 row (folds into bin 9) and a NULL row
        rows = ([(0.25, 1), (0.25, 0), (0.25, 0), (0.25, 0)]
                + [(0.75, 1), (0.75, 1), (0.75, 0), (0.75, 0)]
                + [(1.0, 1), (None, 1), (0.5, None)])
        return spark.createDataFrame(rows, "score double, y int")

    def test_bins(self, spark):
        from validatelite_spark.operators.evaluation import (
            calibration_bins)
        got = {r.bin: (r.n, r.confidence, r.accuracy)
               for r in calibration_bins(
                   self._df(spark), "score", "y").collect()}
        assert got[2] == (4, 0.25, 0.25)
        assert got[7] == (4, 0.75, 0.5)
        assert got[9] == (1, 1.0, 1.0)   # score 1.0 folds into top bin
        assert set(got) == {2, 7, 9}     # NULL score/label excluded

    def test_ece(self, spark):
        from validatelite_spark.operators.evaluation import (
            expected_calibration_error)
        row = expected_calibration_error(
            self._df(spark), "score", "y").collect()[0]
        assert row.n == 9
        # bins: |.25-.25|*4 + |.5-.75|*4 + |1-1|*1 over 9 rows
        assert row.ece == round(1.0 / 9 + 1e-9, 6)
