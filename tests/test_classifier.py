"""Hashed-linear quality classifier (functions/classifier.py):
training separation, scoring determinism, engine rule, DuckDB parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from validatelite_spark.functions.classifier import (DEFAULT_DIM,
                                                     classifier_scores,
                                                     duckdb_classifier_sql,
                                                     snap_to_grid,
                                                     train_weights)

SPAM = "buy cheap pills now click here winner prize casino jackpot"
HAM = ("the committee reviewed the annual report and discussed the "
       "budget for municipal infrastructure maintenance")


@pytest.fixture(scope="module")
def labeled(spark):
    rows = []
    for i in range(20):
        rows.append((i, f"{HAM} item {i}", 1))
        rows.append((100 + i, f"{SPAM} offer {i}", 0))
    return spark.createDataFrame(
        rows, "doc_id long, text string, label int").cache()


class TestClassifier:
    def test_trained_weights_separate_classes(self, spark, labeled):
        w = train_weights(labeled, "label")
        assert len(w) == DEFAULT_DIM
        assert all(x == snap_to_grid(x) for x in w)  # dyadic grid
        scores = {r["doc_id"]: r["score"]
                  for r in classifier_scores(labeled, w).collect()}
        ham = [scores[i] for i in range(20)]
        spam = [scores[100 + i] for i in range(20)]
        assert min(ham) > max(spam)  # full separation on train set

    def test_null_and_empty_text(self, spark):
        w = [0.5] * 16
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "one token")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["score"]
               for r in classifier_scores(df, w, bias=0.0).collect()}
        import math
        assert got[1] is None
        assert got[2] == 0.5  # sigmoid(0) — no tokens
        # "one token" → 2 tokens × 0.5 weight → sigmoid(1.0)
        assert got[3] == round(1 / (1 + math.exp(-1.0)) + 1e-9, 6)

    def test_partition_invariance(self, spark, labeled):
        w = train_weights(labeled, "label")
        a = sorted(map(tuple, classifier_scores(labeled, w).collect()))
        b = sorted(map(tuple,
                       classifier_scores(labeled.repartition(7), w)
                       .collect()))
        assert a == b

    def test_duckdb_parity(self, spark, labeled):
        # dyadic-grid weights → exact sum on both engines, no tolerance
        w = train_weights(labeled, "label")
        got = sorted(map(tuple, classifier_scores(labeled, w, bias=0.25)
                         .collect()))
        con = duckdb.connect()
        con.register("docs_arrow", labeled.select(
            "doc_id", "text").toPandas())
        from __spark_entry__ import _d_tokens
        sql = duckdb_classifier_sql(w, 0.25, _d_tokens("text"))
        duck = sorted(map(tuple, con.execute(
            f"SELECT doc_id, CASE WHEN text IS NULL THEN NULL "
            f"ELSE {sql} END AS score FROM docs_arrow").fetchall()))
        assert got == duck

    def test_engine_rule(self, spark, labeled):
        from validatelite_spark.core.rules import Rule
        from validatelite_spark.operators.engine import RuleEngine
        w = train_weights(labeled, "label")
        (res,) = RuleEngine(spark).execute(labeled, [
            Rule("CLASSIFIER", "text",
                 {"weights": w, "min_score": 0.5},
                 name="quality_clf")])
        assert res.failed_records == 20  # the spam half
        assert res.execution_plan["execution_type"] == "merged_agg"


class TestCompressionRatio:
    def test_matches_direct_zlib_and_orders_sanely(self, spark):
        import zlib
        from pyspark.sql import functions as F
        from validatelite_spark.functions.textquality import (
            compression_ratio_udf)
        rows = [(1, "spam " * 200),                 # repetitive → low
                (2, "the quick brown fox jumps over the lazy dog and "
                    "then discusses municipal budget policy at length"),
                (3, None), (4, "")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["cr"]
               for r in df.select("doc_id",
                                  compression_ratio_udf()(F.col("text"))
                                  .alias("cr")).collect()}
        for i, t in [(1, rows[0][1]), (2, rows[1][1])]:
            b = t.encode()
            assert got[i] == round(len(zlib.compress(b, 6)) / len(b)
                                   + 1e-9, 6)
        assert got[3] is None and got[4] is None
        assert got[1] < got[2]  # repetition compresses better
