"""DSIR importance resampling: semantic behavior + determinism.

End-to-end value parity is covered by the DuckDB oracles
(`dsir_weights` / `dsir_sample` in __spark_entry__.py); these tests
pin the statistical behavior the oracle cannot judge — that weights
actually rank target-like documents higher — plus invariances and
edge cases.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validatelite_spark.operators.dsir import (dsir_log_ratios,
                                               dsir_resample, dsir_weights,
                                               hashed_gram_buckets)


@pytest.fixture(scope="module")
def split(spark):
    """Target: cooking-domain sentences. Raw: a few cooking-like docs
    buried in finance/weather chatter — DSIR should surface them."""
    target_rows = [
        (i, f"recipe for soup with onions and garlic number {i}")
        for i in range(40)
    ]
    cookish = [(100 + i, f"a recipe with garlic and onions variant {i}")
               for i in range(5)]
    other = [(200 + i,
              f"stock market rates fell again on tuesday session {i}")
             for i in range(40)]
    weird = [(300, None), (301, "single"), (302, "")]
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(cookish + other + weird,
                                "doc_id long, text string")
    return target, raw


class TestWeights:
    def test_target_like_docs_rank_higher(self, split):
        target, raw = split
        w = {r["id"]: r["logw"]
             for r in dsir_weights(target, raw, n_buckets=512).collect()}
        cook = [w[100 + i] for i in range(5)]
        fin = [w[200 + i] for i in range(40)]
        assert min(cook) > max(fin)

    def test_no_gram_docs_score_zero(self, split):
        target, raw = split
        w = {r["id"]: r["logw"]
             for r in dsir_weights(target, raw, n_buckets=512).collect()}
        assert w[300] == 0.0   # NULL text
        assert w[302] == 0.0   # empty text
        # one token still has a unigram -> a real (nonzero) weight path
        assert 301 in w

    def test_weights_cover_every_raw_doc(self, split):
        target, raw = split
        w = dsir_weights(target, raw, n_buckets=512)
        assert w.count() == raw.count()

    def test_partition_count_invariance(self, split):
        target, raw = split
        a = sorted(map(tuple, dsir_weights(
            target.repartition(1), raw.repartition(1),
            n_buckets=512).collect()))
        b = sorted(map(tuple, dsir_weights(
            target.repartition(5), raw.repartition(7),
            n_buckets=512).collect()))
        assert a == b


class TestLogRatios:
    def test_full_bucket_domain_with_prior(self, split, spark):
        target, raw = split
        lam = dsir_log_ratios(target, raw, n_buckets=64)
        assert lam.count() == 64  # unseen buckets present (smoothed)

    def test_equal_corpora_give_zero_ratios(self, spark):
        df = spark.createDataFrame(
            [(i, f"same text everywhere {i % 3}") for i in range(10)],
            "doc_id long, text string")
        lam = dsir_log_ratios(df, df, n_buckets=32)
        mx = lam.agg(F.max(F.abs("llr"))).first()[0]
        assert mx == pytest.approx(0.0, abs=1e-12)


class TestResample:
    def test_returns_k_raw_docs_biased_to_target(self, split):
        target, raw = split
        sel = dsir_resample(target, raw, k=8, n_buckets=512,
                            seed=7).collect()
        assert len(sel) == 8
        ids = {r["id"] for r in sel}
        raw_ids = {r["doc_id"] for r in raw.collect()}
        assert ids <= raw_ids
        # the 5 cooking docs have far higher weight: all selected
        assert {100, 101, 102, 103, 104} <= ids

    def test_seed_changes_selection_deterministically(self, split):
        target, raw = split
        a = [r["id"] for r in dsir_resample(target, raw, k=8,
                                            n_buckets=512, seed=1).collect()]
        b = [r["id"] for r in dsir_resample(target, raw, k=8,
                                            n_buckets=512, seed=1).collect()]
        c = [r["id"] for r in dsir_resample(target, raw, k=20,
                                            n_buckets=512, seed=2).collect()]
        assert a == b          # same seed -> identical selection
        assert set(a) != set(c[:8]) or len(set(c)) == 20

    def test_gumbel_scores_are_finite(self, split):
        target, raw = split
        rows = dsir_resample(target, raw, k=40, n_buckets=512).collect()
        assert all(r["score"] is not None for r in rows)
