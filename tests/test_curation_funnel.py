"""Single-pass curation funnel (pipeline/curation.py
curate_with_funnel): observed stage counts vs independently computed
stage counts — in particular that the dedup winner join and the budget
prefix-sum self-references do NOT double-count the observed metrics."""

import pytest
from pyspark.sql import functions as F


class TestFunnel:
    def test_counts_match_stagewise_recompute(self, spark, sf_dir):
        from validatelite_spark.operators.dedup import exact_dedup
        from validatelite_spark.pipeline.curation import (
            curate_with_funnel,
            funnel_report,
        )
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sel, obs = curate_with_funnel(spark, docs, 3000)
        rep = {r["stage"]: r["n"]
               for r in funnel_report(spark, sel, obs).collect()}
        # independent stage-by-stage recompute (full rescans)
        n_in = docs.count()
        uniq = exact_dedup(docs, "text", "doc_id")
        n_dedup = uniq.count()
        assert rep["1_input"] == n_in
        assert rep["2_dedup"] == n_dedup
        assert rep["2_dedup"] >= rep["3_kept"] >= rep["4_selected"] > 0

    def test_no_double_count_with_real_dups(self, spark):
        # planted exact dups: the winner-join branch re-references the
        # observed input node — counts must still be exact
        from validatelite_spark.pipeline.curation import (
            curate_with_funnel,
            funnel_report,
        )
        base = ("the quick brown fox jumps over the lazy dog and many "
                "more plain english words fill this document nicely "
                "with the usual stopword density for the gopher gate "
                "and it keeps going for a while longer than the minimum "
                "fifty words that the quality filter needs to accept it "
                "so the keep decision is true for every copy of it here")
        rows = [(i, base, "en", len(base)) for i in range(6)]          # dups
        rows += [(10 + i, base + f" variant {i} of the closing line",
                  "en", len(base) + 20) for i in range(4)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, n_chars long")
        sel, obs = curate_with_funnel(spark, docs, 10_000)
        rep = {r["stage"]: r["n"]
               for r in funnel_report(spark, sel, obs).collect()}
        assert rep["1_input"] == 10
        assert rep["2_dedup"] == 5   # 6 copies collapse to 1, plus 4
        assert rep["3_kept"] == 5
        assert rep["4_selected"] == 5

    def test_funnel_result_equals_plain_curate(self, spark, sf_dir):
        from validatelite_spark.pipeline.curation import (
            curate,
            curate_with_funnel,
        )
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        a = sorted(r["doc_id"] for r in
                   curate(spark, docs, 3000).select("doc_id").collect())
        sel, _ = curate_with_funnel(spark, docs, 3000)
        b = sorted(r["doc_id"] for r in sel.select("doc_id").collect())
        assert a == b

    def test_single_action_materializes_all(self, spark, sf_dir):
        from validatelite_spark.pipeline.curation import curate_with_funnel
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sel, obs = curate_with_funnel(spark, docs, 3000)
        sel.count()
        # every observation resolved by that one action
        for o in obs.values():
            assert "n" in o.get
