"""Deterministic sampling + token-budget selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validatelite_spark.operators.sampling import (hash_sample,
                                                   token_budget_filter)


class TestHashSample:
    def test_deterministic_and_partition_invariant(self, spark):
        df = spark.range(4000).withColumnRenamed("id", "k")
        a = sorted(r["k"] for r in hash_sample(df, 0.3, "k").collect())
        b = sorted(r["k"] for r in
                   hash_sample(df.repartition(13), 0.3, "k").collect())
        assert a == b
        # rate is close to the fraction (md5 is uniform)
        assert 0.25 < len(a) / 4000 < 0.35
        # different seed → different (but equally stable) sample
        c = sorted(r["k"] for r in
                   hash_sample(df, 0.3, "k", seed=99).collect())
        assert c != a

    def test_key_atomicity_and_bounds(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "k long, v string")
        kept = hash_sample(df, 0.5, "k").collect()
        by_key = {r["k"] for r in kept}
        # duplicated key 1 is kept or dropped atomically
        assert sum(1 for r in kept if r["k"] == 1) in (0, 2)
        assert by_key <= {1, 2}
        assert hash_sample(df, 0.0, "k").count() == 0
        assert hash_sample(df, 1.0, "k").count() == 3
        with pytest.raises(ValueError):
            hash_sample(df, 1.5, "k")


class TestTokenBudget:
    def test_budget_cut_is_inclusive_and_per_group(self, spark):
        rows = [("en", i, 100) for i in range(10)]          # 1000 total
        rows += [("de", 100, 9999)]                          # one huge doc
        df = spark.createDataFrame(rows, "lang string, doc_id long, n long")
        kept = token_budget_filter(df, budget=450, token_col="n",
                                   by="lang", order_col="n",
                                   key_col="doc_id").collect()
        en = [r for r in kept if r["lang"] == "en"]
        # 4 docs reach 400 < 450; the 5th starts under budget → kept
        assert len(en) == 5
        # a group whose first doc exceeds the budget still keeps it
        assert sum(1 for r in kept if r["lang"] == "de") == 1

    def test_partition_invariance(self, spark):
        df = spark.createDataFrame(
            [("g%d" % (i % 4), i, (i * 37) % 200 + 1) for i in range(400)],
            "g string, doc_id long, n long")
        a = sorted((r["g"], r["doc_id"]) for r in token_budget_filter(
            df, 800, "n", "g", key_col="doc_id").collect())
        b = sorted((r["g"], r["doc_id"]) for r in token_budget_filter(
            df.repartition(11), 800, "n", "g", key_col="doc_id").collect())
        assert a == b

    def test_two_phase_equals_single_window_reference(self, spark):
        """The bucketed prefix sum must reproduce the definitional
        single-window cumsum exactly — including order ties that span
        bucket boundaries and groups with constant order_col."""
        from pyspark.sql import Window
        rows = [("g%d" % (i % 3), i, (i * 7919) % 50 + 1)
                for i in range(600)]
        rows += [("const", 1000 + i, 42) for i in range(30)]  # 1 bucket
        df = spark.createDataFrame(rows, "g string, doc_id long, n long")
        got = sorted((r["g"], r["doc_id"]) for r in token_budget_filter(
            df, 500, "n", "g", key_col="doc_id", n_buckets=8).collect())
        w = (Window.partitionBy("g").orderBy("n", "doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        ref = sorted(
            (r["g"], r["doc_id"])
            for r in df.withColumn(
                "pre", F.sum("n").over(w) - F.col("n"))
            .filter(F.col("pre") < 500).collect())
        assert got == ref

    def test_heavy_window_partitions_by_group_and_bucket(self, spark):
        """Scale gate: the cumsum window must partition on (group,
        bucket), never on the group alone — one task per group is the
        100 TB bottleneck the two-phase design removes (VERDICT r2 #2).
        Also checks >1 bucket is actually populated per sizeable group."""
        df = spark.createDataFrame(
            [("en", i, i % 997 + 1) for i in range(5000)],
            "lang string, doc_id long, n long")
        kept = token_budget_filter(df, 10**9, "n", "lang",
                                   key_col="doc_id", n_buckets=16)
        plan = kept._jdf.queryExecution().executedPlan().toString()
        import re
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        heavy = [s for s in specs if "lang" in s and "n#" in s]
        assert heavy, f"no cumsum window found in plan:\n{plan}"
        assert all("__bkt" in s for s in heavy), (
            f"cumsum window partitions by group alone: {heavy}")
        # all docs kept (huge budget) → bucket spread is observable
        assert kept.count() == 5000
        n_buckets_used = (
            df.groupBy("lang")
            .agg(F.min("n").cast("double").alias("lo"),
                 F.max("n").cast("double").alias("hi"))
            .join(df, "lang")
            .select(F.least(F.floor((F.col("n") - F.col("lo"))
                                    / (F.col("hi") - F.col("lo")) * 16),
                            F.lit(15)).alias("b"))
            .distinct().count())
        assert n_buckets_used > 1


class TestTokenBudgetNulls:
    def test_null_group_and_null_order_match_single_window(self, spark):
        """NULL group keys must be budgeted as their own group (the
        equi-join shape would silently DROP them) and NULL order values
        must sort FIRST like the definitional window (ASC NULLS FIRST)
        — regression test for the round-3 two-phase rewrite."""
        from pyspark.sql import Window
        rows = [("en", 1, 100), ("en", 2, 100),
                (None, 3, 150), (None, 4, 150), (None, 5, 150)]
        df = spark.createDataFrame(rows, "g string, doc_id long, n long")
        got = sorted(r["doc_id"] for r in token_budget_filter(
            df, 200, "n", "g", key_col="doc_id").collect())
        # NULL group: docs 3,4 reach 300 ≥ 200 after two; doc 5 pre=300
        assert got == [1, 2, 3, 4]

        # NULL order_col values: compare against the single-window def
        rows2 = [("g", i, 10, None if i % 3 == 0 else i * 5)
                 for i in range(30)]
        df2 = spark.createDataFrame(
            rows2, "g string, doc_id long, n long, o long")
        got2 = sorted(r["doc_id"] for r in token_budget_filter(
            df2, 60, "n", "g", order_col="o", key_col="doc_id",
            n_buckets=4).collect())
        w = (Window.partitionBy("g").orderBy("o", "doc_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        ref = sorted(r["doc_id"] for r in df2.withColumn(
            "pre", F.sum("n").over(w) - F.col("n"))
            .filter(F.col("pre") < 60).collect())
        assert got2 == ref

    def test_non_numeric_order_col_raises(self, spark):
        # ADVICE r3: a string order_col would CAST-fail under ANSI or
        # silently NULL-bucket (dropping rows) otherwise — raise up
        # front instead.
        import pytest as _pt
        df = spark.createDataFrame(
            [("g", 1, 10, "2024-01-01")],
            "g string, doc_id long, n long, day string")
        with _pt.raises(TypeError, match="order_col"):
            token_budget_filter(df, 100, "n", "g", order_col="day")


class TestStratifiedSample:
    def test_per_stratum_rates_and_determinism(self, spark):
        from validatelite_spark.operators.sampling import stratified_sample
        rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(3000)]
        df = spark.createDataFrame(rows, "k long, lang string")
        out = stratified_sample(df, {"en": 0.5, "de": 1.0}, "k", "lang",
                                default_fraction=0.0)
        by_lang = {r["lang"]: r["n"] for r in
                   out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert by_lang.get("de") == 1000        # fraction 1.0 keeps all
        assert "zh" not in by_lang              # default 0.0 drops all
        assert 400 < by_lang.get("en", 0) < 600  # ~0.5 of 1000
        # deterministic across partitionings
        a = sorted(r["k"] for r in out.collect())
        b = sorted(r["k"] for r in stratified_sample(
            df.repartition(13), {"en": 0.5, "de": 1.0}, "k", "lang").collect())
        assert a == b

    def test_consistent_with_hash_sample(self, spark):
        from validatelite_spark.operators.sampling import (hash_sample,
                                                           stratified_sample)
        df = spark.createDataFrame(
            [(i, "en") for i in range(500)], "k long, lang string")
        strat = sorted(r["k"] for r in stratified_sample(
            df, {"en": 0.3}, "k", "lang", seed=9).collect())
        plain = sorted(r["k"] for r in hash_sample(df, 0.3, "k",
                                                   seed=9).collect())
        assert strat == plain  # same md5 arithmetic → same rows


class TestQuantileFilter:
    def test_per_group_threshold(self, spark):
        from validatelite_spark.operators.sampling import quantile_filter
        rows = [("a", i, i) for i in range(1, 101)]       # 1..100
        rows += [("b", 1000 + i, 10 * i) for i in range(1, 11)]  # 10..100
        df = spark.createDataFrame(rows, "g string, k long, v long")
        kept = quantile_filter(df, "v", "g", 0.5, keep="ge").collect()
        a_vals = sorted(r["v"] for r in kept if r["g"] == "a")
        b_vals = sorted(r["v"] for r in kept if r["g"] == "b")
        # group a median = 50.5 → keep 51..100; group b median = 55 → 60..100
        assert a_vals == list(range(51, 101))
        assert b_vals == [60, 70, 80, 90, 100]
        # 'le' keeps the complement boundary-inclusively
        low = quantile_filter(df, "v", "g", 0.5, keep="le")
        assert sorted(r["v"] for r in low.collect() if r["g"] == "a") \
            == list(range(1, 51))

    def test_null_group_rows_filtered_not_dropped(self, spark):
        # ADVICE r3: NULL-lang rows must be filtered against their own
        # group's quantile, not silently dropped by the threshold join.
        from validatelite_spark.operators.sampling import quantile_filter
        rows = [("a", i, i) for i in range(1, 11)]
        rows += [(None, 100 + i, i) for i in range(1, 11)]
        df = spark.createDataFrame(rows, "g string, k long, v long")
        kept = quantile_filter(df, "v", "g", 0.5, keep="ge").collect()
        null_vals = sorted(r["v"] for r in kept if r["g"] is None)
        # NULL group median = 5.5 → keep 6..10 (its own threshold)
        assert null_vals == [6, 7, 8, 9, 10]

    def test_threshold_join_is_broadcast(self, spark):
        from validatelite_spark.operators.sampling import quantile_filter
        df = spark.createDataFrame(
            [("g%d" % (i % 3), i, i % 50) for i in range(300)],
            "g string, k long, v long")
        plan = (quantile_filter(df, "v", "g", 0.9)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan


class TestKeySkewReport:
    def test_hot_keys_and_salt_suggestion(self, spark):
        from validatelite_spark.operators.skew import key_skew_report
        rows = [(0,)] * 500 + [(1,)] * 120 + [(k,) for k in range(2, 50)]
        df = spark.createDataFrame(rows, "k long")
        out = key_skew_report(df, "k", top_k=3,
                              target_rows_per_task=100).collect()
        assert [(r["key"], r["n"], r["suggested_salt"]) for r in out] == [
            (0, 500, 5), (1, 120, 2), (2, 1, 1)]
        total = 500 + 120 + 48
        assert abs(out[0]["share"] - round(500 / total + 1e-9, 6)) < 1e-9

    def test_topk_plan_has_no_global_sort_exchange(self, spark):
        from validatelite_spark.operators.skew import key_skew_report
        df = spark.createDataFrame([(i % 7,) for i in range(700)], "k long")
        plan = (key_skew_report(df, "k", top_k=3)
                ._jdf.queryExecution().executedPlan().toString())
        assert "TakeOrderedAndProject" in plan
        assert "Exchange rangepartitioning" not in plan


class TestQuantileFilterApprox:
    def test_approx_variant_bounded_memory_path(self, spark):
        """approx=True must use the Greenwald-Khanna sketch (bounded
        reducer memory — the 100 TB path) and agree with exact on a
        distribution where the sketch at this accuracy is exact."""
        from validatelite_spark.operators.sampling import quantile_filter
        df = spark.createDataFrame(
            [("g", i, i % 101) for i in range(5000)],
            "g string, k long, v long")
        exact = sorted((r["k"]) for r in quantile_filter(
            df, "v", "g", 0.9).collect())
        approx = sorted((r["k"]) for r in quantile_filter(
            df, "v", "g", 0.9, approx=True).collect())
        assert approx == exact
        plan = (quantile_filter(df, "v", "g", 0.9, approx=True)
                ._jdf.queryExecution().executedPlan().toString())
        assert "approx_percentile" in plan


class TestTemperatureSample:
    def test_alpha_flattens_toward_uniform(self, spark):
        from validatelite_spark.operators.sampling import temperature_sample
        # 900 en / 90 de / 10 zh — heavily imbalanced
        rows = ([(i, "en") for i in range(900)]
                + [(1000 + i, "de") for i in range(90)]
                + [(2000 + i, "zh") for i in range(10)])
        df = spark.createDataFrame(rows, "k long, lang string")

        def shares(alpha):
            out = temperature_sample(df, 300, "lang", "k", alpha=alpha)
            got = {r["lang"]: r["n"] for r in out.groupBy("lang")
                   .agg(F.count("*").alias("n")).collect()}
            return got

        nat = shares(1.0)     # natural proportions
        flat = shares(0.3)    # strongly flattened
        # alpha=1: en dominates ~90%; alpha=0.3: low-resource strata
        # take a much larger relative share (zh keeps everything)
        assert nat.get("en", 0) > 8 * nat.get("de", 1)
        assert flat.get("zh", 0) == 10          # frac capped at 1.0
        assert flat.get("en", 0) < nat.get("en", 0)
        assert flat.get("de", 0) >= nat.get("de", 0)

    def test_deterministic_and_validates(self, spark):
        from validatelite_spark.operators.sampling import temperature_sample
        df = spark.createDataFrame(
            [(i, ["a", "b"][i % 2]) for i in range(200)],
            "k long, lang string")
        a = sorted(r["k"] for r in temperature_sample(
            df, 50, "lang", "k").collect())
        b = sorted(r["k"] for r in temperature_sample(
            df.repartition(9), 50, "lang", "k").collect())
        assert a == b
        with pytest.raises(ValueError):
            temperature_sample(df, 50, "lang", "k", alpha=0.0)


class TestCapPerGroup:
    def test_caps_best_first(self, spark):
        from validatelite_spark.operators.sampling import cap_per_group
        rows = [("big", i, i) for i in range(20)]
        rows += [("small", 100, 5)]
        df = spark.createDataFrame(rows, "g string, k long, q long")
        got = cap_per_group(df, "g", 3, "q", "k").collect()
        big = sorted(r["q"] for r in got if r["g"] == "big")
        assert big == [17, 18, 19]              # top-3 by q desc
        assert sum(1 for r in got if r["g"] == "small") == 1
        asc = cap_per_group(df, "g", 2, "q", "k", descending=False)
        assert sorted(r["q"] for r in asc.collect()
                      if r["g"] == "big") == [0, 1]

    def test_ascending_nulls_never_eat_quota(self, spark):
        from validatelite_spark.operators.sampling import cap_per_group
        rows = [("g", 1, None), ("g", 2, None), ("g", 3, None),
                ("g", 4, 10), ("g", 5, 20)]
        df = spark.createDataFrame(rows, "g string, k long, q long")
        asc = cap_per_group(df, "g", 3, "q", "k", descending=False)
        got = sorted(r["k"] for r in asc.collect())
        assert got == [1, 4, 5]  # real values first, NULLs fill leftovers


class TestMixtureBudget:
    def _df(self, spark):
        rows = [(i, ["en", "de", "fr", "it"][i % 4], 100 + (i * 37) % 200)
                for i in range(80)]
        return spark.createDataFrame(rows, "doc_id long, lang string, n long")

    def test_budgets_proportional_and_inclusive_cut(self, spark):
        from validatelite_spark.operators.sampling import (
            mixture_budget_filter, mixture_weights_to_budgets)
        df = self._df(spark)
        weights = {"en": 0.6, "de": 0.3, "fr": 0.1}
        kept = mixture_budget_filter(df, 2000, weights, "n", "lang",
                                     order_col="n", key_col="doc_id")
        budgets = mixture_weights_to_budgets(2000, weights)
        per = {r["lang"]: r["tok"] for r in
               kept.groupBy("lang").agg(F.sum("n").alias("tok")).collect()}
        assert "it" not in per  # outside the mixture -> pruned
        for g, bud in budgets.items():
            # inclusive cut: reaches the budget (or exhausts the group)
            total_g = (df.filter(F.col("lang") == g)
                       .agg(F.sum("n")).first()[0])
            assert per[g] >= min(bud, total_g)
            # removing the LAST kept doc must drop below budget
            last = (kept.filter(F.col("lang") == g)
                    .orderBy(F.desc("n"), F.desc("doc_id")).first())
            assert per[g] - last["n"] < bud

    def test_weight_scale_invariance(self, spark):
        from validatelite_spark.operators.sampling import \
            mixture_budget_filter
        df = self._df(spark)
        a = sorted(r["doc_id"] for r in mixture_budget_filter(
            df, 1500, {"en": 0.6, "de": 0.4}, "n", "lang",
            order_col="n", key_col="doc_id").collect())
        b = sorted(r["doc_id"] for r in mixture_budget_filter(
            df, 1500, {"en": 6, "de": 4}, "n", "lang",
            order_col="n", key_col="doc_id").collect())
        assert a == b  # weights renormalize

    def test_uniform_dict_equals_scalar(self, spark):
        from validatelite_spark.operators.sampling import \
            token_budget_filter
        df = self._df(spark)
        a = sorted(r["doc_id"] for r in token_budget_filter(
            df, 600, "n", "lang", order_col="n",
            key_col="doc_id").collect())
        b = sorted(r["doc_id"] for r in token_budget_filter(
            df, {g: 600 for g in ("en", "de", "fr", "it")}, "n", "lang",
            order_col="n", key_col="doc_id").collect())
        assert a == b

    def test_bad_weights_raise(self, spark):
        from validatelite_spark.operators.sampling import \
            mixture_weights_to_budgets
        import pytest as _pt
        with _pt.raises(ValueError):
            mixture_weights_to_budgets(100, {"en": 0.0})


class TestScoreBuckets:
    def _df(self, spark):
        rows = [("a", i, float(i)) for i in range(1, 31)]          # 1..30
        rows += [("b", 100 + i, float(10 * i)) for i in range(1, 10)]
        return spark.createDataFrame(rows, "g string, k long, v double")

    def test_tertiles_match_numpy_reference(self, spark):
        import numpy as np
        from validatelite_spark.operators.sampling import score_buckets
        df = self._df(spark)
        out = score_buckets(df, "v", "g").collect()
        vals = {"a": [float(i) for i in range(1, 31)],
                "b": [float(10 * i) for i in range(1, 10)]}
        for r in out:
            t1, t2 = (round(float(np.percentile(
                vals[r["g"]], 100 * c, method="linear")) + 1e-9, 4)
                for c in (1 / 3, 2 / 3))
            want = ("head" if r["v"] <= t1
                    else "middle" if r["v"] <= t2 else "tail")
            assert r["bucket"] == want, (r, t1, t2)
        # roughly equal thirds per group
        from collections import Counter
        ca = Counter(r["bucket"] for r in out if r["g"] == "a")
        assert ca == {"head": 10, "middle": 10, "tail": 10}

    def test_null_score_gets_null_bucket_not_tail(self, spark):
        from validatelite_spark.operators.sampling import score_buckets
        df = self._df(spark).unionByName(
            self._df(spark).sparkSession.createDataFrame(
                [("a", 999, None)], "g string, k long, v double"))
        out = {r["k"]: r["bucket"] for r in score_buckets(
            df, "v", "g").collect()}
        assert out[999] is None

    def test_null_group_has_own_cuts(self, spark):
        from validatelite_spark.operators.sampling import score_buckets
        rows = [("a", i, float(i)) for i in range(1, 10)]
        rows += [(None, 100 + i, float(i)) for i in range(1, 10)]
        df = spark.createDataFrame(rows, "g string, k long, v double")
        out = score_buckets(df, "v", "g").collect()
        nulls = [r for r in out if r["g"] is None]
        assert len(nulls) == 9
        assert {r["bucket"] for r in nulls} == {"head", "middle", "tail"}

    def test_plan_broadcasts_thresholds(self, spark):
        from validatelite_spark.operators.sampling import score_buckets
        plan = (score_buckets(self._df(spark), "v", "g")
                ._jdf.queryExecution().executedPlan().toString())
        assert "BroadcastHashJoin" in plan

    def test_custom_cuts_and_approx_path(self, spark):
        from validatelite_spark.operators.sampling import score_buckets
        df = self._df(spark)
        out = score_buckets(df, "v", "g", cuts=(0.5,),
                            labels=("keep", "drop"), approx=True).collect()
        assert {r["bucket"] for r in out} == {"keep", "drop"}

    def test_perplexity_composition(self, spark):
        # the faithful CCNet chain: char-bigram LM ppl -> per-lang
        # tertiles; junk text must land in the high-ppl tail
        from validatelite_spark.functions.perplexity import perplexity
        from validatelite_spark.operators.sampling import score_buckets
        texts = [("en", i, "the cat sat on the mat and the dog sat too "
                  * (1 + i % 3)) for i in range(12)]
        texts += [("en", 100, "zxq jkw vvv qqq zzz xxx jjj www qzx jwk"),
                  ("en", 101, "qqq zzz xxx zxq jkw vvv www jjj kkk qpz")]
        df = spark.createDataFrame(texts, "lang string, k long, text string")
        scored = df.withColumn("ppl", perplexity(F.col("text")))
        out = {r["k"]: r["bucket"]
               for r in score_buckets(scored, "ppl", "lang").collect()}
        assert out[100] == "tail" and out[101] == "tail"

    def test_bad_args_raise(self, spark):
        import pytest as _pt
        from validatelite_spark.operators.sampling import score_buckets
        df = self._df(spark)
        with _pt.raises(ValueError):
            score_buckets(df, "v", "g", cuts=(0.5,), labels=("x",))
        with _pt.raises(ValueError):
            score_buckets(df, "v", "g", cuts=(0.7, 0.3))


class TestScoreWeightedSample:
    def test_probability_proportional_to_score(self, spark):
        from validatelite_spark.operators.sampling import (
            score_weighted_sample)
        rows = [(i, 0.0 if i % 3 == 0 else 1.0 if i % 3 == 1 else 0.5)
                for i in range(3000)]
        df = spark.createDataFrame(rows, "doc_id long, score double")
        kept = score_weighted_sample(df, "score", "doc_id").collect()
        by = {0.0: 0, 0.5: 0, 1.0: 0}
        for r in kept:
            by[r.score] += 1
        assert by[0.0] == 0           # zero score never kept
        assert by[1.0] == 1000        # full score always kept
        assert 400 < by[0.5] < 600    # ~half of the 1000 mid docs

    def test_deterministic_and_partition_invariant(self, spark):
        from validatelite_spark.operators.sampling import (
            score_weighted_sample)
        rows = [(i, (i % 10) / 10.0) for i in range(500)]
        a = spark.createDataFrame(rows, "doc_id long, score double")
        one = {r.doc_id for r in score_weighted_sample(
            a, "score", "doc_id").collect()}
        two = {r.doc_id for r in score_weighted_sample(
            a.repartition(13), "score", "doc_id").collect()}
        assert one == two

    def test_null_score_dropped_and_scale(self, spark):
        from validatelite_spark.operators.sampling import (
            score_weighted_sample)
        df = spark.createDataFrame(
            [(1, None), (2, 2.0), (3, 0.4)],
            "doc_id long, score double")
        # scale clamps: score 2.0 -> p=1 always kept; null -> dropped
        kept = {r.doc_id for r in score_weighted_sample(
            df, "score", "doc_id").collect()}
        assert 2 in kept and 1 not in kept
        import pytest as _pt
        with _pt.raises(ValueError):
            score_weighted_sample(df, "score", "doc_id", scale=-1)
