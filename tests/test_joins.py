"""as-of join semantics: backward-inclusive, per-key, deterministic."""

from __future__ import annotations

from validatelite_spark.operators.joins import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


class TestAsofJoin:
    def test_backward_inclusive_and_nulls(self, spark):
        left = _df(spark, [
            (1, 100, 10.0), (2, 100, 25.0), (3, 100, 5.0),
            (4, 200, 50.0),          # key with no right rows at all
        ], "lid long, k long, ts double")
        right = _df(spark, [
            (91, 100, 10.0),          # equal ts → matches lid=1 (inclusive)
            (92, 100, 20.0),
            (93, 100, 30.0),          # after every left row except none
        ], "rid long, k long, ts double")
        out = {r["lid"]: r for r in asof_join(
            left, right, by="k", left_ts="ts", right_ts="ts").collect()}
        assert out[1]["right_rid"] == 91      # ts == ts is a match
        assert out[2]["right_rid"] == 92      # latest preceding, not 93
        assert out[3]["right_rid"] is None    # nothing at or before 5.0
        assert out[4]["right_rid"] is None    # key absent from right
        # left columns survive untouched
        assert out[2]["ts"] == 25.0 and out[2]["k"] == 100

    def test_equal_ts_tiebreak_takes_max(self, spark):
        left = _df(spark, [(1, 7, 10.0)], "lid long, k long, ts double")
        right = _df(spark, [(901, 7, 10.0), (902, 7, 10.0)],
                    "rid long, k long, ts double")
        got = asof_join(left, right, by="k", tiebreak="rid").collect()
        assert got[0]["right_rid"] == 902

    def test_equal_ts_tiebreak_string_ids(self, spark):
        """Tiebreak column ordered in its NATIVE type: a string id must
        still break equal-ts ties (the old cast-to-long produced NULLs
        and silently dropped the ordering — ADVICE r2)."""
        left = _df(spark, [(1, 7, 10.0)], "lid long, k long, ts double")
        right = _df(spark, [("ev-a", 7, 10.0), ("ev-z", 7, 10.0),
                            ("ev-m", 7, 10.0)],
                    "rid string, k long, ts double")
        got = asof_join(left, right, by="k", tiebreak="rid").collect()
        assert got[0]["right_rid"] == "ev-z"  # max in native string order

    def test_partition_invariance(self, spark):
        left = _df(spark, [(i, i % 5, float(i)) for i in range(200)],
                   "lid long, k long, ts double")
        right = _df(spark, [(1000 + i, i % 5, float(i) + 0.5)
                            for i in range(200)],
                    "rid long, k long, ts double")
        a = sorted(map(tuple, asof_join(left, right, by="k").collect()))
        b = sorted(map(tuple, asof_join(
            left.repartition(7), right.repartition(3), by="k").collect()))
        assert a == b


class TestAsofSalting:
    def test_salted_output_identical_and_partitioned(self, spark):
        """One user owning half the events: salt=4 must split that key's
        window into sub-partitions (plan partitions by (key, salt)) and
        produce EXACTLY the unsalted result (VERDICT r2 #8)."""
        left = _df(spark,
                   [(i, 0 if i < 100 else i % 5, float(i))
                    for i in range(200)],     # key 0 owns 50% of left
                   "lid long, k long, ts double")
        right = _df(spark,
                    [(1000 + i, 0 if i < 100 else i % 5, float(i) + 0.5)
                     for i in range(200)],
                    "rid long, k long, ts double")
        plain = sorted(map(tuple, asof_join(
            left, right, by="k", tiebreak="rid").collect()))
        salted_df = asof_join(left, right, by="k", tiebreak="rid", salt=4)
        assert sorted(map(tuple, salted_df.collect())) == plain
        plan = salted_df._jdf.queryExecution().executedPlan().toString()
        import re
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs and all("__salt" in s for s in specs), (
            f"window not salt-partitioned: {specs}")

    def test_salt_one_is_identity_shape(self, spark):
        left = _df(spark, [(1, 7, 10.0)], "lid long, k long, ts double")
        right = _df(spark, [(901, 7, 9.0)], "rid long, k long, ts double")
        plan = (asof_join(left, right, by="k", salt=1)
                ._jdf.queryExecution().executedPlan().toString())
        assert "__salt" not in plan


class TestRangeJoin:
    def test_point_in_interval_semantics(self, spark):
        from validatelite_spark.operators.joins import range_join
        pts = _df(spark, [(1, 5.0), (2, 10.0), (3, 20.0), (4, 35.0)],
                  "pid long, x double")
        ivs = _df(spark, [(100, 0.0, 10.0), (200, 8.0, 25.0),
                          (300, 40.0, 50.0)],
                  "iid long, s double, e double")
        got = sorted((r["pid"], r["right_iid"]) for r in range_join(
            pts, ivs, "x", "s", "e", bucket_width=7.0).collect())
        # 5∈[0,10); 10∈[8,25) but NOT [0,10) (exclusive end); 20∈[8,25)
        assert got == [(1, 100), (2, 200), (3, 200)]
        incl = sorted((r["pid"], r["right_iid"]) for r in range_join(
            pts, ivs, "x", "s", "e", bucket_width=7.0,
            inclusive_end=True).collect())
        assert (2, 100) in incl  # 10 <= 10 now matches

    def test_no_nested_loop_in_plan_and_keyed(self, spark):
        from validatelite_spark.operators.joins import range_join
        pts = _df(spark, [(i, i % 3, float(i)) for i in range(60)],
                  "pid long, k long, x double")
        ivs = _df(spark, [(100 + i, i % 3, float(i), float(i) + 5.0)
                          for i in range(60)],
                  "iid long, k long, s double, e double")
        j = range_join(pts, ivs, "x", "s", "e", bucket_width=5.0, by="k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan
        # brute-force reference
        want = sorted((p, 100 + i) for p in range(60) for i in range(60)
                      if p % 3 == i % 3 and i <= p < i + 5)
        got = sorted((r["pid"], r["right_iid"]) for r in j.collect())
        assert got == want


class TestAsofPlanShape:
    def test_single_shuffle_on_key(self, spark):
        """The merge-asof composition must shuffle ONCE (on the key for
        the window) — no join-based plan, no extra exchanges."""
        left = _df(spark, [(i, i % 5, float(i)) for i in range(50)],
                   "lid long, k long, ts double")
        right = _df(spark, [(900 + i, i % 5, float(i) + 0.3)
                            for i in range(50)],
                    "rid long, k long, ts double")
        plan = (asof_join(left, right, by="k")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan  # window carry-forward, not a join


class TestAsofDirections:
    def _data(self, spark):
        left = _df(spark, [(1, 9, 10.0), (2, 9, 25.0), (3, 9, 31.0)],
                   "lid long, k long, ts double")
        right = _df(spark, [(91, 9, 8.0), (92, 9, 20.0), (93, 9, 30.0)],
                    "rid long, k long, ts double")
        return left, right

    def test_forward_takes_earliest_at_or_after(self, spark):
        left, right = self._data(spark)
        out = {r["lid"]: r["right_rid"] for r in asof_join(
            left, right, by="k", direction="forward").collect()}
        # 10.0 → 20.0; 25.0 → 30.0; 31.0 → nothing after
        assert out == {1: 92, 2: 93, 3: None}

    def test_forward_equal_ts_inclusive_min_tiebreak(self, spark):
        left = _df(spark, [(1, 7, 10.0)], "lid long, k long, ts double")
        right = _df(spark, [(901, 7, 10.0), (902, 7, 10.0)],
                    "rid long, k long, ts double")
        got = asof_join(left, right, by="k", tiebreak="rid",
                        direction="forward").collect()
        assert got[0]["right_rid"] == 901   # min wins (mirror of backward)

    def test_null_tiebreak_loses_ties_both_directions(self, spark):
        # ADVICE r3: a NULL tiebreak must lose equal-ts ties in BOTH
        # directions (backward: asc NULLS FIRST already loses; forward
        # needs desc_nulls_first, not plain desc).
        left = _df(spark, [(1, 7, 10.0)], "lid long, k long, ts double")
        right = _df(spark, [(None, 7, 10.0), (901, 7, 10.0)],
                    "rid long, k long, ts double")
        back = asof_join(left, right, by="k", tiebreak="rid").collect()
        fwd = asof_join(left, right, by="k", tiebreak="rid",
                        direction="forward").collect()
        assert back[0]["right_rid"] == 901  # max non-null wins
        assert fwd[0]["right_rid"] == 901   # min non-null wins; NULL loses

    def test_nearest_picks_closer_and_ties_backward(self, spark):
        left, right = self._data(spark)
        out = {r["lid"]: r["right_rid"] for r in asof_join(
            left, right, by="k", direction="nearest").collect()}
        # 10.0: back 8.0 (d=2) vs fwd 20.0 (d=10) → 91
        # 25.0: back 20.0 (d=5) vs fwd 30.0 (d=5) → TIE → backward 92
        # 31.0: back 30.0 (d=1), no fwd → 93
        assert out == {1: 91, 2: 92, 3: 93}

    def test_nearest_matches_pandas_merge_asof(self, spark):
        import pandas as pd
        lpd = pd.DataFrame({"lid": range(60), "k": [i % 3 for i in range(60)],
                            "ts": [float((i * 17) % 50) for i in range(60)]}
                           ).sort_values("ts")
        rpd = pd.DataFrame({"rid": range(100, 140),
                            "k": [i % 3 for i in range(40)],
                            "ts": [float((i * 13) % 45) + 0.5
                                   for i in range(40)]}).sort_values("ts")
        want = pd.merge_asof(lpd, rpd, on="ts", by="k",
                             direction="nearest")
        got = asof_join(spark.createDataFrame(lpd),
                        spark.createDataFrame(rpd), by="k",
                        direction="nearest").toPandas()
        merged = want.merge(got[["lid", "right_rid"]], on="lid")
        import numpy as np
        assert ((merged["rid"].fillna(-1))
                == (merged["right_rid"].fillna(-1))).all()

    def test_bad_direction_raises(self, spark):
        left, right = self._data(spark)
        import pytest
        with pytest.raises(ValueError):
            asof_join(left, right, by="k", direction="sideways")


class TestAsofNullTimestamps:
    def test_null_ts_matches_nothing_in_any_direction(self, spark):
        """NULL timestamps satisfy no inequality: a NULL-ts left row
        gets NULL match columns and a NULL-ts right row is never a
        match — in ALL three directions (window sort placement must not
        smuggle them in)."""
        left = _df(spark, [(1, 9, None), (2, 9, 10.0)],
                   "lid long, k long, ts double")
        right = _df(spark, [(91, 9, None), (92, 9, 8.0), (93, 9, 20.0)],
                    "rid long, k long, ts double")
        for direction, want2 in (("backward", 92), ("forward", 93),
                                 ("nearest", 92)):
            out = {r["lid"]: r["right_rid"] for r in asof_join(
                left, right, by="k", direction=direction).collect()}
            assert out[1] is None, (direction, out)
            assert out[2] == want2, (direction, out)


class TestIntervalJoin:
    def test_overlap_semantics_owner_bucket_no_dupes(self, spark):
        from validatelite_spark.operators.joins import interval_join
        lv = _df(spark, [(1, 0.0, 10.0), (2, 9.0, 12.0), (3, 30.0, 31.0)],
                 "lid long, s double, e double")
        rv = _df(spark, [(100, 5.0, 9.5), (200, 11.0, 40.0),
                         (300, 10.0, 11.0)],
                 "rid long, s double, e double")
        got = sorted((r["lid"], r["right_rid"]) for r in interval_join(
            lv, rv, "s", "e", "s", "e", bucket_width=3.0).collect())
        # strict overlap: (1,100); (2,100) 9<9.5; (2,300) 10<12 & 9<11;
        # (2,200) 11<12; (3,200) 30<40 & 11<31; NOT (1,300): 10<10 false
        assert got == [(1, 100), (2, 100), (2, 200), (2, 300), (3, 200)]
        # long spans share MANY buckets — owner-bucket must dedup
        assert len(got) == len(set(got))

    def test_matches_bruteforce_keyed(self, spark):
        from validatelite_spark.operators.joins import interval_join
        import itertools
        lrows = [(i, i % 3, float((i * 7) % 40), float((i * 7) % 40 + 6))
                 for i in range(50)]
        rrows = [(100 + i, i % 3, float((i * 11) % 45),
                  float((i * 11) % 45 + 4)) for i in range(50)]
        lv = _df(spark, lrows, "lid long, k long, s double, e double")
        rv = _df(spark, rrows, "rid long, k long, s double, e double")
        got = sorted((r["lid"], r["right_rid"]) for r in interval_join(
            lv, rv, "s", "e", "s", "e", bucket_width=5.0,
            by="k").collect())
        want = sorted((l[0], r[0]) for l, r in
                      itertools.product(lrows, rrows)
                      if l[1] == r[1] and l[2] < r[3] and r[2] < l[3])
        assert got == want
        plan = interval_join(lv, rv, "s", "e", "s", "e", 5.0, by="k") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan
