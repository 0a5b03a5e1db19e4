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
