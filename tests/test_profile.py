"""One-scan table profiler (operators/profile.py): stat correctness
vs hand counts, exact/approx plan shapes, unsupported types."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [(1, "a", 10.0), (2, "b", None), (3, None, 30.0),
            (4, "b", 40.0), (None, "c", 10.0)]
    return spark.createDataFrame(rows, "k long, s string, v double")


class TestProfile:
    def test_stats(self, spark, tbl):
        from validatelite_spark.operators.profile import profile_table
        out = {r["column"]: r for r in profile_table(tbl).collect()}
        k = out["k"]
        assert (k["n_rows"], k["nulls"], k["n_distinct"]) == (5, 1, 4)
        assert (k["min_num"], k["max_num"], k["avg"]) == (1.0, 4.0, 2.5)
        assert k["min_str"] is None and k["max_str"] is None
        s = out["s"]
        assert (s["nulls"], s["n_distinct"]) == (1, 3)
        assert (s["min_str"], s["max_str"]) == ("a", "c")
        assert s["min_num"] is None and s["avg"] is None
        v = out["v"]
        assert (v["nulls"], v["n_distinct"]) == (1, 3)
        assert v["avg"] == round((10 + 30 + 40 + 10) / 4 + 1e-9, 6)

    def test_single_scan(self, spark, tbl):
        from validatelite_spark.operators.profile import profile_table
        plan = (profile_table(tbl)
                ._jdf.queryExecution().executedPlan().toString())
        # one source scan; the exact path shows the Expand for
        # multi-countDistinct, the approx path must NOT
        assert plan.count("LocalTableScan") + plan.count("ExistingRDD") \
            <= 1
        approx_plan = (profile_table(tbl, approx=True)
                       ._jdf.queryExecution().executedPlan().toString())
        assert "Expand" not in approx_plan

    def test_approx_counts_close(self, spark):
        from validatelite_spark.operators.profile import profile_table
        df = spark.range(3000).select(
            (F.col("id") % 997).alias("m"), F.col("id").alias("k"))
        out = {r["column"]: r
               for r in profile_table(df, approx=True).collect()}
        # default HLL rsd is 0.05 -> 2-sigma tolerance
        assert abs(out["m"]["n_distinct"] - 997) / 997 < 0.1
        assert abs(out["k"]["n_distinct"] - 3000) / 3000 < 0.1

    def test_column_subset_and_missing(self, spark, tbl):
        from validatelite_spark.operators.profile import profile_table
        out = profile_table(tbl, columns=["s"]).collect()
        assert [r["column"] for r in out] == ["s"]
        with pytest.raises(ValueError):
            profile_table(tbl, columns=["nope"])

    def test_unsupported_type_counts_only(self, spark):
        from validatelite_spark.operators.profile import profile_table
        df = spark.createDataFrame(
            [([1, 2],), ([1],), (None,)], "a array<int>")
        (r,) = profile_table(df).collect()
        assert (r["n_rows"], r["nulls"], r["n_distinct"]) == (3, 1, 2)
        assert r["min_num"] is None and r["min_str"] is None
