"""Bucketed co-located join — the shuffle-elimination path for repeated
big joins at scale (SURVEY.md §4 'Partitioning & shuffle').

Writing both sides bucketed by the join key lets Spark plan a
SortMergeJoin with NO Exchange on either input: at 100 TB the difference
between this and re-shuffling both sides per join is the job."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # local derby metastore; saveAsTable target
    return str(tmp_path_factory.mktemp("wh"))


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, sf_dir):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        # a dropped-from-metastore table can leave an orphaned location
        import shutil
        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in ("b_orders", "b_lineitem"):
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
        (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
         .mode("overwrite").saveAsTable("b_orders"))
        (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
         .mode("overwrite").saveAsTable("b_lineitem"))

        # small tables would broadcast; force the sort-merge path the
        # bucketing exists for (at scale neither side is broadcastable)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (spark.table("b_lineitem")
                      .join(spark.table("b_orders"),
                            F.col("l_orderkey") == F.col("o_orderkey"))
                      .groupBy("o_orderpriority")
                      .agg(F.count(F.lit(1)).alias("n")))
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # co-located buckets: the join reads both tables without an
            # Exchange below the SortMergeJoin
            assert "SortMergeJoin" in plan
            assert "Exchange hashpartitioning(l_orderkey" not in plan
            assert "Exchange hashpartitioning(o_orderkey" not in plan
            assert "SelectedBucketsCount: 8 out of 8" in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # and it computes the same result as the plain join
        plain = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
                 .join(spark.read.parquet(f"{sf_dir}/orders.parquet"),
                       F.col("l_orderkey") == F.col("o_orderkey"))
                 .groupBy("o_orderpriority")
                 .agg(F.count(F.lit(1)).alias("n")))
        assert sorted(map(tuple, joined.collect())) == \
            sorted(map(tuple, plain.collect()))
