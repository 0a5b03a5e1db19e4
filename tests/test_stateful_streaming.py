"""Cross-micro-batch stateful dedup test (applyInPandasWithState)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from validatelite_spark.pipeline.pages import synthesize_pages
from validatelite_spark.streaming.stateful_dedup import streaming_exact_dedup


class TestStatefulDedup:
    def test_dedup_across_micro_batches(self, spark, tmp_path):
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        pages = synthesize_pages(spark, 200).filter(
            F.col("text").isNotNull()).select("url", "text")
        # batch 1
        pages.coalesce(1).write.mode("append").parquet(src)

        stream = spark.readStream.schema(pages.schema).parquet(src)
        out = streaming_exact_dedup(stream)
        q = (out.writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .format("memory").queryName("dedup_out").start())
        try:
            q.processAllAvailable()
            first = spark.sql("select count(*) c from dedup_out").first()["c"]
            distinct_fp = spark.sql(
                "select count(distinct fp) c from dedup_out").first()["c"]
            assert first == distinct_fp  # one row per distinct content

            # batch 2: replay the SAME rows → all duplicates, nothing new
            pages.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            second = spark.sql("select count(*) c from dedup_out").first()["c"]
            assert second == first, "cross-batch state failed to dedup"
        finally:
            q.stop()
