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


class TestIndexDedupStream:
    def test_batches_dedup_against_growing_index(self, spark, tmp_path):
        """Rolling-crawl shape: batch 2 replays batch 1's docs (plus one
        new) — the replayed docs must be dropped because batch 1's
        survivors were folded into the index."""
        from validatelite_spark.operators.dedup import minhash_index_write
        from validatelite_spark.streaming.index_dedup import (
            start_index_dedup_stream)

        base = ("the quick brown fox jumps over the lazy dog and runs "
                "far away into the green forest near the river bank")
        other = ("completely different words about cooking pasta with "
                 "tomato sauce garlic basil and olive oil at home")
        third = ("a third unrelated document that talks about sailing "
                 "boats across the windy northern sea in late autumn")

        idx = str(tmp_path / "index")
        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        # seed index with doc 0 (base text)
        seed = spark.createDataFrame([(0, base)], "doc_id long, text string")
        minhash_index_write(seed, idx)

        schema = "doc_id long, text string"
        # batch 1: near-dup of the seed (1) + a new doc (2)
        spark.createDataFrame([(1, base + " today"), (2, other)], schema) \
            .coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema(seed.schema).parquet(src)
        q = start_index_dedup_stream(stream, idx, out, ckpt,
                                     threshold=0.5)
        try:
            q.processAllAvailable()
            kept1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
            assert kept1 == {2}  # 1 near-dups the seed; 2 is new

            # batch 2: replay doc 2's text (3) + genuinely new (4)
            spark.createDataFrame([(3, other + " again"), (4, third)],
                                  schema) \
                .coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
            kept2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
            # 3 near-dups doc 2 (now IN the index); 4 survives
            assert kept2 == {2, 4}
        finally:
            q.stop()

    def test_within_batch_near_dups_collapse(self, spark, tmp_path):
        """ADVICE r3: two near-dups arriving in the SAME micro-batch
        must not both be kept — one representative (min id) survives."""
        from validatelite_spark.operators.dedup import minhash_index_write
        from validatelite_spark.streaming.index_dedup import (
            index_dedup_batch)

        base = ("the quick brown fox jumps over the lazy dog and runs "
                "far away into the green forest near the river bank")
        other = ("completely different words about cooking pasta with "
                 "tomato sauce garlic basil and olive oil at home")
        idx = str(tmp_path / "index")
        out = str(tmp_path / "out")
        seed = spark.createDataFrame([(0, other)],
                                     "doc_id long, text string")
        minhash_index_write(seed, idx)
        batch = spark.createDataFrame(
            [(5, base), (6, base + " today"), (7, base + " now")],
            "doc_id long, text string")
        index_dedup_batch(batch, idx, out, threshold=0.5)
        kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
        assert kept == {5}  # 6 and 7 near-dup 5 within the batch

    def test_replayed_batch_is_exactly_once(self, spark, tmp_path):
        """Round-3 verdict #8: replaying a batch id must yield an
        identical corpus + index. Ledger skips a fully-processed
        replay; a forced double-append (ledger removed — the
        crash-between-append-and-marker case) is erased exactly by
        compaction + deduped read."""
        import os

        from validatelite_spark.operators.dedup import (
            incremental_minhash_pairs, minhash_index_write)
        from validatelite_spark.streaming.index_dedup import (
            _marker_path, compact_minhash_index, index_dedup_batch,
            read_deduped_corpus)

        base = ("the quick brown fox jumps over the lazy dog and runs "
                "far away into the green forest near the river bank")
        other = ("completely different words about cooking pasta with "
                 "tomato sauce garlic basil and olive oil at home")
        idx = str(tmp_path / "index")
        out = str(tmp_path / "out")
        seed = spark.createDataFrame([(0, base)],
                                     "doc_id long, text string")
        minhash_index_write(seed, idx)
        batch = spark.createDataFrame(
            [(1, base + " today"), (2, other)],
            "doc_id long, text string")

        index_dedup_batch(batch, idx, out, threshold=0.5, batch_id=7)
        corpus1 = sorted(map(tuple, spark.read.parquet(out).collect()))
        bands1 = spark.read.parquet(f"{idx}/bands").count()

        # replay with marker present → complete no-op
        index_dedup_batch(batch, idx, out, threshold=0.5, batch_id=7)
        assert sorted(map(tuple,
                          spark.read.parquet(out).collect())) == corpus1
        assert spark.read.parquet(f"{idx}/bands").count() == bands1

        # crash-window replay: marker lost → double-append happens,
        # compaction + deduped read restore the exact single-run state
        os.remove(_marker_path(idx, 7))
        index_dedup_batch(batch, idx, out, threshold=0.5, batch_id=7)
        assert spark.read.parquet(f"{idx}/bands").count() > bands1
        compact_minhash_index(spark, idx)
        assert spark.read.parquet(f"{idx}/bands").count() == bands1
        assert sorted(map(tuple,
                          read_deduped_corpus(spark, out).collect())) \
            == corpus1
        # and the compacted index still probes correctly
        probe = spark.createDataFrame([(9, other + " again")],
                                      "doc_id long, text string")
        got = incremental_minhash_pairs(probe, idx,
                                        threshold=0.5).collect()
        assert {(r["id1"], r["id2"]) for r in got} == {(2, 9)}

    def test_ledger_and_compaction_on_uri_scheme_path(self, spark,
                                                      tmp_path):
        """ADVICE r4 / VERDICT r4 #8: with a URI-scheme index path the
        old os.path ledger silently wrote a driver-local directory
        named after the scheme and never skipped replays. All marker
        IO now goes through the Hadoop FileSystem API — run the whole
        replay contract against ``file:``-prefixed paths (same URI
        parsing as hdfs:// / s3a://, backed by the local FS)."""
        from validatelite_spark.operators.dedup import minhash_index_write
        from validatelite_spark.sources import fsutil
        from validatelite_spark.streaming.index_dedup import (
            _marker_path, compact_minhash_index, index_dedup_batch)

        base = ("the quick brown fox jumps over the lazy dog and runs "
                "far away into the green forest near the river bank")
        idx = "file:" + str(tmp_path / "index")
        out = "file:" + str(tmp_path / "out")
        seed = spark.createDataFrame([(0, base)],
                                     "doc_id long, text string")
        minhash_index_write(seed, idx)
        batch = spark.createDataFrame(
            [(1, base + " today")], "doc_id long, text string")
        index_dedup_batch(batch, idx, out, threshold=0.5, batch_id=3)
        assert fsutil.exists(spark, _marker_path(idx, 3))
        bands1 = spark.read.parquet(f"{idx}/bands").count()
        # replay is a no-op through the URI path
        index_dedup_batch(batch, idx, out, threshold=0.5, batch_id=3)
        assert spark.read.parquet(f"{idx}/bands").count() == bands1
        # compaction works end-to-end on the URI path too
        compact_minhash_index(spark, idx)
        assert spark.read.parquet(f"{idx}/bands").count() == bands1

    def test_compaction_crash_windows_recover(self, spark, tmp_path):
        """ADVICE r4: the old rmtree-then-rename compaction could
        crash with the live table deleted. Each window of the new
        aside-rename sequence must self-heal via
        recover_minhash_index (also invoked by compaction itself)."""
        from validatelite_spark.operators.dedup import minhash_index_write
        from validatelite_spark.sources import fsutil
        from validatelite_spark.streaming.index_dedup import (
            recover_minhash_index)

        base = ("the quick brown fox jumps over the lazy dog and runs "
                "far away into the green forest near the river bank")
        idx = str(tmp_path / "index")
        seed = spark.createDataFrame([(0, base), (1, base + " now")],
                                     "doc_id long, text string")
        minhash_index_write(seed, idx)
        bands = spark.read.parquet(f"{idx}/bands").count()

        # window A: crash after writing the compacted tmp — live intact
        spark.read.parquet(f"{idx}/bands").distinct().write.mode(
            "overwrite").parquet(f"{idx}/_bands_compacting")
        recover_minhash_index(spark, idx)
        assert not fsutil.exists(spark, f"{idx}/_bands_compacting")
        assert spark.read.parquet(f"{idx}/bands").count() == bands

        # window B: crash between aside-rename and promote — src gone,
        # tmp complete → promoted
        spark.read.parquet(f"{idx}/bands").distinct().write.mode(
            "overwrite").parquet(f"{idx}/_bands_compacting")
        fsutil.rename(spark, f"{idx}/bands", f"{idx}/_bands_old")
        recover_minhash_index(spark, idx)
        assert spark.read.parquet(f"{idx}/bands").count() == bands
        assert not fsutil.exists(spark, f"{idx}/_bands_old")

        # window C: crash before final cleanup — src + _old both present
        spark.read.parquet(f"{idx}/bands").write.mode(
            "overwrite").parquet(f"{idx}/_bands_old")
        recover_minhash_index(spark, idx)
        assert not fsutil.exists(spark, f"{idx}/_bands_old")
        assert spark.read.parquet(f"{idx}/bands").count() == bands
