"""Multimodal plumbing, source dispatch, and streaming tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from validatelite_spark.operators import multimodal
from validatelite_spark.pipeline.pages import synthesize_pages
from validatelite_spark.pipeline.quality import QualityPipeline
from validatelite_spark.sources.reader import SourceError, read_source
from validatelite_spark.streaming.quality_stream import windowed_keep_metrics


class TestMultimodal:
    def test_fake_decode_features(self, spark):
        pages = synthesize_pages(spark, 100)
        feats = multimodal.decode_media(pages, "html", "url").cache()
        assert feats.schema.simpleString() == (
            "struct<url:string,n_bytes:bigint,format:string,"
            "features:array<float>>")
        rows = feats.collect()
        assert len(rows) == 100
        assert all(r["format"] == "html" for r in rows)
        # features are an L1-normalized 16-bin histogram
        for r in rows[:5]:
            assert len(r["features"]) == 16
            assert abs(sum(r["features"]) - 1.0) < 1e-5
        # determinism across partitionings
        again = multimodal.decode_media(pages.repartition(7), "html", "url")
        assert (sorted(map(tuple, rows)) ==
                sorted(map(tuple, again.collect())))

    def test_real_image_decode(self, spark):
        """decoder='image' really decodes BMP + PPM (pure numpy)."""
        imgs = multimodal.synthesize_images(spark, 64, height=8, width=8)
        feats = multimodal.decode_media(imgs, "html", "url",
                                        decoder="image").cache()
        rows = {r["url"]: r for r in feats.collect()}
        assert len(rows) == 64
        fmts = {r["format"] for r in rows.values()}
        assert fmts == {"bmp", "ppm"}
        for r in rows.values():
            f = r["features"]
            assert len(f) == 21
            assert f[0] == 8.0 and f[1] == 8.0          # w, h
            assert all(0.0 <= x <= 1.0 for x in f[2:])  # means + thumb
        # pin id=0 (ppm) exactly against an independent numpy recompute
        import numpy as np
        yy, xx = np.mgrid[0:8, 0:8]
        px = (yy * 13 + xx * 7) % 256
        img = np.stack([px, (px * 3 + 17) % 256, (px * 5 + 101) % 256],
                       axis=2).astype(np.uint8)
        got = rows["img://corpus/00000000"]["features"]
        exp_means = (img.astype(np.float64) / 255.0).mean(axis=(0, 1))
        for g, e in zip(got[2:5], exp_means):
            assert abs(g - e) < 1e-6
        # determinism across partitionings (rule 6: pure function of id)
        again = multimodal.decode_media(
            multimodal.synthesize_images(spark, 64).repartition(7),
            "html", "url", decoder="image")
        assert (sorted(map(tuple, rows.values())) ==
                sorted(map(tuple, again.collect())))

    def test_codec_roundtrip_and_junk_safety(self, spark):
        import numpy as np
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
        assert np.array_equal(
            multimodal.decode_bmp(multimodal.encode_bmp(img)), img)
        assert np.array_equal(
            multimodal.decode_pnm(multimodal.encode_ppm(img)), img)
        # undecodable payloads yield NULL features, never an exception
        junk = spark.createDataFrame(
            [("u1", bytearray(b"\x89PNG not really")),
             ("u2", bytearray(b"BM truncated")),
             ("u3", None)],
            "url string, html binary")
        got = {r["url"]: r for r in multimodal.decode_media(
            junk, "html", "url", decoder="image").collect()}
        assert got["u1"]["format"] == "png" and got["u1"]["features"] is None
        assert got["u2"]["features"] is None
        assert got["u3"]["format"] == "missing"

    def test_real_audio_decode(self, spark):
        """decoder='audio' really decodes RIFF/WAVE PCM (pure numpy)."""
        import numpy as np
        clips = multimodal.synthesize_audio(spark, 40, n_samples=2048,
                                            rate=16000)
        feats = multimodal.decode_media(clips, "html", "url",
                                        decoder="audio").cache()
        rows = {r["url"]: r for r in feats.collect()}
        assert len(rows) == 40
        assert all(r["format"] == "wav" for r in rows.values())
        for r in rows.values():
            f = r["features"]
            assert len(f) == 21
            assert f[0] == 1.0 and f[1] == 16000.0 and f[2] == 2048.0
            assert abs(sum(f[5:]) - 1.0) < 1e-6  # normalized spectrum
        # id=0 is a 110 Hz sine: rms ~ 0.5/sqrt(2), energy in bin 0
        f0 = rows["audio://corpus/00000000"]["features"]
        assert abs(f0[3] - 0.5 / np.sqrt(2)) < 1e-2
        assert f0[5] == max(f0[5:])
        # wav round-trip at sample precision
        s = np.linspace(-0.8, 0.8, 500)
        dec, rate = multimodal.decode_wav(multimodal.encode_wav(s, 8000))
        assert rate == 8000
        assert np.max(np.abs(dec[:, 0] - s)) < 1 / 32768 + 1e-9
        # determinism across partitionings
        again = multimodal.decode_media(
            multimodal.synthesize_audio(spark, 40).repartition(7),
            "html", "url", decoder="audio")
        assert (sorted(map(tuple, rows.values())) ==
                sorted(map(tuple, again.collect())))

    def test_real_video_decode(self, spark):
        """decoder='video' really decodes YUV4MPEG2 (pure numpy)."""
        import numpy as np
        vids = multimodal.synthesize_videos(spark, 24, n_frames=6,
                                            height=8, width=8, fps=25)
        feats = multimodal.decode_media(vids, "html", "url",
                                        decoder="video").cache()
        rows = {r["url"]: r for r in feats.collect()}
        assert len(rows) == 24
        assert all(r["format"] == "y4m" for r in rows.values())
        for r in rows.values():
            f = r["features"]
            assert len(f) == 21
            assert f[:4] == [8.0, 8.0, 6.0, 25.0]  # w, h, frames, fps
            assert f[4] > 0  # the moving gradient has motion
        # pin id=0's motion against an independent numpy recompute
        ff, yy, xx = np.mgrid[0:6, 0:8, 0:8]
        luma = ((ff * 11 + yy * 13 + xx * 7) % 256).astype(np.uint8)
        exp = float(np.mean(np.abs(np.diff(
            luma.astype(np.float64) / 255.0, axis=0))))
        got = rows["video://corpus/00000000"]["features"][4]
        assert abs(got - exp) < 1e-6  # features land as float32
        # y4m round-trip at byte precision
        frames = (np.arange(4 * 6 * 8, dtype=np.int64) % 256
                  ).astype(np.uint8).reshape(4, 6, 8)
        dec, fps = multimodal.decode_y4m(multimodal.encode_y4m(frames, 30))
        assert fps == 30.0 and np.array_equal(dec, frames)
        # determinism across partitionings
        again = multimodal.decode_media(
            multimodal.synthesize_videos(spark, 24).repartition(5),
            "html", "url", decoder="video")
        assert (sorted(map(tuple, rows.values())) ==
                sorted(map(tuple, again.collect())))

    def test_frame_sample(self, spark):
        pages = synthesize_pages(spark, 40)
        frames = multimodal.frame_sample(pages, n_frames=4)
        got = frames.groupBy("url").count().collect()
        # 4 per row; the planted duplicate url (id=1 reuses id=0's) gets 8
        assert sum(r["count"] for r in got) == 160
        assert all(r["count"] in (4, 8) for r in got)
        one = frames.filter(F.col("frame_idx") == 0).first()
        assert bytes(one["frame_bytes"]).startswith(b"<html>")


class TestSources:
    def test_parquet_dispatch(self, spark, sf_dir):
        df = read_source(spark, f"{sf_dir}/documents.parquet")
        assert df.count() == 500

    def test_csv_tsv_json_roundtrip(self, spark, tmp_path):
        df = spark.range(10).withColumn("s", F.concat(F.lit("v"), "id"))
        csv_p, tsv_p, json_p = (str(tmp_path / n) for n in
                                ("t.csv", "t.tsv", "t.jsonl"))
        df.write.options(header=True).csv(csv_p)
        df.write.options(header=True, sep="\t").csv(tsv_p)
        df.write.json(json_p)
        assert read_source(spark, csv_p, format="csv").count() == 10
        assert read_source(spark, tsv_p, format="csv", sep="\t").count() == 10
        assert read_source(spark, json_p, format="json").count() == 10
        # extension-based dispatch on a directory of json files
        assert read_source(spark, json_p).count() == 10

    def test_unknown_source_errors(self, spark, tmp_path):
        with pytest.raises(SourceError):
            read_source(spark, str(tmp_path / "nothing.xyz"))
        with pytest.raises(SourceError):
            read_source(spark, "mysql://host/db")  # no table=

    def test_iceberg_stub_errors_cleanly(self, spark):
        with pytest.raises(SourceError):
            read_source(spark, "iceberg://catalog.db.tbl")

    def test_excel_multisheet_scan(self, spark, tmp_path):
        """Excel scan via the pure-stdlib xlsx parser (no openpyxl):
        multi-sheet, typed cells, None padding, read_source dispatch."""
        from validatelite_spark.sources.reader import read_excel
        from validatelite_spark.sources.xlsx import write_xlsx
        p = str(tmp_path / "book.xlsx")
        write_xlsx(p, {
            "people": (["name", "age"],
                       [["alice", 31], ["bob", 28], [None, None]]),
            "scores": (["k", "v"], [["a", 1.5], ["b", 2.0]]),
        })
        sheets = read_excel(spark, p)
        assert set(sheets) == {"people", "scores"}
        got = {r["name"]: r["age"] for r in sheets["people"].collect()}
        assert got == {"alice": 31, "bob": 28, None: None}
        one = read_excel(spark, p, sheet_name="scores")
        assert one.count() == 2
        # read_source dispatches .xlsx (first sheet by default)
        assert read_source(spark, p).count() == 3
        assert read_source(spark, p, sheet_name="scores").count() == 2
        with pytest.raises(SourceError):
            read_excel(spark, p, sheet_name="missing")
        with pytest.raises(SourceError):
            read_excel(spark, str(tmp_path / "old.xls"))


class TestStreaming:
    def test_streaming_media_decode(self, spark, tmp_path):
        """decode_media is a mapInPandas projection, so the same code
        runs unchanged on a stream — batch and streaming results match
        row-for-row."""
        src = str(tmp_path / "media_src")
        imgs = multimodal.synthesize_images(spark, 80)
        imgs.write.parquet(src)
        stream = spark.readStream.schema(imgs.schema).parquet(src)
        q = (multimodal.decode_media(stream, "html", "url",
                                     decoder="image")
             .writeStream.outputMode("append")
             .format("memory").queryName("media_feats").start())
        try:
            q.processAllAvailable()
            got = sorted(map(tuple,
                             spark.sql("select * from media_feats")
                             .collect()))
        finally:
            q.stop()
        want = sorted(map(tuple, multimodal.decode_media(
            spark.read.parquet(src), "html", "url",
            decoder="image").collect()))
        assert got == want and len(got) == 80

    def test_windowed_keep_metrics_memory_sink(self, spark, tmp_path):
        # batch-write pages then replay them as a file stream
        src = str(tmp_path / "stream_src")
        pages = synthesize_pages(spark, 400)
        pages.write.parquet(src)
        stream = (spark.readStream.schema(pages.schema).parquet(src))
        pipe = QualityPipeline(spark)
        agg = windowed_keep_metrics(pipe, stream, window="6 hours")
        q = (agg.writeStream.outputMode("complete")
             .format("memory").queryName("keep_metrics").start())
        try:
            q.processAllAvailable()
            got = spark.sql(
                "select * from keep_metrics order by window_start").collect()
        finally:
            q.stop()
        assert len(got) >= 2  # pages span a 30-day window
        assert sum(r["total"] for r in got) == 400
        # streaming totals equal the batch pipeline's totals
        batch_kept = pipe.annotate(pages).filter("keep").count()
        assert sum(r["kept"] for r in got) == batch_kept


class TestPerceptualDedup:
    def test_dhash_numpy_reference(self):
        import numpy as np
        from validatelite_spark.operators.multimodal import dhash64
        rng_y, rng_x = np.mgrid[0:16, 0:16]
        img = np.stack([(rng_y * 9 + rng_x * 5) % 256] * 3,
                       axis=2).astype(np.uint8)
        h = dhash64(img)
        # independent recompute
        g = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
        s = g[np.ix_((np.arange(8) * 16) // 8, (np.arange(9) * 16) // 9)]
        want = 0
        for b in (s[:, 1:] > s[:, :-1]).ravel():
            want = (want << 1) | int(b)
        if want >= 1 << 63:
            want -= 1 << 64
        assert h == want
        # uniform brightness shift leaves dHash unchanged (no wrap)
        assert dhash64(np.clip(img.astype(int) + 10, 0, 255)
                       .astype(np.uint8)) == h

    def test_identical_images_pair_at_distance_zero(self, spark):
        from validatelite_spark.operators.multimodal import (
            image_near_dup_pairs,
            synthesize_images,
        )
        # generator pixels depend on id only through (id*31) % 256 ->
        # ids 256 apart are pixel-identical
        imgs = synthesize_images(spark, 300)
        pairs = image_near_dup_pairs(imgs, max_distance=0).collect()
        got = {(r["id1"], r["id2"]) for r in pairs}
        for i in range(300 - 256):
            a, b = f"img://corpus/{i:08d}", f"img://corpus/{i + 256:08d}"
            assert (min(a, b), max(a, b)) in got

    def test_undecodable_rows_dropped(self, spark):
        from validatelite_spark.operators.multimodal import image_dhash
        df = spark.createDataFrame(
            [("u1", bytearray(b"not an image")), ("u2", None)],
            "url string, html binary")
        assert image_dhash(df).collect() == []


class TestAudioDedup:
    def test_fp_numpy_reference_and_gain_invariance(self):
        import numpy as np
        from validatelite_spark.operators.multimodal import audio_fp64
        t = np.arange(2048) / 16000.0
        clip = 0.5 * np.sin(2 * np.pi * 440.0 * t)
        h = audio_fp64(clip)
        spec = np.abs(np.fft.rfft(clip)) ** 2
        edges = np.linspace(1, len(spec), 66).astype(int)
        bands = np.array([spec[a:b].sum() if b > a else 0.0
                          for a, b in zip(edges[:-1], edges[1:])])
        want = 0
        for b in bands[1:] > bands[:-1]:
            want = (want << 1) | int(b)
        if want >= 1 << 63:
            want -= 1 << 64
        assert h == want
        assert audio_fp64(clip * 0.1) == h  # gain-invariant

    def test_same_pitch_clips_pair(self, spark):
        from validatelite_spark.operators.multimodal import (
            audio_near_dup_pairs,
            synthesize_audio,
        )
        # generator pitch = 110*(1 + i % 37): ids 37 apart are
        # identical clips -> distance-0 pairs
        clips = synthesize_audio(spark, 80)
        got = {(r["id1"], r["id2"])
               for r in audio_near_dup_pairs(clips,
                                             max_distance=0).collect()}
        for i in range(80 - 37):
            a = f"audio://corpus/{i:08d}"
            b = f"audio://corpus/{i + 37:08d}"
            assert (min(a, b), max(a, b)) in got


class TestVideoDedup:
    def test_fp_numpy_reference_and_gain_invariance(self):
        import numpy as np
        from validatelite_spark.operators.multimodal import video_fp64
        ff, yy, xx = np.mgrid[0:6, 0:8, 0:8]
        clip = ((ff * 11 + yy * 13 + xx * 7) % 200).astype(np.uint8)
        h = video_fp64(clip)
        g = clip.astype(np.float64)
        cm = g[(np.arange(8) * 6) // 8].mean(axis=1)
        s = cm[:, (np.arange(9) * 8) // 9]
        want = 0
        for b in (s[:, 1:] > s[:, :-1]).ravel():
            want = (want << 1) | int(b)
        if want >= 1 << 63:
            want -= 1 << 64
        assert h == want
        # uniform luma shift (no wrap) leaves the hash unchanged
        assert video_fp64(np.clip(clip.astype(int) + 30, 0, 255)
                          .astype(np.uint8)) == h

    def test_identical_videos_pair_at_distance_zero(self, spark):
        from validatelite_spark.operators.multimodal import (
            synthesize_videos,
            video_near_dup_pairs,
        )
        # generator luma depends on id only through (id*29) % 256 ->
        # ids 256 apart are pixel-identical clips
        vids = synthesize_videos(spark, 300)
        got = {(r["id1"], r["id2"])
               for r in video_near_dup_pairs(vids,
                                             max_distance=0).collect()}
        for i in range(300 - 256):
            a = f"video://corpus/{i:08d}"
            b = f"video://corpus/{i + 256:08d}"
            assert (min(a, b), max(a, b)) in got

    def test_undecodable_rows_dropped(self, spark):
        from validatelite_spark.operators.multimodal import (
            video_fingerprint)
        df = spark.createDataFrame(
            [("u1", bytearray(b"not a video")), ("u2", None)],
            "url string, html binary")
        assert video_fingerprint(df).collect() == []
