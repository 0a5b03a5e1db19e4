"""WARC source (sources/warc.py): round-trip parse of synthesized
fixtures, gzip multi-member handling, record-type filtering,
truncation tolerance, and byte-exact payloads."""

import gzip

import pytest
from pyspark.sql import functions as F

from validatelite_spark.sources.warc import (
    build_record,
    build_response_record,
    parse_warc,
    read_warc,
    write_warc,
)

BODIES = [b"<html>hello</html>", "<html>café ☃</html>"
          .encode("utf-8"), b"x" * 5000, b""]


def _fixture(tmpdir, compress):
    recs = [build_response_record(
        f"https://h{i}.example/p/{i}",
        f"2024-01-01T00:00:0{i}Z", body)
        for i, body in enumerate(BODIES)]
    # a request record that default filtering must skip
    recs.append(build_record("request", "https://h0.example/p/0",
                             "2024-01-01T00:00:09Z",
                             b"GET /p/0 HTTP/1.1\r\n\r\n"))
    p = str(tmpdir / ("f.warc.gz" if compress else "f.warc"))
    write_warc(p, recs, compress=compress)
    return p


class TestParser:
    @pytest.mark.parametrize("compress", [False, True])
    def test_roundtrip_payloads(self, spark, tmp_path, compress):
        p = _fixture(tmp_path, compress)
        out = read_warc(spark, p).orderBy("url").collect()
        assert len(out) == len(BODIES)
        for i, r in enumerate(out):
            assert r["url"] == f"https://h{i}.example/p/{i}"
            assert r["warc_ts"] == f"2024-01-01T00:00:0{i}Z"
            assert r["status"] == 200
            assert bytes(r["payload"]) == BODIES[i]
            assert r["content_type"].startswith("text/html")

    def test_record_type_filter(self, spark, tmp_path):
        p = _fixture(tmp_path, False)
        all_recs = read_warc(spark, p, record_types=()).collect()
        types = sorted(r["rec_type"] for r in all_recs)
        assert types == ["request"] + ["response"] * 4 + ["warcinfo"]

    def test_truncated_file_yields_prefix(self, spark, tmp_path):
        p = _fixture(tmp_path, False)
        raw = open(p, "rb").read()
        q = str(tmp_path / "trunc.warc")
        open(q, "wb").write(raw[:len(raw) - 30])  # cut into last rec
        got = read_warc(spark, q, record_types=()).count()
        assert got == 5  # warcinfo + 4 responses; request truncated

    def test_multi_file_glob(self, spark, tmp_path):
        _fixture(tmp_path, False)
        # second file, gzipped, same dir
        recs = [build_response_record("https://z.example/",
                                      "2024-01-02T00:00:00Z",
                                      b"zzz")]
        write_warc(str(tmp_path / "g.warc.gz"), recs, compress=True)
        out = read_warc(spark, str(tmp_path) + "/*.warc*")
        assert out.count() == len(BODIES) + 1
        files = out.select(F.col("warc_file")).distinct().count()
        assert files == 2

    def test_pure_python_parse_no_spark(self, tmp_path):
        p = _fixture(tmp_path, True)
        data = gzip.decompress(open(p, "rb").read())
        recs = list(parse_warc(data))
        assert len(recs) == 6
        assert recs[0]["headers"]["warc-type"] == "warcinfo"
        assert recs[1]["headers"]["warc-target-uri"] == \
            "https://h0.example/p/0"
