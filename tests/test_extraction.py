"""html → text extraction: byte-identity per url (the north-rule
invariant) + parser semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from validatelite_spark.functions.extraction import (extract_text,
                                                     extract_text_bytes)


class TestScalarExtractor:
    def test_tags_entities_and_blocks(self):
        h = ("<html><head><title>T</title><style>p{color:red}</style>"
             "</head><body><h1>Head</h1><p>one &amp; two &lt;three&gt;"
             "</p><div>four <b>five</b></div>"
             "<script>var x = '<p>no</p>';</script>"
             "<!-- comment --><ul><li>a</li><li>b</li></ul>"
             "</body></html>")
        got = extract_text_bytes(h)
        assert got == "T\nHead\none & two <three>\nfour five\na\nb"

    def test_script_style_dropped_nested(self):
        assert extract_text_bytes(
            "<script><div>x</div></script><p>y</p>") == "y"

    def test_malformed_html_degrades_to_data(self):
        # html5-lenient: junk brackets are data, never an exception
        got = extract_text_bytes("<p>a <>@#$ [] ~ b</p>")
        assert got == "a <>@#$ [] ~ b"

    def test_null_and_empty(self):
        assert extract_text_bytes(None) is None
        assert extract_text_bytes(b"<p></p>") is None       # empty → NULL
        assert extract_text_bytes(b"<p></p>", empty_as_null=False) == ""

    def test_bytes_utf8(self):
        assert extract_text_bytes("<p>café</p>".encode()) == "café"

    def test_inner_spaces_preserved_exactly(self):
        assert extract_text_bytes("<p>a  b\tc </p>") == "a  b\tc "


class TestByteIdentityPerUrl:
    def test_all_page_classes_roundtrip(self, spark):
        """Every planted page class (NULL, junk-with-brackets, PII,
        German, boilerplate, …) must extract BYTE-IDENTICAL to the
        page's text column — the north-rule per-row invariant."""
        from validatelite_spark.pipeline.pages import synthesize_pages
        pages = synthesize_pages(spark, 2000)
        cmp = pages.select(
            "url", "text",
            extract_text(F.col("html")).alias("ex"))
        bad = cmp.filter(~(F.col("ex").eqNullSafe(F.col("text")))).collect()
        assert not bad, [(r["url"], r["text"], r["ex"]) for r in bad[:3]]

    def test_extraction_rides_single_scan(self, spark, tmp_path):
        from validatelite_spark.pipeline.pages import synthesize_pages
        p = str(tmp_path / "pages")
        synthesize_pages(spark, 200).write.parquet(p)
        df = spark.read.parquet(p)
        out = df.select("url", extract_text(F.col("html")).alias("t"),
                        F.length("text").alias("n"))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("FileScan") == 1
