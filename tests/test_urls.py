"""URL canonicalization + url dedup (functions/urls.py,
operators/dedup.py::url_dedup) — Spark vs the DuckDB replay and a
hand-written expectation table."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from validatelite_spark.functions.urls import (canonical_url,
                                               duckdb_canonical_url_sql)
from validatelite_spark.operators.dedup import url_dedup

CASES = [
    ("https://Example.COM/Path", "https://example.com/Path"),
    ("https://example.com/p#frag", "https://example.com/p"),
    ("https://example.com:443/p", "https://example.com/p"),
    ("http://example.com:80/p", "http://example.com/p"),
    ("https://example.com:8443/p", "https://example.com:8443/p"),
    ("https://www.example.com/p", "https://example.com/p"),
    ("https://example.com/p?utm_source=x", "https://example.com/p"),
    ("https://example.com/p?utm_a=1&utm_b=2", "https://example.com/p"),
    ("https://example.com/p?utm_a=1&id=2", "https://example.com/p?id=2"),
    ("https://example.com/p?id=2&utm_a=1", "https://example.com/p?id=2"),
    ("https://example.com/p?id=2&fbclid=x&q=3",
     "https://example.com/p?id=2&q=3"),
    ("HTTPS://WWW.Example.com:443/A/B?gclid=g#x",
     "https://example.com/A/B"),
    ("no-scheme-string", "no-scheme-string"),
    (None, None),
    # ADVICE r4: a query-less URL with a literal '&' in its path (legal
    # per RFC 3986) must NOT be rewritten to '?' — the old single-pass
    # strip + unconditional separator promotion merged distinct pages
    ("https://a.com/a&b", "https://a.com/a&b"),
    ("https://a.com/p?x=1&y=2", "https://a.com/p?x=1&y=2"),
    ("https://a.com/p?utm_a=1&utm_b=2&utm_c=3", "https://a.com/p"),
    ("https://a.com/p?utm_a=1&x=1&utm_b=2&y=2&utm_c=3",
     "https://a.com/p?x=1&y=2"),
    ("https://a.com/p?gclid=1&utm_a=2&gclid=3", "https://a.com/p"),
]


class TestCanonicalUrl:
    def test_expected_forms(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
        got = [r["c"]
               for r in df.select(canonical_url(F.col("u")).alias("c"))
               .collect()]
        assert got == [want for _, want in CASES]

    def test_duckdb_replay_matches(self, spark):
        df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
        got = [r["c"]
               for r in df.select(canonical_url(F.col("u")).alias("c"))
               .collect()]
        con = duckdb.connect()
        sql = duckdb_canonical_url_sql("u")
        duck = [con.execute(f"SELECT {sql} AS c FROM (SELECT ? AS u)",
                            [u]).fetchone()[0] if u is not None else None
                for u, _ in CASES]
        assert got == duck


class TestUrlDedup:
    def test_variants_collapse_to_min_key(self, spark):
        rows = [
            (1, "https://www.example.com/p?utm_s=a"),
            (2, "https://example.com:443/p"),
            (3, "HTTPS://example.com/p#top"),
            (4, "https://example.com/other"),
            (5, None),
            (6, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
        assert kept == [1, 4, 5, 6]  # 2,3 are canonical-equal to 1

    def test_url_decontaminate_matches_variants(self, spark):
        from validatelite_spark.operators.dedup import url_decontaminate
        docs = spark.createDataFrame(
            [(1, "https://www.example.com/eval?utm_s=1"),
             (2, "http://example.com/train"),
             (3, None)],
            "doc_id long, url string")
        bench = spark.createDataFrame(
            [("HTTPS://example.com:443/eval#cite",), (None,)],
            "url string")
        kept = sorted(r["doc_id"]
                      for r in url_decontaminate(docs, bench).collect())
        assert kept == [2, 3]  # 1 matches the canonical benchmark url

    def test_hot_url_plan_has_no_window(self, spark):
        rows = [(i, "https://example.com/hot?utm_c=%d" % i)
                for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = url_dedup(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "partial_min" in plan
        assert [r["doc_id"] for r in out.collect()] == [0]
