"""Line-level quality signals (functions/linesignals.py) vs a Python
``re`` reference, plus the LINE_QUALITY registered rule through the
engine's merged single-scan path."""

import re

import pytest
from pyspark.sql import functions as F

from validatelite_spark.core.rules import Rule, RuleType
from validatelite_spark.functions import linesignals as ls

DOCS = [
    "Good line.\nshort\n- bullet item\nALL CAPS LINE\n"
    "Another good one!\n\nlast no punct",
    "One single well punctuated sentence that is quite long indeed.",
    "- a\n- b\n- c\n- d",
    "SHOUT\nSHOUT MORE\nok then.",
    "",
]


def ref_counts(t):
    return dict(
        n=t.count("\n") + 1,
        punct=len(re.findall(r"(?m)[.!?\"'][ \t]*$", t)),
        long=len(re.findall(r"(?m)^.{30,}", t)),
        bullet=len(re.findall(r"(?m)^[ \t]*[-*•]", t)),
        caps=len(re.findall(r"(?m)^[A-Z][^a-z\n]*$", t)),
    )


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "i int, t string")


class TestCounts:
    def test_match_python_re(self, spark, docs_df):
        out = docs_df.select(
            "i",
            ls.line_count(F.col("t")).alias("n"),
            ls.punct_line_count(F.col("t")).alias("punct"),
            ls.long_line_count(F.col("t")).alias("long"),
            ls.bullet_line_count(F.col("t")).alias("bullet"),
            ls.caps_line_count(F.col("t")).alias("caps"),
        ).collect()
        for r in out:
            want = ref_counts(DOCS[r["i"]])
            got = {k: r[k] for k in want}
            assert got == want, (r["i"], got, want)

    def test_fractions(self, spark, docs_df):
        r = {x["i"]: x for x in docs_df.select(
            "i",
            ls.punct_line_fraction(F.col("t")).alias("pf"),
            ls.short_line_fraction(F.col("t")).alias("sf"),
            ls.bullet_line_fraction(F.col("t")).alias("bf"),
        ).collect()}
        assert r[0]["pf"] == pytest.approx(2 / 7)
        assert r[2]["bf"] == 1.0
        assert r[1]["sf"] == 0.0         # one long line
        assert r[4]["sf"] == 1.0         # empty string = one short line


class TestRule:
    def test_fail_predicate(self, spark):
        df = spark.createDataFrame(
            [(0, DOCS[2]), (1, DOCS[1]), (2, None)], "i int, t string")
        out = {r["i"]: r["f"] for r in df.select(
            "i", ls.line_quality_fail(F.col("t")).alias("f")).collect()}
        assert out[0] is True     # all-bullet doc
        assert out[1] is False    # clean sentence
        assert out[2] is True     # NULL fails

    def test_engine_merges_line_quality(self, spark, sf_dir):
        from validatelite_spark.operators.engine import RuleEngine
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        results = RuleEngine(spark).execute(df, [
            Rule(RuleType.NOT_NULL, "text"),
            Rule("LINE_QUALITY", "text", name="lineq"),
        ])
        by = {r.rule_name: r for r in results}
        assert by["lineq"].execution_plan["execution_type"] == "merged_agg"
        # at minimum the NULL-text docs fail
        nulls = df.filter(F.col("text").isNull()).count()
        assert by["lineq"].failed_records >= nulls

    def test_threshold_params(self, spark):
        df = spark.createDataFrame([("a.\nb.",)], "t string")
        strict = ls.line_quality_fail(
            F.col("t"), {"max_short_line_frac": 0.0})
        (r,) = df.select(strict.alias("f")).collect()
        assert r["f"] is True
