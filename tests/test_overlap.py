"""Rule-failure overlap (operators/overlap.py): Venn decomposition vs
an independent Python reference, totality of the mask, single-scan
plan shape, and input guards."""

import pytest

from validatelite_spark.core.rule_parser import parse_rules
from validatelite_spark.operators.overlap import (
    rule_marginals,
    rule_overlap,
)

RULES = ["not_null(v)", "range(n,10,20)", "enum(g,a,b)"]


def _ref_mask(v, n, g):
    m = 0
    if v is None:
        m |= 1
    if n is None or n < 10 or n > 20:
        m |= 2
    if g is not None and g not in ("a", "b"):
        m |= 4
    return m


@pytest.fixture(scope="module")
def data(spark):
    rows = [
        ("x", 15, "a"),   # all pass
        (None, 15, "a"),  # not_null only
        ("x", 5, "a"),    # range only
        ("x", 15, "c"),   # enum only
        (None, 5, "c"),   # all three
        ("x", None, None),  # range fails, enum passes (NULL passes)
        (None, 25, "b"),  # not_null + range
    ]
    df = spark.createDataFrame(rows, "v string, n long, g string")
    return df, rows


class TestRuleOverlap:
    def test_matches_reference(self, spark, data):
        df, rows = data
        from collections import Counter
        ref = Counter(_ref_mask(*r) for r in rows)
        got = {r["fail_mask"]: r["n_rows"]
               for r in rule_overlap(df, parse_rules(RULES)).collect()}
        assert got == dict(ref)

    def test_mask_total_and_labels(self, spark, data):
        df, rows = data
        out = rule_overlap(df, parse_rules(RULES)).collect()
        assert sum(r["n_rows"] for r in out) == len(rows)
        lab = {r["fail_mask"]: r["failed_rules"] for r in out}
        assert lab[0] == ""
        assert lab[3] == "not_null_v,range_n"
        assert lab[7] == "not_null_v,range_n,enum_g"

    def test_single_scan_plan(self, spark, data):
        df, _ = data
        plan = (rule_overlap(df, parse_rules(RULES))
                ._jdf.queryExecution().executedPlan().toString())
        # one source, partial+final agg — the fused-rules shape
        assert plan.count("Scan ExistingRDD") + plan.count("FileScan") \
            == 1

    def test_marginals(self, spark, data):
        df, rows = data
        got = {r["rule_name"]: (r["fail_count"], r["unique_fail_count"])
               for r in rule_marginals(df, parse_rules(RULES)).collect()}
        masks = [_ref_mask(*r) for r in rows]
        for i, name in enumerate(["not_null_v", "range_n", "enum_g"]):
            assert got[name] == (
                sum(1 for m in masks if m & (1 << i)),
                sum(1 for m in masks if m == (1 << i)))

    def test_marginals_single_scan(self, spark, data):
        df, _ = data
        plan = (rule_marginals(df, parse_rules(RULES))
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Scan ExistingRDD") + plan.count("FileScan") \
            == 1

    def test_guards(self, spark, data):
        df, _ = data
        with pytest.raises(ValueError):
            rule_overlap(df, [])
        with pytest.raises(ValueError):
            rule_overlap(df, parse_rules(["unique(v)"]))
        too_many = parse_rules([f"not_null(c{i})" for i in range(21)])
        with pytest.raises(ValueError):
            rule_overlap(df, too_many)
