"""Engine tests: per-rule semantics (NULL behavior!) + fused execution.

Mirrors the reference's per-rule unit suite shape
(tests/unit/core/executors/test_*_rules.py) with golden expected counts
over a deterministic inline dataset.
"""

from __future__ import annotations

import pytest

from validatelite_spark.core.rules import (
    Rule,
    RuleType,
    date_format,
    enum,
    length,
    not_null,
    range_rule,
    regex,
    schema_rule,
    unique,
)
from validatelite_spark.operators.engine import EngineConfig, RuleEngine


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # id, name,     email,                 age,   status,      joined
        (1, "alice", "alice@example.com", 30.0, "active", "2023-01-15"),
        (2, "bob", "bob@test.org", 45.0, "inactive", "2023-02-28"),
        (3, None, "carol@example.com", 150.0, "pending", "2023-02-31"),  # bad age+date
        (4, "dan", None, None, "unknown", "not-a-date"),  # nulls + bad enum/date
        (5, "eve", "alice@example.com", 25.0, "active", "2023-12-01"),  # dup email
        (6, "x", "no-at-sign", -5.0, None, None),  # short name, bad email, neg age
    ]
    return spark.createDataFrame(
        rows, "id long, name string, email string, age double, "
              "status string, joined string")


@pytest.fixture(scope="module")
def engine(spark):
    return RuleEngine(spark)


def _one(engine, df, rule):
    [res] = engine.execute(df, [rule])
    return res


class TestNullSemantics:
    """The golden NULL-handling table from SURVEY.md §2.2."""

    def test_not_null(self, engine, people):
        res = _one(engine, people, not_null("name"))
        assert res.failed_records == 1 and res.total_records == 6
        assert res.status.value == "FAILED"

    def test_range_null_fails(self, engine, people):
        # age: NULL(1) + 150(>120) + -5(<0) = 3 failures
        res = _one(engine, people, range_rule("age", min=0, max=120))
        assert res.failed_records == 3

    def test_length_null_fails(self, engine, people):
        # name: NULL(1) + "x"(len1 < 2) = 2 failures
        res = _one(engine, people, length("name", min_length=2, max_length=50))
        assert res.failed_records == 2

    def test_enum_null_does_not_fail(self, engine, people):
        # status: "unknown" fails; NULL does NOT fail (SQL NOT IN semantics)
        res = _one(engine, people, enum("status", ["active", "inactive", "pending"]))
        assert res.failed_records == 1

    def test_regex_null_does_not_fail(self, engine, people):
        # email: "no-at-sign" fails; NULL does not
        res = _one(engine, people,
                   regex("email", r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"))
        assert res.failed_records == 1

    def test_unique_excludes_nulls(self, engine, people):
        # email: alice@example.com twice → 1 extra; NULL excluded
        res = _one(engine, people, unique("email"))
        assert res.failed_records == 1
        assert res.total_records == 6

    def test_date_format_roundtrip(self, engine, people):
        # joined: 2023-02-31 (semantically invalid) + not-a-date fail;
        # NULL passes (reference: sqlite_functions.py:196-199)
        res = _one(engine, people, date_format("joined", "YYYY-MM-DD"))
        assert res.failed_records == 2


class TestFusedExecution:
    def test_merged_rules_one_scan(self, engine, people):
        rules = [
            not_null("name"),
            range_rule("age", min=0, max=120),
            enum("status", ["active", "inactive", "pending"]),
            length("name", min_length=2),
        ]
        results = engine.execute(people, rules)
        assert [r.failed_records for r in results] == [1, 3, 1, 2]
        # all four share one merged_agg group
        for r in results:
            assert r.execution_plan["execution_type"] == "merged_agg"
            assert r.execution_plan["group_size"] == 4

    def test_filter_condition_scopes_the_scan(self, engine, people):
        r = not_null("name", filter_condition="age > 40")
        res = _one(engine, people, r)
        # only bob(45) and carol(150) pass the filter; carol's name is NULL
        assert res.total_records == 2 and res.failed_records == 1

    def test_different_filters_different_groups(self, engine, people):
        rules = [not_null("name"), not_null("email", filter_condition="id < 4")]
        r1, r2 = engine.execute(people, rules)
        assert r1.total_records == 6
        assert r2.total_records == 3 and r2.failed_records == 0

    def test_merge_disabled_still_correct(self, spark, people):
        eng = RuleEngine(spark, EngineConfig(merge_execution_enabled=False))
        results = eng.execute(people, [not_null("name"),
                                       range_rule("age", min=0, max=120)])
        assert [r.failed_records for r in results] == [1, 3]


class TestSamplesAndErrors:
    def test_lazy_samples_deterministic(self, engine, people):
        res = _one(engine, people, range_rule("age", min=0, max=120))
        ids = [s["id"] for s in res.sample_data]
        assert ids == sorted(ids) and len(ids) == 3

    def test_no_samples_when_passed(self, engine, people):
        res = _one(engine, people, not_null("id"))
        assert res.status.value == "PASSED" and res.sample_data == []

    def test_missing_column_is_error_not_crash(self, engine, people):
        results = engine.execute(people, [not_null("nope"), not_null("name")])
        assert results[0].status.value == "ERROR"
        assert "does not exist" in results[0].error_message
        assert results[1].failed_records == 1  # run continued

    def test_threshold_rate(self, engine, people):
        r = not_null("name", threshold=0.5)  # 1/6 failure rate <= 0.5
        res = _one(engine, people, r)
        assert res.status.value == "PASSED" and res.failed_records == 1


class TestSchemaRule:
    def test_schema_pass_and_mismatch(self, engine, people):
        res = _one(engine, people, schema_rule(
            {"id": "integer", "name": "string", "age": "float"}))
        assert res.status.value == "PASSED"
        assert res.execution_plan["execution_type"] == "metadata"

        res = _one(engine, people, schema_rule(
            {"id": "string", "missing_col": "integer"}))
        assert res.failed_records == 2
        statuses = {s["column"]: s["status"] for s in res.sample_data}
        assert statuses["id"] == "TYPE_MISMATCH"
        assert statuses["missing_col"] == "FIELD_MISSING"

    def test_strict_mode_extras(self, engine, people):
        res = _one(engine, people, schema_rule(
            {"id": "integer"}, strict_mode=True))
        # 5 extra columns fail in strict mode
        assert res.failed_records == 5
