"""Unit tests for the pure-Python core (no Spark needed)."""

from __future__ import annotations

import pytest

from validatelite_spark.core.rule_parser import RuleParseError, parse_rule
from validatelite_spark.core.rules import Rule, RuleType, RuleValidationError
from validatelite_spark.core.types import (
    DataType,
    TypeParseError,
    canonical_of_native,
    format_to_strptime,
    parse_type,
)


class TestTypeParser:
    def test_bare_types(self):
        assert parse_type("string").data_type == DataType.STRING
        assert parse_type("integer").data_type == DataType.INTEGER
        assert parse_type("float").data_type == DataType.FLOAT
        assert parse_type("boolean").data_type == DataType.BOOLEAN
        assert parse_type("date").data_type == DataType.DATE
        assert parse_type("datetime").data_type == DataType.DATETIME

    def test_parameterized(self):
        t = parse_type("string(50)")
        assert t.data_type == DataType.STRING and t.max_length == 50
        t = parse_type("integer(10)")
        assert t.max_digits == 10
        t = parse_type("float(12,2)")
        assert (t.precision, t.scale) == (12, 2)
        t = parse_type("date('YYYY-MM-DD')")
        assert t.format == "YYYY-MM-DD"
        t = parse_type("datetime('yyyymmdd')")
        assert t.data_type == DataType.DATETIME and t.format == "yyyymmdd"

    def test_errors(self):
        for bad in ["string(0)", "float(2,5)", "integer(x)", "wat", ""]:
            with pytest.raises(TypeParseError):
                parse_type(bad)

    def test_native_normalization(self):
        assert canonical_of_native("VARCHAR(255)") == DataType.STRING
        assert canonical_of_native("bigint") == DataType.INTEGER
        assert canonical_of_native("DECIMAL(10,2)") == DataType.FLOAT
        assert canonical_of_native("timestamp") == DataType.DATETIME
        assert canonical_of_native("blob") is None

    def test_format_tokens(self):
        assert format_to_strptime("YYYY-MM-DD") == "%Y-%m-%d"
        assert format_to_strptime("yyyymmdd") == "%Y%m%d"
        assert format_to_strptime("HH:MI:SS") == "%H:%M:%S"


class TestRuleModel:
    def test_roundtrip(self):
        r = Rule(RuleType.RANGE, "age", {"min": 0, "max": 120})
        r2 = Rule.from_dict(r.to_dict())
        assert r2.type == r.type and r2.parameters == r.parameters
        assert r2.id == r.id

    def test_validation(self):
        with pytest.raises(RuleValidationError):
            Rule(RuleType.RANGE, "age", {})
        with pytest.raises(RuleValidationError):
            Rule(RuleType.RANGE, "age", {"min": 10, "max": 1})
        with pytest.raises(RuleValidationError):
            Rule(RuleType.ENUM, "s", {"allowed_values": []})
        with pytest.raises(RuleValidationError):
            Rule(RuleType.REGEX, "s", {"pattern": "("})
        with pytest.raises(RuleValidationError):
            Rule(RuleType.NOT_NULL, None)
        with pytest.raises(RuleValidationError):
            Rule(RuleType.LENGTH, "s", {"min_length": -1, "max_length": 2})


class TestRuleParser:
    def test_inline_corpus(self):
        # the reference's documented inline corpus (FIXTURES.md §5)
        r = parse_rule("not_null(id)")
        assert r.type == RuleType.NOT_NULL and r.column == "id"
        r = parse_rule("unique(email)")
        assert r.type == RuleType.UNIQUE
        r = parse_rule("length(name,2,50)")
        assert r.parameters == {"min_length": 2, "max_length": 50}
        r = parse_rule("range(age,0,120)")
        assert r.parameters == {"min": 0, "max": 120}
        r = parse_rule("enum(status,active,inactive,pending)")
        assert r.parameters["allowed_values"] == ["active", "inactive", "pending"]
        r = parse_rule("enum(gender,0,1)")  # numeric coercion
        assert r.parameters["allowed_values"] == [0, 1]
        r = parse_rule(r"regex(email,^[a-z0-9.]+@[a-z]+\.[a-z]{2,}$)")
        assert r.type == RuleType.REGEX
        assert "@" in r.parameters["pattern"]
        r = parse_rule("date_format(order_date,YYYY-MM-DD)")
        assert r.parameters["format"] == "YYYY-MM-DD"

    def test_regex_pattern_may_contain_commas(self):
        r = parse_rule(r"regex(v,^[a-z]{2,5}$)")
        assert r.parameters["pattern"] == r"^[a-z]{2,5}$"

    def test_errors(self):
        for bad in ["", "not_null", "frobnicate(x)", "range(age)", "length(x)"]:
            with pytest.raises(RuleParseError):
                parse_rule(bad)
