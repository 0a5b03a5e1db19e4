"""desired_type compiler — the reference's type-compatibility rewrite
system (reference: cli/commands/schema.py:276-752).

A declared field may carry a ``desired_type`` ("what the column SHOULD
become") next to its current ``type``. The compiler decides, per column:

- COMPATIBLE   → no validation needed (every value of the native type
                 already fits the desired type);
- INCOMPATIBLE → synthesize validation rules (REGEX / LENGTH /
                 DATE_FORMAT / digit- and precision-checks) that count
                 the values which would NOT convert;
- CONFLICTING  → a usage error (the conversion can never succeed).

The reference encodes this as a 6x6 matrix (schema.py:276-314) plus
constraint-tightening checks within a type (schema.py:131-263). Being
dialect-free (we control the regex engine), the Spark version emits
engine Rules directly instead of per-dialect SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Optional

from validatelite_spark.core.rules import Rule, RuleType
from validatelite_spark.core.types import DataType, TypeSpec, parse_type


class Compatibility(str, Enum):
    COMPATIBLE = "COMPATIBLE"
    INCOMPATIBLE = "INCOMPATIBLE"  # validation rules decide per value
    CONFLICTING = "CONFLICTING"    # never convertible → usage error


#: native (row) → desired (col) compatibility matrix
#: (reference: cli/commands/schema.py:276-314)
_MATRIX: dict[DataType, dict[DataType, Compatibility]] = {
    DataType.STRING: {
        DataType.STRING: Compatibility.COMPATIBLE,
        DataType.INTEGER: Compatibility.INCOMPATIBLE,
        DataType.FLOAT: Compatibility.INCOMPATIBLE,
        DataType.BOOLEAN: Compatibility.INCOMPATIBLE,
        DataType.DATE: Compatibility.INCOMPATIBLE,
        DataType.DATETIME: Compatibility.INCOMPATIBLE,
    },
    DataType.INTEGER: {
        DataType.STRING: Compatibility.COMPATIBLE,
        DataType.INTEGER: Compatibility.COMPATIBLE,
        DataType.FLOAT: Compatibility.COMPATIBLE,
        DataType.BOOLEAN: Compatibility.CONFLICTING,
        DataType.DATE: Compatibility.INCOMPATIBLE,   # 20240131-style
        DataType.DATETIME: Compatibility.INCOMPATIBLE,
    },
    DataType.FLOAT: {
        DataType.STRING: Compatibility.COMPATIBLE,
        DataType.INTEGER: Compatibility.INCOMPATIBLE,  # fractional part
        DataType.FLOAT: Compatibility.COMPATIBLE,
        DataType.BOOLEAN: Compatibility.CONFLICTING,
        DataType.DATE: Compatibility.CONFLICTING,
        DataType.DATETIME: Compatibility.CONFLICTING,
    },
    DataType.BOOLEAN: {
        DataType.STRING: Compatibility.COMPATIBLE,
        DataType.INTEGER: Compatibility.COMPATIBLE,
        DataType.FLOAT: Compatibility.COMPATIBLE,
        DataType.BOOLEAN: Compatibility.COMPATIBLE,
        DataType.DATE: Compatibility.CONFLICTING,
        DataType.DATETIME: Compatibility.CONFLICTING,
    },
    DataType.DATE: {
        DataType.STRING: Compatibility.COMPATIBLE,
        DataType.INTEGER: Compatibility.CONFLICTING,
        DataType.FLOAT: Compatibility.CONFLICTING,
        DataType.BOOLEAN: Compatibility.CONFLICTING,
        DataType.DATE: Compatibility.COMPATIBLE,
        DataType.DATETIME: Compatibility.COMPATIBLE,
    },
    DataType.DATETIME: {
        DataType.STRING: Compatibility.COMPATIBLE,
        DataType.INTEGER: Compatibility.CONFLICTING,
        DataType.FLOAT: Compatibility.CONFLICTING,
        DataType.BOOLEAN: Compatibility.CONFLICTING,
        DataType.DATE: Compatibility.INCOMPATIBLE,   # midnight-only check
        DataType.DATETIME: Compatibility.COMPATIBLE,
    },
}

#: value-shape regexes for string → numeric/bool conversion checks
#: (reference: database_dialect.py:383-405, 610-633, 873-896 — ours are
#: dialect-free Python re, evaluated by the vectorized UDF tier)
_INT_REGEX = r"^\s*[+-]?\d+\s*$"
_FLOAT_REGEX = r"^\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?\s*$"
_BOOL_REGEX = r"^\s*(true|false|0|1|yes|no)\s*$"


@dataclass
class DesiredTypeDecision:
    column: str
    native: DataType
    desired: TypeSpec
    compatibility: Compatibility
    generated_rules: list[Rule] = field(default_factory=list)
    error: Optional[str] = None


def _digits_rule(column: str, d: int) -> Rule:
    return Rule(RuleType.CUSTOM, column,
                {"fail_expr": f"NOT ({column} IS NULL OR "
                              f"(abs(cast({column} as bigint)) < "
                              f"{10 ** d}))"},
                name=f"digits_{column}")


def compile_desired_type(
    column: str,
    native_decl: str,
    desired_decl: str,
) -> DesiredTypeDecision:
    """Decide compatibility and synthesize the validation rules for one
    column (reference DesiredTypeRuleGenerator, schema.py:546-752)."""
    native_spec = parse_type(native_decl)
    desired = parse_type(desired_decl)
    native = native_spec.data_type
    compat = _MATRIX[native][desired.data_type]
    dec = DesiredTypeDecision(column, native, desired, compat)

    if compat == Compatibility.CONFLICTING:
        dec.error = (f"{column}: cannot convert {native.value} to "
                     f"{desired.data_type.value}")
        return dec
    rules: list[Rule] = []

    if compat == Compatibility.COMPATIBLE:
        # same-type constraint tightening (reference: schema.py:131-263)
        if desired.data_type == DataType.STRING and desired.max_length:
            rules.append(Rule(
                RuleType.LENGTH, column,
                {"max_length": desired.max_length},
                name=f"tighten_len_{column}"))
        elif desired.data_type == DataType.INTEGER and desired.max_digits \
                and native == DataType.INTEGER:
            rules.append(_digits_rule(column, desired.max_digits))
        dec.generated_rules = rules
        return dec

    # INCOMPATIBLE: value-level conversion checks
    d = desired.data_type
    if native == DataType.STRING:
        if d == DataType.INTEGER:
            rules.append(Rule(RuleType.REGEX, column,
                              {"pattern": _INT_REGEX},
                              name=f"as_int_{column}"))
            if desired.max_digits:
                rules.append(Rule(
                    RuleType.REGEX, column,
                    {"pattern": r"^\s*[+-]?\d{1,%d}\s*$" % desired.max_digits},
                    name=f"as_int_digits_{column}"))
        elif d == DataType.FLOAT:
            rules.append(Rule(RuleType.REGEX, column,
                              {"pattern": _FLOAT_REGEX},
                              name=f"as_float_{column}"))
        elif d == DataType.BOOLEAN:
            rules.append(Rule(RuleType.REGEX, column,
                              {"pattern": _BOOL_REGEX},
                              name=f"as_bool_{column}"))
        elif d in (DataType.DATE, DataType.DATETIME):
            fmt = desired.format or (
                "YYYY-MM-DD" if d == DataType.DATE else "YYYY-MM-DD HH:MI:SS")
            rules.append(Rule(RuleType.DATE_FORMAT, column,
                              {"format": fmt},
                              name=f"as_date_{column}"))
    elif native == DataType.INTEGER and d in (DataType.DATE,
                                              DataType.DATETIME):
        fmt = desired.format or "yyyymmdd"
        rules.append(Rule(RuleType.DATE_FORMAT, column, {"format": fmt},
                          name=f"as_date_{column}"))
    elif native == DataType.FLOAT and d == DataType.INTEGER:
        rules.append(Rule(
            RuleType.CUSTOM, column,
            {"fail_expr": f"{column} IS NOT NULL AND "
                          f"{column} != floor({column})"},
            name=f"integral_{column}"))
    elif native == DataType.DATETIME and d == DataType.DATE:
        rules.append(Rule(
            RuleType.CUSTOM, column,
            {"fail_expr": f"{column} IS NOT NULL AND "
                          f"{column} != date_trunc('DAY', {column})"},
            name=f"midnight_{column}"))
    dec.generated_rules = rules
    return dec
