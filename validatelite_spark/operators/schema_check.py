"""SCHEMA rule operator — metadata-only reconciliation.

Reference semantics (core/executors/schema_executor.py:120-455): compare a
declared ``{column: type}`` map against the actual table schema — column
existence, canonical-type match, strict-mode extras — scanning ZERO data
rows (``execution_plan.execution_type="metadata"``,
schema_executor.py:120-134).

Spark realization: ``df.schema`` is catalog/driver-side only, so this is
pure Python. failed = number of declared columns with an existence or
type failure (+ extra columns when strict), total = declared columns
(+ extras when strict), identical accounting to the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame

from validatelite_spark.core.types import (
    DataType,
    canonical_of_native,
    canonical_of_spark,
    parse_type,
)


@dataclass
class FieldCheck:
    column: str
    status: str  # PASSED | FIELD_MISSING | TYPE_MISMATCH | EXTRA_FIELD
    declared_type: Optional[str] = None
    native_type: Optional[str] = None
    canonical_declared: Optional[str] = None
    canonical_native: Optional[str] = None


@dataclass
class SchemaCheckResult:
    field_checks: list[FieldCheck] = field(default_factory=list)
    total: int = 0
    failed: int = 0

    @property
    def passed(self) -> bool:
        return self.failed == 0


def check_schema(
    df: DataFrame,
    columns: dict[str, str],
    strict_mode: bool = False,
    case_insensitive: bool = False,
) -> SchemaCheckResult:
    actual: dict[str, str] = {f.name: f.dataType.simpleString()
                              for f in df.schema.fields}
    lookup = {k.lower(): k for k in actual} if case_insensitive else None

    res = SchemaCheckResult()
    declared_seen: set[str] = set()
    for name, decl in columns.items():
        key = name
        if key not in actual and case_insensitive and name.lower() in lookup:
            key = lookup[name.lower()]
        if key not in actual:
            res.field_checks.append(
                FieldCheck(name, "FIELD_MISSING", declared_type=decl))
            res.failed += 1
            res.total += 1
            continue
        declared_seen.add(key)
        native = actual[key]
        try:
            want: Optional[DataType] = parse_type(decl).data_type
        except ValueError:
            want = canonical_of_native(decl)
        spark_field = next(f for f in df.schema.fields if f.name == key)
        got = canonical_of_spark(spark_field.dataType)
        if want is not None and got == want:
            res.field_checks.append(FieldCheck(
                name, "PASSED", decl, native,
                want.value, got.value if got else None))
        else:
            res.field_checks.append(FieldCheck(
                name, "TYPE_MISMATCH", decl, native,
                want.value if want else None, got.value if got else None))
            res.failed += 1
        res.total += 1

    if strict_mode:
        # extras fail in strict mode (reference: schema_executor.py:410-417)
        for name in actual:
            if name not in declared_seen and (
                not case_insensitive
                or name.lower() not in {c.lower() for c in columns}
            ):
                res.field_checks.append(
                    FieldCheck(name, "EXTRA_FIELD", native_type=actual[name]))
                res.failed += 1
                res.total += 1
    return res
