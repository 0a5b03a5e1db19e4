"""Canonical type system + parameterized-type parser.

Mirrors the reference's closed 6-member canonical enum
(reference: shared/enums/data_types.py:12-22) and its "syntactic sugar"
parameterized types ``string(50)``, ``integer(10)``, ``float(12,2)``,
``date('YYYY-MM-DD')``, ``datetime('yyyymmdd')``
(reference: shared/utils/type_parser.py:46-167) — reimplemented from the
documented behavior, not copied.

Spark mapping: STRING->StringType, INTEGER->LongType, FLOAT->DoubleType,
BOOLEAN->BooleanType, DATE->DateType, DATETIME->TimestampType.
``max_length``/``max_digits``/``precision``/``scale``/``format`` stay
rule-level metadata (no Spark schema counterpart except Decimal).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Optional

from pyspark.sql import types as T


class DataType(str, Enum):
    STRING = "STRING"
    INTEGER = "INTEGER"
    FLOAT = "FLOAT"
    BOOLEAN = "BOOLEAN"
    DATE = "DATE"
    DATETIME = "DATETIME"


#: Spark physical type for each canonical type.
SPARK_TYPE: dict[DataType, T.DataType] = {
    DataType.STRING: T.StringType(),
    DataType.INTEGER: T.LongType(),
    DataType.FLOAT: T.DoubleType(),
    DataType.BOOLEAN: T.BooleanType(),
    DataType.DATE: T.DateType(),
    DataType.DATETIME: T.TimestampType(),
}

#: Vendor/native type-name → canonical, used when reconciling a declared
#: schema against df.schema (reference: core/executors/schema_executor.py:59-118).
_STRING_NAMES = {"string", "varchar", "char", "text", "nvarchar", "nchar", "clob"}
_INTEGER_NAMES = {
    "integer", "int", "bigint", "smallint", "tinyint", "long", "short", "byte",
}
_FLOAT_NAMES = {"float", "double", "decimal", "numeric", "real", "number"}
_BOOLEAN_NAMES = {"boolean", "bool", "bit"}
_DATE_NAMES = {"date"}
_DATETIME_NAMES = {"datetime", "timestamp", "timestamp_ntz", "timestamp_ltz"}


def canonical_of_native(native: str) -> Optional[DataType]:
    """Normalize a native/vendor type name (possibly ``TYPE(p[,s])``) to a
    canonical DataType. Returns None if unrecognized."""
    m = re.match(r"^\s*([a-zA-Z_ ]+?)\s*(?:\((\s*\d+\s*(?:,\s*\d+\s*)?)\))?\s*$",
                 native or "")
    if not m:
        return None
    base = m.group(1).strip().lower()
    if base in _STRING_NAMES:
        return DataType.STRING
    if base in _INTEGER_NAMES:
        return DataType.INTEGER
    if base in _FLOAT_NAMES:
        return DataType.FLOAT
    if base in _BOOLEAN_NAMES:
        return DataType.BOOLEAN
    if base in _DATE_NAMES:
        return DataType.DATE
    if base in _DATETIME_NAMES:
        return DataType.DATETIME
    return None


def canonical_of_spark(dt: T.DataType) -> Optional[DataType]:
    """Canonical type of a Spark DataType (for SCHEMA reconciliation)."""
    if isinstance(dt, T.StringType):
        return DataType.STRING
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return DataType.INTEGER
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return DataType.FLOAT
    if isinstance(dt, T.BooleanType):
        return DataType.BOOLEAN
    if isinstance(dt, T.DateType):
        return DataType.DATE
    if isinstance(dt, (T.TimestampType, getattr(T, "TimestampNTZType", T.TimestampType))):
        return DataType.DATETIME
    return None


@dataclass(frozen=True)
class TypeSpec:
    """A parsed parameterized type declaration."""

    data_type: DataType
    metadata: dict[str, Any] = field(default_factory=dict)

    @property
    def max_length(self) -> Optional[int]:
        return self.metadata.get("max_length")

    @property
    def max_digits(self) -> Optional[int]:
        return self.metadata.get("max_digits")

    @property
    def precision(self) -> Optional[int]:
        return self.metadata.get("precision")

    @property
    def scale(self) -> Optional[int]:
        return self.metadata.get("scale")

    @property
    def format(self) -> Optional[str]:
        return self.metadata.get("format")


_TYPE_RE = re.compile(
    r"""^\s*(?P<base>[a-zA-Z_]+)\s*
        (?:\(\s*(?P<args>[^)]*)\s*\))?\s*$""",
    re.VERBOSE,
)


class TypeParseError(ValueError):
    pass


def parse_type(decl: str) -> TypeSpec:
    """Parse ``string(50)`` / ``integer(10)`` / ``float(12,2)`` /
    ``date('YYYY-MM-DD')`` / ``datetime('yyyymmdd')`` / bare names.

    Same sugar surface as the reference's TypeParser
    (reference: shared/utils/type_parser.py:46-167).
    """
    if not decl or not isinstance(decl, str):
        raise TypeParseError(f"empty type declaration: {decl!r}")
    m = _TYPE_RE.match(decl)
    if not m:
        raise TypeParseError(f"unparseable type declaration: {decl!r}")
    base = m.group("base").lower()
    args_raw = m.group("args")
    args: list[str] = []
    if args_raw is not None and args_raw.strip() != "":
        args = [a.strip() for a in args_raw.split(",")]

    def _int_args(n: int) -> list[int]:
        if len(args) != n:
            raise TypeParseError(
                f"{base}() expects {n} integer argument(s), got {args!r}")
        try:
            return [int(a) for a in args]
        except ValueError as e:
            raise TypeParseError(f"non-integer argument in {decl!r}") from e

    if base in ("string", "str", "varchar", "char", "text"):
        if not args:
            return TypeSpec(DataType.STRING)
        (n,) = _int_args(1)
        if n <= 0:
            raise TypeParseError(f"string length must be positive: {decl!r}")
        return TypeSpec(DataType.STRING, {"max_length": n})
    if base in ("integer", "int", "bigint"):
        if not args:
            return TypeSpec(DataType.INTEGER)
        (d,) = _int_args(1)
        if d <= 0:
            raise TypeParseError(f"integer digits must be positive: {decl!r}")
        return TypeSpec(DataType.INTEGER, {"max_digits": d})
    if base in ("float", "double", "decimal", "numeric"):
        if not args:
            return TypeSpec(DataType.FLOAT)
        p, s = _int_args(2)
        if p <= 0 or s < 0 or s > p:
            raise TypeParseError(f"invalid precision/scale: {decl!r}")
        return TypeSpec(DataType.FLOAT, {"precision": p, "scale": s})
    if base in ("boolean", "bool"):
        if args:
            raise TypeParseError(f"boolean takes no arguments: {decl!r}")
        return TypeSpec(DataType.BOOLEAN)
    if base in ("date", "datetime", "timestamp"):
        dt = DataType.DATE if base == "date" else DataType.DATETIME
        if not args:
            return TypeSpec(dt)
        if len(args) != 1:
            raise TypeParseError(f"{base}() expects one format argument: {decl!r}")
        fmt = args[0].strip("'\"")
        if not fmt:
            raise TypeParseError(f"empty format in {decl!r}")
        return TypeSpec(dt, {"format": fmt})
    raise TypeParseError(f"unknown type name {base!r} in {decl!r}")


#: Date-format token translation, identical token table to the reference
#: (reference: shared/database/sqlite_functions.py:216-234).
_FORMAT_TOKENS = {
    "YYYY": "%Y", "yyyy": "%Y",
    "MM": "%m", "mm": "%m",
    "DD": "%d", "dd": "%d",
    "HH": "%H", "hh": "%H",
    "MI": "%M", "mi": "%M",
    "SS": "%S", "ss": "%S",
}


def format_to_strptime(pattern: str) -> str:
    """Translate ``YYYY-MM-DD``-style patterns to strptime format.

    Longest-token-first replacement, same as the reference
    (reference: shared/database/sqlite_functions.py:236-241).
    """
    out = pattern
    for tok in sorted(_FORMAT_TOKENS, key=len, reverse=True):
        out = out.replace(tok, _FORMAT_TOKENS[tok])
    return out
