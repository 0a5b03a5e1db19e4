"""Inline rule-expression parser + JSON rules-file loader.

Grammar mirrors the reference CLI's inline syntax
(reference: cli/core/rule_parser.py:62-515): ``TYPE(args...)`` with a
``(\\w+)\\((.*)\\)`` outer match, comma-split args (regex patterns are the
final arg and may contain commas/parens — everything after the first comma
is the pattern), ENUM numeric coercion, and JSON files holding a list of
rule dicts.

Examples
--------
    not_null(id)
    unique(email)
    length(name,2,50)          length(name,50)  -> max only
    range(age,0,120)
    enum(status,active,inactive,pending)
    regex(email,^[a-z]+@[a-z]+\\.com$)
    date_format(order_date,YYYY-MM-DD)
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Union

from validatelite_spark.core.rules import Rule, RuleType, RuleValidationError

_OUTER = re.compile(r"^\s*(\w+)\s*\((.*)\)\s*$", re.DOTALL)


class RuleParseError(ValueError):
    pass


def _coerce_number(v: str) -> Any:
    """ENUM value coercion: int if integral, float if numeric, else str
    (reference: cli/core/rule_parser.py ENUM handling)."""
    s = v.strip()
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        pass
    return s


def _coerce_bound(v: str) -> Any:
    s = v.strip()
    n = _coerce_number(s)
    if isinstance(n, str):
        raise RuleParseError(f"numeric bound expected, got {s!r}")
    return n


def parse_rule(expr: str) -> Rule:
    """Parse one inline rule expression into a Rule."""
    m = _OUTER.match(expr)
    if not m:
        raise RuleParseError(f"unparseable rule expression: {expr!r}")
    head, body = m.group(1).lower(), m.group(2)

    if head in ("not_null", "notnull"):
        col = body.strip()
        if not col:
            raise RuleParseError(f"not_null needs a column: {expr!r}")
        return Rule(RuleType.NOT_NULL, col)
    if head == "unique":
        col = body.strip()
        if not col:
            raise RuleParseError(f"unique needs a column: {expr!r}")
        return Rule(RuleType.UNIQUE, col)
    if head == "length":
        parts = [p.strip() for p in body.split(",")]
        if len(parts) == 2:
            return Rule(RuleType.LENGTH, parts[0],
                        {"max_length": int(_coerce_bound(parts[1]))})
        if len(parts) == 3:
            return Rule(RuleType.LENGTH, parts[0],
                        {"min_length": int(_coerce_bound(parts[1])),
                         "max_length": int(_coerce_bound(parts[2]))})
        raise RuleParseError(f"length(col,[min,]max) expected: {expr!r}")
    if head == "range":
        parts = [p.strip() for p in body.split(",")]
        if len(parts) == 3:
            return Rule(RuleType.RANGE, parts[0],
                        {"min": _coerce_bound(parts[1]),
                         "max": _coerce_bound(parts[2])})
        if len(parts) == 2:
            return Rule(RuleType.RANGE, parts[0], {"min": _coerce_bound(parts[1])})
        raise RuleParseError(f"range(col,min[,max]) expected: {expr!r}")
    if head == "enum":
        parts = [p.strip() for p in body.split(",")]
        if len(parts) < 2:
            raise RuleParseError(f"enum(col,v1[,v2...]) expected: {expr!r}")
        return Rule(RuleType.ENUM, parts[0],
                    {"allowed_values": [_coerce_number(v) for v in parts[1:]]})
    if head == "regex":
        idx = body.find(",")
        if idx < 0:
            raise RuleParseError(f"regex(col,pattern) expected: {expr!r}")
        col, pattern = body[:idx].strip(), body[idx + 1:].strip()
        if not pattern:
            raise RuleParseError(f"empty regex pattern: {expr!r}")
        return Rule(RuleType.REGEX, col, {"pattern": pattern})
    if head == "date_format":
        idx = body.find(",")
        if idx < 0:
            raise RuleParseError(f"date_format(col,format) expected: {expr!r}")
        col, fmt = body[:idx].strip(), body[idx + 1:].strip().strip("'\"")
        return Rule(RuleType.DATE_FORMAT, col, {"format": fmt})

    # runtime-REGISTERED rule types (core/registry.py) parse generically:
    # TYPE(col[, key=value ...]); '|'-separated values become lists
    from validatelite_spark.core.registry import get_rule_type
    if get_rule_type(head) is not None:
        parts = [p.strip() for p in body.split(",")] if body.strip() else []
        col = parts[0] if parts else None
        params: dict[str, Any] = {}
        for kv in parts[1:]:
            if "=" not in kv:
                raise RuleParseError(
                    f"registered-type params must be key=value: {kv!r}")
            k, v = kv.split("=", 1)
            v = v.strip()
            params[k.strip()] = ([_coerce_number(x) for x in v.split("|")]
                                 if "|" in v else _coerce_number(v))
        try:
            return Rule(head.upper(), col, params)
        except RuleValidationError as e:
            raise RuleParseError(f"bad {head} rule {expr!r}: {e}") from e
    raise RuleParseError(f"unknown rule type {head!r} in {expr!r}")


def parse_rules(exprs: list[str]) -> list[Rule]:
    return [parse_rule(e) for e in exprs]


def load_rules_file(path: Union[str, Path]) -> list[Rule]:
    """Load a JSON rules file: either ``{"rules": [...]}`` or a bare list.
    Each item is a Rule.to_dict() shape or an inline expression string."""
    payload = json.loads(Path(path).read_text())
    items = payload["rules"] if isinstance(payload, dict) else payload
    rules: list[Rule] = []
    for item in items:
        if isinstance(item, str):
            rules.append(parse_rule(item))
        elif isinstance(item, dict):
            try:
                rules.append(Rule.from_dict(item))
            except (KeyError, ValueError, RuleValidationError) as e:
                raise RuleParseError(f"bad rule dict {item!r}: {e}") from e
        else:
            raise RuleParseError(f"bad rules file item: {item!r}")
    return rules
