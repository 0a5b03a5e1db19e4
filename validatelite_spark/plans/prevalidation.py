"""Prevalidation — prune invalid rules before any scan runs.

The analogue of the reference's batch existence checks
(reference: core/engine/rule_engine.py:609-735,
core/engine/prevalidation.py:73-173): here it's a pure driver-side pass
over ``df.schema`` (and therefore free — no Spark job), exactly matching
optimization O3 in SURVEY.md §4.

SCHEMA rules are exempt, so they can themselves report missing columns
(reference behavior: rule_engine.py:646-650).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame

from validatelite_spark.core.rules import Rule, RuleType


def prevalidate(df: DataFrame, rules: list[Rule]) -> dict[str, Optional[str]]:
    """Returns {rule_id: error_message_or_None}."""
    cols = set(df.columns)
    cols_lower = {c.lower() for c in df.columns}
    out: dict[str, Optional[str]] = {}
    for rule in rules:
        if rule.type == RuleType.SCHEMA or rule.column is None:
            out[rule.id] = None
            continue
        if rule.column in cols:
            out[rule.id] = None
        elif rule.column.lower() in cols_lower:
            out[rule.id] = (
                f"column '{rule.column}' exists only with different case"
            )
        else:
            out[rule.id] = f"column '{rule.column}' does not exist"
    return out
