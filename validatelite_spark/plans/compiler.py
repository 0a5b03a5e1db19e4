"""Rule compiler: Rule (logical) → Spark failure predicate (physical).

The analogue of the reference's executor dispatch
(reference: core/executors/__init__.py:19-79) — but instead of generating
dialect SQL strings, each rule type compiles to a Spark ``Column`` failure
predicate in one of four tiers:

- NATIVE   — pure built-in ``pyspark.sql.functions`` (whole-stage codegen)
- UDF      — vectorized pandas/Arrow UDF (Python-exact semantics: ``re``
             regex parity, strptime round-trip, perplexity)
- GROUPBY  — needs its own aggregation shape (UNIQUE)
- METADATA — no data scan at all (SCHEMA, reference
             schema_executor.py:120-134 ``execution_type="metadata"``)

NATIVE and UDF predicates both fuse into ONE ``df.agg()`` scan downstream
(plans/merger.py). NULL semantics per rule type are the reference's
(see core/rules.py table and SURVEY.md §2.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from validatelite_spark.core import builtin_rule_types  # noqa: F401 (registers)
from validatelite_spark.core.registry import get_rule_type
from validatelite_spark.core.results import RuleExecutionError
from validatelite_spark.core.rules import Rule, RuleType
from validatelite_spark.functions import udf_tier


class Tier(str, Enum):
    NATIVE = "NATIVE"
    UDF = "UDF"
    GROUPBY = "GROUPBY"
    METADATA = "METADATA"


@dataclass
class CompiledRule:
    rule: Rule
    tier: Tier
    fail_predicate: Optional[Column] = None  # NATIVE / UDF tiers only

    @property
    def mergeable(self) -> bool:
        """Can fuse into the shared single-scan agg (reference analogue:
        rule_merger.py:813-914 MERGED strategy; UNIQUE/SCHEMA are always
        INDIVIDUAL there too)."""
        return self.tier in (Tier.NATIVE, Tier.UDF)


def compile_rule(rule: Rule, use_native_regex: bool = False) -> CompiledRule:
    """Compile one rule. Raises RuleExecutionError for unsupported shapes
    (per-rule isolation: the engine turns it into an ERROR result).

    Runtime-registered rule types (core/registry.py) dispatch FIRST —
    the quality-filter builtins (LANG_ID/GOPHER/PERPLEXITY/PII_SCRUB)
    live there (core/builtin_rule_types.py), and a user registration
    with replace=True can override any type's compilation without
    touching this file."""
    t, p = rule.type, rule.parameters
    col = F.col(rule.column) if rule.column else None

    spec = get_rule_type(t)
    if spec is not None:
        try:
            pred = spec.compile_fn(rule) if spec.compile_fn else None
        except RuleExecutionError:
            raise
        except Exception as e:
            raise RuleExecutionError(
                f"registered rule type {spec.name} failed to compile "
                f"{rule.name}: {e}") from e
        return CompiledRule(rule, Tier(spec.tier), pred)

    if t == RuleType.NOT_NULL:
        return CompiledRule(rule, Tier.NATIVE, col.isNull())

    if t == RuleType.LENGTH:
        # individual-path semantics are canonical: NULL counts as failure
        # (reference: completeness_executor.py:266-269; the merged path's
        # omission of the NULL clause is a reference inconsistency —
        # SURVEY.md §7 "What's hard").
        ln = F.length(col.cast("string"))
        pred = col.isNull()
        if p.get("min_length") is not None:
            pred = pred | (ln < int(p["min_length"]))
        if p.get("max_length") is not None:
            pred = pred | (ln > int(p["max_length"]))
        return CompiledRule(rule, Tier.NATIVE, pred)

    if t == RuleType.RANGE:
        # NULL is a failure (reference: validity_executor.py:398-471)
        pred = col.isNull()
        if p.get("min") is not None:
            pred = pred | (col < F.lit(p["min"]))
        if p.get("max") is not None:
            pred = pred | (col > F.lit(p["max"]))
        return CompiledRule(rule, Tier.NATIVE, pred)

    if t == RuleType.ENUM:
        vals = list(p["allowed_values"])
        if p.get("extract_domain"):
            # email-domain variant (reference: validity_executor.py:473-517)
            dom = F.substring_index(col, "@", -1)
            pred = col.isNotNull() & col.like("%@%") & ~dom.isin(vals)
        else:
            # SQL NOT IN: NULL does not fail — replicate explicitly
            pred = col.isNotNull() & ~col.isin(vals)
        return CompiledRule(rule, Tier.NATIVE, pred)

    if t == RuleType.REGEX:
        pattern = p["pattern"]
        if use_native_regex or p.get("engine") == "java":
            return CompiledRule(
                rule, Tier.NATIVE, udf_tier.regex_fail_native(col, pattern))
        return CompiledRule(rule, Tier.UDF, udf_tier.regex_fail(col, pattern))

    if t == RuleType.DATE_FORMAT:
        return CompiledRule(
            rule, Tier.UDF, udf_tier.date_format_fail(col, p["format"]))

    # LANG_ID / GOPHER / PERPLEXITY / PII_SCRUB compile via the registry
    # dispatch above (core/builtin_rule_types.py) — no branches here.

    if t == RuleType.UNIQUE:
        return CompiledRule(rule, Tier.GROUPBY)

    if t == RuleType.SCHEMA:
        return CompiledRule(rule, Tier.METADATA)

    if t == RuleType.CUSTOM:
        expr = p.get("fail_expr")
        if not expr:
            raise RuleExecutionError(
                f"CUSTOM rule {rule.name} needs parameters.fail_expr")
        return CompiledRule(rule, Tier.NATIVE, F.expr(expr))

    raise RuleExecutionError(f"unsupported rule type: {t}")
