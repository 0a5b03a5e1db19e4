"""Runtime rule-type registry — the engine's extension seam.

Mirrors the reference's registry-of-rule-types
(reference: core/registry/rule_type_registry.py, builtin_rule_types.py:23-120),
which SURVEY.md §2.7 calls "the pattern to keep": a user registers a new
rule type at runtime — a name, a parameter schema, and a compile
function — and the whole engine picks it up with no compiler changes:

- ``Rule`` accepts the registered name as its ``type`` and validates
  parameters against the registered schema;
- ``plans/compiler.compile_rule`` dispatches to the registered compile
  function (checked FIRST, so ``replace=True`` can override a builtin);
- NATIVE/UDF-tier registered rules fuse into the shared single-scan
  aggregate exactly like builtins (plans/merger.py is tier-driven).

The quality-filter rule types (LANG_ID / GOPHER / PERPLEXITY /
PII_SCRUB) are themselves registered through this seam — see
core/builtin_rule_types.py — proving the extension point is the real
dispatch path, not a parallel one.

The registry stores a *compile function returning a Spark failure
predicate Column*, not a SQL-string generator: the Spark-native analogue
of the reference's per-dialect SQL builders.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional


class RuleTypeRegistrationError(ValueError):
    pass


#: compile function: Rule -> Column failure predicate (None only for
#: tiers that have no row predicate, i.e. GROUPBY/METADATA shapes).
CompileFn = Callable[[Any], Any]


@dataclass(frozen=True)
class RuleTypeSpec:
    name: str
    compile_fn: Optional[CompileFn]
    tier: str = "NATIVE"  # NATIVE | UDF | GROUPBY | METADATA
    #: {"required": [names...], "validator": callable(params) -> None}
    param_schema: dict[str, Any] = field(default_factory=dict)
    needs_column: bool = True
    description: str = ""


_REGISTRY: dict[str, RuleTypeSpec] = {}


def register_rule_type(
    name: str,
    compile_fn: Optional[CompileFn],
    tier: str = "NATIVE",
    param_schema: Optional[dict[str, Any]] = None,
    needs_column: bool = True,
    description: str = "",
    replace: bool = False,
) -> RuleTypeSpec:
    """Register (or with ``replace=True`` override) a rule type."""
    key = str(name).upper()
    if not key.isidentifier():
        raise RuleTypeRegistrationError(
            f"rule type name must be an identifier: {name!r}")
    if key in _REGISTRY and not replace:
        raise RuleTypeRegistrationError(
            f"rule type {key} already registered (pass replace=True)")
    if tier not in ("NATIVE", "UDF", "GROUPBY", "METADATA"):
        raise RuleTypeRegistrationError(f"unknown tier {tier!r}")
    spec = RuleTypeSpec(key, compile_fn, tier, dict(param_schema or {}),
                        needs_column, description)
    _REGISTRY[key] = spec
    return spec


def unregister_rule_type(name: str) -> None:
    _REGISTRY.pop(str(name).upper(), None)


def get_rule_type(name: Any) -> Optional[RuleTypeSpec]:
    """Spec for an enum member or string name; None when unregistered."""
    key = getattr(name, "value", name)
    return _REGISTRY.get(str(key).upper())


def registered_rule_types() -> list[str]:
    return sorted(_REGISTRY)


def validate_params(spec: RuleTypeSpec, params: dict[str, Any]) -> None:
    """Check params against the spec's schema; raises ValueError (the
    Rule model wraps it into RuleValidationError)."""
    schema = spec.param_schema
    for req in schema.get("required", ()):
        if params.get(req) is None:
            raise ValueError(
                f"{spec.name} rule requires parameter {req!r}")
    validator = schema.get("validator")
    if validator is not None:
        validator(params)
