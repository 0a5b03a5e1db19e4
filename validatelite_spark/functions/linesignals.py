"""Line-level document quality signals (C4 / FineWeb family).

Gopher's signals (functions/textquality.py) are token-level; the other
half of the public web-filter canon is LINE-level: C4 keeps lines that
end in terminal punctuation (Raffel et al. 2020 §2.2), and FineWeb
(Penedo et al. 2024) drops documents where too many lines are short,
start with a bullet, or too few end in punctuation. These are
doc-level fractions over the document's lines.

Every signal is a pure native Column built on ``regexp_count`` with an
inline ``(?m)`` multiline flag — ONE pass per pattern inside
whole-stage codegen, no ``split``+higher-order-function fallback
(CLAUDE.md rule 3), and each pattern is chosen to never produce an
EMPTY match (RE2/DuckDB and Java count empty matches differently —
``^.{0,29}$`` diverges on blank lines, so the short-line signal counts
LONG lines and subtracts). All patterns verified
match-count-identical across Java regex, RE2 (DuckDB), and Python
``re``.

The composite gate registers as the ``LINE_QUALITY`` rule type
(core/builtin_rule_types.py), same first-class path as GOPHER.
Reference: the rule-metric aggregation contract in
core/executors/base_executor.py; the reference has no line-level
signal surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: FineWeb-inspired doc-level defaults (public: Penedo et al. 2024,
#: "The FineWeb Datasets", quality-filter appendix; thresholds
#: simplified to the doc-level form).
LINE_DEFAULTS = {
    "min_punct_line_frac": 0.12,   # lines ending in terminal punct
    "max_short_line_frac": 0.67,   # lines shorter than short_line_chars
    "short_line_chars": 30,
    "max_bullet_line_frac": 0.90,  # lines starting with a bullet
    "max_caps_line_frac": 0.50,    # shouty all-caps lines
}


def line_count(col: Column) -> Column:
    """Number of newline-delimited lines (blank lines count; empty
    string is one line)."""
    return F.regexp_count(col, F.lit("\n")) + 1


def punct_line_count(col: Column) -> Column:
    """Lines ending in terminal punctuation (C4's keep criterion),
    allowing trailing horizontal whitespace."""
    return F.regexp_count(col, F.lit("(?m)[.!?\"'][ \t]*$"))


def long_line_count(col: Column, min_chars: int = 30) -> Column:
    """Lines with at least ``min_chars`` characters (never an empty
    regex match — the engine-portable building block for the
    short-line fraction)."""
    return F.regexp_count(col, F.lit("(?m)^.{%d,}" % min_chars))


def bullet_line_count(col: Column) -> Column:
    """Lines starting with a bullet marker (-, *, •)."""
    return F.regexp_count(col, F.lit("(?m)^[ \t]*[-*•]"))


def caps_line_count(col: Column) -> Column:
    """All-caps lines: start with an uppercase letter and contain no
    lowercase at all (lookaround-free — RE2 has none)."""
    return F.regexp_count(col, F.lit("(?m)^[A-Z][^a-z\n]*$"))


def _frac(n: Column, d: Column) -> Column:
    return n.cast("double") / d.cast("double")


def punct_line_fraction(col: Column) -> Column:
    return _frac(punct_line_count(col), line_count(col))


def short_line_fraction(col: Column, max_chars: int = 30) -> Column:
    """Fraction of lines SHORTER than ``max_chars`` = 1 - long/total."""
    n = line_count(col)
    return _frac(n - long_line_count(col, max_chars), n)


def bullet_line_fraction(col: Column) -> Column:
    return _frac(bullet_line_count(col), line_count(col))


def caps_line_fraction(col: Column) -> Column:
    return _frac(caps_line_count(col), line_count(col))


def line_quality_fail(col: Column, params: dict | None = None) -> Column:
    """Composite FineWeb-style line-quality failure predicate: NULL
    text fails (completeness semantics, like GOPHER); otherwise fails
    when any line-level fraction crosses its threshold."""
    p = dict(LINE_DEFAULTS)
    if params:
        p.update({k: v for k, v in params.items() if v is not None})
    viol = (
        (punct_line_fraction(col) < p["min_punct_line_frac"])
        | (short_line_fraction(col, int(p["short_line_chars"]))
           > p["max_short_line_frac"])
        | (bullet_line_fraction(col) > p["max_bullet_line_frac"])
        | (caps_line_fraction(col) > p["max_caps_line_frac"])
    )
    return F.when(col.isNull(), F.lit(True)).otherwise(viol)
