"""Corpus-wide line-level deduplication (the C4 recipe).

C4 (Raffel et al. 2020, §2.2) removes every occurrence-but-one of each
three-sentence span across the WHOLE corpus; modern web pipelines apply
the same rule at line granularity ("remove duplicated lines, keep the
first occurrence"). The reference engine has no analogue (its closest
surface is UNIQUE's duplicate counting, core/executors/uniqueness —
reference: core/executors/uniqueness_executor.py) — this is a
training-data operator.

Scale shape (100 TB): one posexplode (doc → lines), a winner-per-line
``groupBy(line).agg(min(struct(k, pos)))`` — the PARTIAL aggregate runs
map-side, so a cookie-banner line occurring in 10^9 docs collapses to
one row per map task BEFORE the shuffle — a join back on the line to
keep only each line's winning occurrence, and one groupBy(doc) to
reassemble kept lines in order. The join's residual hot-key partition
(every occurrence of the boilerplate line lands in one reducer) is
AQE-splittable (skewed-join handling can replicate the 1-row-per-key
build side across splits); a ``Window.partitionBy(line)`` — the shape
this replaced — is a single unsplittable task per hot line and was the
round-3 verdict's top scale-killer. Line order inside a doc is restored
via ``array_sort`` over (pos, line) structs — no window anywhere.
Deterministic: the kept occurrence is the (min doc key, min position)
one at any partitioning/cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    split_pattern: str = "\n",
    join_sep: str = "\n",
    min_line_chars: int = 0,
) -> DataFrame:
    """Remove duplicate lines corpus-wide, keeping the FIRST occurrence
    (min ``key_col``, then min position within the doc).

    Output: one row per input doc — ``(key_col, <text_col>_dedup)`` with
    surviving lines rejoined by ``join_sep`` in original order. A doc
    whose every line occurs earlier elsewhere keeps an empty string;
    NULL text stays NULL. ``min_line_chars``: lines shorter than this
    are passed through untouched (never deduped — the C4 guard against
    nuking short common lines like list bullets); 0 dedups everything.

    ``split_pattern`` is a Java regex (default: newline). With a pattern
    that never matches, each doc is a single line and this degrades to
    corpus-wide exact text dedup that BLANKS later duplicates instead of
    dropping the rows — the driver query uses exactly that degenerate
    form so the whole first-occurrence machinery is DuckDB-verifiable
    on the single-line documents corpus."""
    nn = df.filter(F.col(text_col).isNotNull())
    lines = nn.select(
        F.col(key_col).alias("k"),
        F.posexplode(F.split(F.col(text_col), split_pattern))
        .alias("pos", "line"))
    dedupable = F.length("line") >= min_line_chars
    # Winner per line = min (k, pos) struct. One row per distinct line
    # after a map-side partial aggregate — the hot-boilerplate key never
    # reaches a reducer at full multiplicity.
    winners = (lines.filter(dedupable)
               .groupBy("line")
               .agg(F.min(F.struct("k", "pos")).alias("__w")))
    kept = (lines
            .join(winners, "line", "left")
            .filter(~dedupable
                    | F.struct("k", "pos").eqNullSafe(F.col("__w")))
            .drop("__w"))
    rebuilt = (
        kept.groupBy("k")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "line")))
             .alias("parts"))
        .select(
            "k",
            # parts.line = GetArrayStructFields: native elementwise
            # field extraction, order-preserving — NOT F.transform,
            # which is CodegenFallback in this corpus-wide projection
            # (CLAUDE.md rule 3)
            F.concat_ws(join_sep, F.col("parts.line"))
            .alias("__dedup")))
    out_col = f"{text_col}_dedup"
    return (df.select(key_col,
                      F.col(text_col).isNull().alias("__was_null"))
            .join(rebuilt.withColumnRenamed("k", key_col), key_col, "left")
            .select(
                key_col,
                # NULL in → NULL out; every-line-deduped → empty string
                F.when(F.col("__was_null"), F.lit(None).cast("string"))
                .otherwise(F.coalesce(F.col("__dedup"), F.lit("")))
                .alias(out_col)))
