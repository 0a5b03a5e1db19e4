"""One-scan table profiling: per-column stats in a single fused pass.

The reference profiles data column-by-column through its rule metrics
(reference: core/executors/base_executor.py aggregate counts; the CLI's
check command prints per-rule totals) — a standing pre-validation
question is "what does this table even look like". ``profile_table``
answers it the way the O1 rule merger fuses rule counts
(plans/merger.py): ONE aggregate scan computes every column's row
count, null count, distinct count, min/max, and numeric mean, then the
single wide row pivots to one row per column with an inline
explode(array(struct...)) — no second scan, no per-column jobs.

Scale shape: multiple exact ``count(DISTINCT col)`` in one aggregate
compile to Spark's Expand operator — the input is replicated once per
distinct-aggregate (N_cols × data through one shuffle). That is the
ORACLE ANCHOR shape (exactly replayable in SQL); at 100 TB pass
``approx=True`` and every distinct count becomes a HyperLogLog
``approx_count_distinct`` in a plain single-pass partial aggregate —
no Expand, no replication (same exact/approx split as
``operators/uniqueness.py`` and ``quantile_filter``).

Min/max are reported in type-split columns (``min_num``/``max_num``
for numerics, ``min_str``/``max_str`` for strings) so the output
schema is stable regardless of the profiled column mix; string
ordering is binary/UTF8 in both Spark and DuckDB, so the oracle can
verify string extrema too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double",
            "decimal")


def profile_table(
    df: DataFrame,
    columns=None,
    approx: bool = False,
    round_to: int = 6,
) -> DataFrame:
    """(column, n_rows, nulls, n_distinct, min_num, max_num, min_str,
    max_str, avg) — one row per profiled column, one scan total.
    Unsupported types (arrays, structs, binary) get counts only."""
    cols = list(columns) if columns is not None else list(df.columns)
    types = dict(df.dtypes)
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(f"no such column(s): {missing}")
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        dt = types[c]
        base = dt.split("(")[0]
        aggs.append(F.count(c).alias(f"{c}__nn"))
        aggs.append((F.approx_count_distinct(c) if approx
                     else F.count_distinct(F.col(c)))
                    .alias(f"{c}__nd"))
        if base in _NUMERIC:
            aggs.append(F.min(F.col(c).cast("double"))
                        .alias(f"{c}__mn"))
            aggs.append(F.max(F.col(c).cast("double"))
                        .alias(f"{c}__mx"))
            aggs.append(F.round(F.avg(F.col(c)) + 1e-9, round_to)
                        .alias(f"{c}__avg"))
        elif base == "string":
            aggs.append(F.min(c).alias(f"{c}__mns"))
            aggs.append(F.max(c).alias(f"{c}__mxs"))
    wide = df.agg(*aggs)
    structs = []
    for c in cols:
        base = types[c].split("(")[0]
        num = base in _NUMERIC
        s = base == "string"
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col("__total").alias("n_rows"),
            (F.col("__total") - F.col(f"{c}__nn")).alias("nulls"),
            F.col(f"{c}__nd").alias("n_distinct"),
            (F.col(f"{c}__mn") if num
             else F.lit(None).cast("double")).alias("min_num"),
            (F.col(f"{c}__mx") if num
             else F.lit(None).cast("double")).alias("max_num"),
            (F.col(f"{c}__mns") if s
             else F.lit(None).cast("string")).alias("min_str"),
            (F.col(f"{c}__mxs") if s
             else F.lit(None).cast("string")).alias("max_str"),
            (F.col(f"{c}__avg") if num
             else F.lit(None).cast("double")).alias("avg"),
        ))
    return (wide.select(F.explode(F.array(*structs)).alias("p"))
            .select("p.*"))
