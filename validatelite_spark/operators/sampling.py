"""Deterministic sampling / budgeting operators for training-data mixes.

- **hash_sample**: keep a row iff the first 8 hex digits of
  ``md5(key || ':' || seed)``, mod 1e6, fall under ``fraction * 1e6``.
  Unlike ``df.sample`` (RNG per partition → different rows per run and
  per partitioning), the decision is a pure function of the key, so the
  sample is reproducible across runs, partitionings, and cluster sizes
  — and md5 is identical in every engine, so the oracle can verify the
  EXACT row set (xxhash64 would be Spark-only). Per-stratum rates
  compose by applying different fractions per group.
- **token_budget_filter**: the data-mixing primitive — within each
  group (lang, source, ...), take documents in a deterministic order
  until a token budget is reached. One window cumsum per group; a doc
  is kept while the PRE-doc running total is under budget, so the first
  over-budget doc still lands (standard inclusive cut: the mix reaches
  its budget instead of undershooting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: denominator for hash-fraction arithmetic: fractions are exact
#: multiples of 1/1_000_000 (plenty for mix ratios)
_DENOM = 1_000_000


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``key_col``.

    Exact semantics (SQL-expressible in any engine): keep iff
    ``conv(substr(md5(key || ':' || seed), 1, 8), 16, 10) % 1e6 <
    round(fraction * 1e6)``. Distinct keys are kept or dropped
    atomically — sampling is stable under duplication, joins, and
    reordering."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(round(fraction * _DENOM))
    bucket = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col(key_col).cast("string"), F.lit(str(seed)))), 1, 8),
        16, 10).cast("long") % _DENOM
    return df.filter(bucket < F.lit(threshold))


def token_budget_filter(
    df: DataFrame,
    budget: int,
    token_col: str,
    by: str,
    order_col: str = None,
    key_col: str = None,
) -> DataFrame:
    """Keep documents per ``by`` group until ``budget`` tokens.

    Documents are taken in ascending ``order_col`` (ties broken by
    ``key_col`` for determinism); a doc is kept while the running token
    total BEFORE it is under the budget, so each group ends at or just
    past its budget (never empty when any doc exists). One shuffle on
    the group key; the window cumsum is linear per group."""
    order_col = order_col or token_col
    ordering = [F.col(order_col)]
    if key_col:
        ordering.append(F.col(key_col))
    w = (Window.partitionBy(by).orderBy(*ordering)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    running = F.sum(token_col).over(w)
    pre = running - F.col(token_col)  # total before this doc
    return (df.withColumn("__pre", pre)
            .filter(F.col("__pre") < budget)
            .drop("__pre"))
