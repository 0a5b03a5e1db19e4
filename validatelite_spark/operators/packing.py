"""Sequence packing: place documents into fixed-length training
context windows (concat-and-chunk, the GPT/Llama pretraining shape).

Documents are concatenated in a deterministic order (ascending
``order_col``, ties broken by ``key_col``) and the resulting token
stream is cut every ``seq_len`` tokens. ``pack_sequences`` reports,
per document, exactly where it lands: its global start offset, the
first and last sequence it touches, how many sequences it spans
(``n_seqs > 1`` = the doc is split across a context boundary), and
its offset inside its first sequence. ``packing_stats`` aggregates
the corpus-level packing report (sequence count, split-doc count,
tail padding) a data-card needs.

Scale shape: placement is a pure function of the per-group pre-doc
prefix sum, which comes from ``sampling.prefix_sums`` — the two-phase
range-bucketed cumsum, so a single global group (the common packing
case: one training stream) still runs with ``n_buckets``-way
parallelism instead of funnelling the corpus through one window task.
Everything downstream of the prefix sum is a pure Column projection /
one partial aggregation — no UDFs, no extra shuffle.

The reference has no packing surface (it is a validation engine);
this operator exists for the LLM-training-data pipeline mandate.
Determinism contract: like the pages generator, placement is a pure
function of (order_col, key_col, token sums) — independent of
partition count, so N-executor and 4N-executor runs agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validatelite_spark.operators.sampling import prefix_sums

#: internal surrogate group for global (ungrouped) packing
_GLOBAL = "__pack_g"


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str,
    order_col: str = None,
    key_col: str = None,
    by: str = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-document placement in the packed token stream.

    Adds columns:

    - ``seq_start`` — tokens before this doc in its group's stream
    - ``first_seq`` / ``last_seq`` — index of the first / last
      ``seq_len``-token window the doc touches (0-based; a zero-token
      doc sits wholly at its boundary: ``last_seq = first_seq``)
    - ``n_seqs`` — windows spanned (``>1`` = split doc)
    - ``seq_offset`` — position inside ``first_seq``

    ``by=None`` packs one global stream; pass a group column to pack
    per-group streams (e.g. one stream per language shard)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    gcol, drop_g = by, False
    if by is None:
        df = df.withColumn(_GLOBAL, F.lit(0))
        gcol, drop_g = _GLOBAL, True
    placed = prefix_sums(df, token_col, gcol, order_col=order_col,
                         key_col=key_col, n_buckets=n_buckets,
                         out_col="__start")
    L = F.lit(int(seq_len))
    start = F.col("__start").cast("long")
    tok = F.col(token_col).cast("long")
    first = F.floor(start / L).cast("long")
    last = (F.when(tok <= 0, first)
            .otherwise(F.floor((start + tok - F.lit(1)) / L))
            .cast("long"))
    out = (placed
           .withColumn("seq_start", start)
           .withColumn("first_seq", first)
           .withColumn("last_seq", last)
           .withColumn("n_seqs", (last - first + F.lit(1)).cast("long"))
           .withColumn("seq_offset", (start % L).cast("long"))
           .drop("__start"))
    return out.drop(_GLOBAL) if drop_g else out


def packing_stats(
    df: DataFrame,
    seq_len: int,
    token_col: str,
    order_col: str = None,
    key_col: str = None,
    by: str = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Corpus-level packing report, one row per group (or one row
    total when ``by=None``): document count, token total, number of
    ``seq_len`` windows produced, documents split across a window
    boundary, and padding tokens wasted in the final partial window.

    ``n_sequences`` is derived as ``max(last_seq) + 1`` — integer-exact
    (no float ceil division), and by construction equal to
    ``ceil(total_tokens / seq_len)`` when every doc has ≥1 token."""
    placed = pack_sequences(df, seq_len, token_col, order_col=order_col,
                            key_col=key_col, by=by, n_buckets=n_buckets)
    keys = [by] if by else []
    nseq = (F.max("last_seq") + F.lit(1)).cast("long")
    return placed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col).cast("long")).alias("total_tokens"),
        nseq.alias("n_sequences"),
        F.sum(F.when(F.col("n_seqs") > 1, 1).otherwise(0))
        .cast("long").alias("split_docs"),
        (nseq * F.lit(int(seq_len))
         - F.sum(F.col(token_col).cast("long"))).alias("tail_padding"),
    )
