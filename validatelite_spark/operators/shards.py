"""Training-data delivery: deterministic global shuffle, token-balanced
output shards, and a verifiable shard manifest.

The last step of every curation pipeline is WRITING the corpus for the
trainer: documents must arrive in a reproducible pseudo-random order
(training-order shuffling), be grouped into shards of roughly equal
token cost (so data-parallel readers stay balanced), and ship with a
manifest the consumer can verify (doc/token counts + an
order-independent content checksum per shard).

Scale shape (100 TB): the shard boundary is a pure function of the
GLOBAL token prefix sum in shuffle order, computed with the same
two-phase machinery as ``sampling.prefix_sums`` — no single-task
window. The whole corpus is one "group", so parallelism comes entirely
from the range buckets: size ``n_buckets`` ≈ corpus_rows / 10M (the
per-task window then covers ≤10M rows). The writer repartitions by
shard id, which is SAFE here precisely because ``target_tokens`` bounds
every shard's size by construction — one task per shard is a bounded
task, unlike one task per group in skewed groupBys.

Reference parity: the reference engine has no shard writer (it
validates in place); this module exists for the training-data delivery
tier. The deterministic-order contract mirrors
``sampling.hash_sample``'s md5 convention so one seed story covers
sampling, splits, and shard order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validatelite_spark.operators.sampling import prefix_sums

#: internal column names (dropped from user-facing outputs)
_ORD = "__shard_ord"
_GRP = "__shard_grp"
_TOK = "__shard_tok"


def shuffle_order(key_col: str, seed: int = 42) -> F.Column:
    """Deterministic pseudo-random permutation rank for training-order
    shuffling: the first 15 md5 hex digits of ``key:seed`` as a 60-bit
    integer. A pure function of the key — the order is identical across
    runs, partitionings, and cluster sizes, and replayable in any
    engine (DuckDB: ``('0x'||substr(md5(k||':'||seed),1,15))::bigint``).
    15 hex digits = 60 bits < 2^63, so the cast never overflows."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(
            ":", F.col(key_col).cast("string"), F.lit(str(seed)))),
            1, 15), 16, 10).cast("long")


def assign_shards(
    df: DataFrame,
    target_tokens: int,
    token_col: str,
    key_col: str,
    order_col: str | None = None,
    seed: int = 42,
    n_buckets: int = 256,
    out_col: str = "shard_id",
) -> DataFrame:
    """Assign every document to a token-balanced output shard.

    Documents are laid out in ascending ``order_col`` (default: the
    deterministic ``shuffle_order`` hash of ``key_col`` — training-order
    shuffle) and cut into shards of ~``target_tokens`` tokens:
    ``shard_id = floor(pre_doc_running_total / target_tokens)``. Every
    doc lands in EXACTLY one shard; a shard may exceed the target by at
    most one document (the straddling doc belongs to the shard its
    prefix sum starts in — same inclusive-cut convention as
    ``token_budget_filter``), and a single doc larger than the target
    still gets one shard. NULL token counts weigh 0.

    The running total uses ``prefix_sums`` two-phase machinery over ONE
    global group — size ``n_buckets`` so each range bucket's window task
    sees corpus_rows / n_buckets rows (docstring above). Output order is
    unspecified (assignment is a row-wise column); sort small results
    for display."""
    if target_tokens <= 0:
        raise ValueError(f"target_tokens must be > 0, got {target_tokens}")
    ordc = order_col
    bounds = None
    base = df.withColumn(_TOK, F.coalesce(
        F.col(token_col).cast("long"), F.lit(0)))
    if ordc is None:
        ordc = _ORD
        base = base.withColumn(_ORD, shuffle_order(key_col, seed))
        # the generated order is a uniform 60-bit hash: its range is
        # KNOWN, so prefix_sums skips the min/max corpus pass entirely
        # (one fewer full scan — material at 100 TB)
        bounds = (0.0, float(1 << 60))
    pre = prefix_sums(
        base.withColumn(_GRP, F.lit(0)), _TOK, _GRP,
        order_col=ordc, key_col=key_col, n_buckets=n_buckets,
        out_col="__pre", order_bounds=bounds)
    out = (pre.withColumn(
        out_col,
        F.floor(F.col("__pre") / F.lit(target_tokens)).cast("long"))
        .drop(_GRP, _TOK, "__pre"))
    return out.drop(_ORD) if order_col is None else out


def shard_manifest(
    assigned: DataFrame,
    token_col: str,
    key_col: str,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Per-shard manifest: ``(shard_id, n_docs, n_tokens, checksum)``.

    ``checksum`` is the SUM of each member doc's 60-bit md5 key hash
    (decimal(38,0) — no overflow below ~10^20 docs/shard), which is
    ORDER-INDEPENDENT: the consumer can re-derive it from the shard
    files however they were read, and any dropped/duplicated/corrupted
    doc id changes it. Engine-portable (DuckDB hugeint sum replays it
    exactly). One map-side partial aggregate — no shuffle beyond the
    |shards|-row final combine."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
               16, 10).cast("long").cast("decimal(38,0)")
    return (assigned.groupBy(shard_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.coalesce(F.col(token_col).cast("long"),
                                  F.lit(0))).alias("n_tokens"),
                 F.sum(h).alias("checksum"))
            .orderBy(shard_col))


def write_shards(
    assigned: DataFrame,
    path: str,
    shard_col: str = "shard_id",
) -> None:
    """Write one parquet directory per shard
    (``path/shard_id=N/part-*.parquet``), one file per shard.

    ``repartition(shard_col)`` before ``partitionBy`` puts each shard in
    one task → one output file, which is the delivery contract trainers
    want (shard = file). Bounded by construction: ``assign_shards``
    caps a shard at ~``target_tokens``, so the per-task write is
    ~target-sized regardless of corpus size. For shards sized beyond
    one task's comfort (target >> 1 GB), drop the repartition and accept
    multiple files per shard directory."""
    (assigned.repartition(F.col(shard_col))
     .write.mode("overwrite").partitionBy(shard_col).parquet(path))


def verify_shards(
    delivered: DataFrame,
    manifest: DataFrame,
    token_col: str,
    key_col: str,
    shard_col: str = "shard_id",
) -> DataFrame:
    """Consumer-side delivery check: recompute each shard's
    (n_docs, n_tokens, checksum) from the DELIVERED rows and compare
    against the manifest — one row per shard id present on either side:
    ``(shard_id, ok, n_docs, n_tokens, checksum, m_docs, m_tokens,
    m_checksum)`` with ``ok`` false on any count/checksum mismatch or a
    shard missing from either side.

    This is the read-back half of ``shard_manifest``'s contract: any
    dropped, duplicated, or swapped document flips ``ok`` for exactly
    the affected shard (the checksum is an order-independent sum of
    per-doc 60-bit md5 hashes). One aggregate over the delivered data +
    a full-outer join on the |shards|-row tables — no window, no
    collect."""
    got = (shard_manifest(delivered, token_col, key_col, shard_col)
           .withColumnRenamed("n_docs", "g_docs")
           .withColumnRenamed("n_tokens", "g_tokens")
           .withColumnRenamed("checksum", "g_checksum"))
    m = (manifest.select(
        F.col(shard_col).cast("long").alias(shard_col),
        F.col("n_docs").alias("m_docs"),
        F.col("n_tokens").alias("m_tokens"),
        F.col("checksum").cast("decimal(38,0)").alias("m_checksum")))
    j = got.withColumn(shard_col, F.col(shard_col).cast("long")) \
        .join(m, shard_col, "full_outer")
    ok = (F.col("g_docs").eqNullSafe(F.col("m_docs"))
          & F.col("g_tokens").eqNullSafe(F.col("m_tokens"))
          & F.col("g_checksum").eqNullSafe(F.col("m_checksum")))
    return (j.select(shard_col, ok.alias("ok"),
                     F.col("g_docs").alias("n_docs"),
                     F.col("g_tokens").alias("n_tokens"),
                     F.col("g_checksum").alias("checksum"),
                     "m_docs", "m_tokens", "m_checksum")
            .orderBy(shard_col))
