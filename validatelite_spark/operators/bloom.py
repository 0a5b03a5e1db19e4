"""Bloom-filter membership index for incremental exact dedup.

The fingerprint-parquet incremental index (``operators/dedup.
incremental_exact``) is exact but costs one row per corpus document;
at 10^12 documents the anti-join's build side is the whole history.
A Bloom filter compresses membership to ~1.2 bytes/doc at 1% false
positives: probing a new crawl batch touches a bit table instead of
the full fingerprint history, at the documented cost that a false
positive drops a genuinely-new page (never the reverse — no duplicate
is ever admitted by mistake, the safe direction for dedup).

Everything is engine-portable arithmetic (the ``sampling._hash_bucket``
md5 contract, k derived hashes per fingerprint), so the ENTIRE filter
— build, bit packing, probe, verdict — replays bit-for-bit in DuckDB:
testing "all k bits set" against the packed blocks is equivalent to
"all k positions ∈ the distinct inserted-position set", which is what
the oracle checks.

Scale shape:
- build: positions explode (k rows/doc) → distinct → one
  ``groupBy(block).agg(bit_or)`` — partial aggregation packs bits
  map-side; output is m/32 rows regardless of corpus size.
- probe: equality join on block id — uniformly distributed by
  construction (md5), so the shuffle is skew-free; AQE broadcasts the
  bit table when it is small (m ≤ a few 10^8 bits), and at
  10^12-document scale (m ~ 10^13 bits ≈ 1.2 TB) the same plan runs
  as a block-partitioned shuffle join with no code change.
- blocks are 32-bit (bit = pos % 32) so packed values stay positive
  and well inside BIGINT on every engine — no sign-bit edge cases.

reference: litedatum/validatelite has no membership-index surface;
parameters follow Bloom (1970) / the standard k = m/n·ln2 sizing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from validatelite_spark.functions.textquality import fingerprint

#: bits per packed block (kept at 32 so block values are sign-safe
#: BIGINTs in both Spark and DuckDB)
BLOCK_BITS = 32


def _hash_pos(fp: Column, j: int, m_bits: int) -> Column:
    """Position of derived hash ``j`` for fingerprint ``fp``: first 15
    md5 hex digits of ``fp:j`` (< 2^60, positive) mod ``m_bits``."""
    return (F.conv(F.substring(
        F.md5(F.concat_ws(":", fp, F.lit(str(j)))), 1, 15), 16, 10)
        .cast("long") % m_bits)


def _positions(df: DataFrame, text_col: str, key_col: str,
               m_bits: int, k: int) -> DataFrame:
    """(k, j, pos) — ``k`` hash positions per non-NULL-text document.
    NULL texts carry no fingerprint (the exact-dedup contract: they are
    always kept) and emit no positions."""
    fp = fingerprint(F.col(text_col))
    arr = F.array(*[_hash_pos(fp, j, m_bits) for j in range(k)])
    return (df.filter(F.col(text_col).isNotNull())
            .select(F.col(key_col).alias("k"),
                    F.posexplode(arr).alias("j", "pos")))


def bloom_build(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Packed Bloom filter of the corpus' text fingerprints:
    (block, bits) with ``bits`` the OR of ``1 << (pos % 32)`` for every
    inserted position in ``block = pos // 32``. m/32 rows max."""
    pos = _positions(df, text_col, key_col, m_bits, k)
    return (pos.select("pos").distinct()
            .select((F.col("pos") / BLOCK_BITS).cast("long").alias("block"),
                    (F.col("pos") % BLOCK_BITS).cast("int").alias("bit"))
            .groupBy("block")
            .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("bits")))


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """(key, maybe_member): True iff ALL ``k`` of the document's bits
    are set in ``bloom`` — i.e. the text was (probably) inserted.
    False is definite: the text is new. NULL-text rows report False
    (no fingerprint, always kept — the exact-dedup contract).
    ``m_bits``/``k`` must match the build call."""
    pos = _positions(df, text_col, key_col, m_bits, k)
    tested = (pos
              .withColumn("block",
                          (F.col("pos") / BLOCK_BITS).cast("long"))
              .withColumn("bit", (F.col("pos") % BLOCK_BITS).cast("int"))
              .join(bloom, "block", "left")
              .withColumn(
                  "hit",
                  F.coalesce(
                      F.expr("(bits & shiftleft(1L, bit)) != 0"),
                      F.lit(False))))
    verdict = (tested.groupBy("k")
               .agg((F.sum(F.when(F.col("hit"), 1).otherwise(0))
                     == F.lit(k)).alias("maybe_member")))
    return (df.select(F.col(key_col))
            .join(verdict.withColumnRenamed("k", key_col),
                  key_col, "left")
            .select(F.col(key_col),
                    F.coalesce("maybe_member", F.lit(False))
                    .alias("maybe_member")))


def bloom_filter_new(
    df: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """The incremental-dedup application: keep only rows whose text is
    DEFINITELY not in the indexed history (maybe_member = False).
    False positives drop a few genuinely-new pages (rate ≈ fill^k,
    report via ``bloom_stats``); no duplicate is ever admitted."""
    verdict = bloom_probe(df, bloom, text_col, key_col, m_bits, k)
    return (df.join(verdict.filter(~F.col("maybe_member"))
                    .select(key_col), key_col))


def bloom_stats(bloom: DataFrame, m_bits: int = 1 << 16,
                k: int = 3) -> DataFrame:
    """One-row health report: (set_bits, fill_ratio, est_fp_rate).
    est_fp_rate = fill^k — the probability a new text's k uniform
    positions all land on set bits."""
    return (bloom.agg(F.sum(F.bit_count("bits")).alias("set_bits"))
            .select(
                F.col("set_bits").cast("long"),
                F.round(F.col("set_bits") / F.lit(float(m_bits)) + 1e-9,
                        6).alias("fill_ratio"),
                F.round(F.pow(F.col("set_bits") / F.lit(float(m_bits)),
                              F.lit(float(k))) + 1e-9, 6)
                .alias("est_fp_rate")))
