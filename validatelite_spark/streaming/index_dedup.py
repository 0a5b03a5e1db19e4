"""Streaming dedup against a persisted MinHash corpus index — the
rolling-crawl shape: each micro-batch is near-dup-checked against
EVERYTHING already kept (batch or streaming), survivors are written out
AND folded into the index so later batches see them.

``applyInPandasWithState`` (streaming/stateful_dedup.py) handles exact
dedup with in-state fingerprints, but near-dup state (shingle sets)
is far too large for the state store; the index on the shared FS IS the
state. ``foreachBatch`` gives each micro-batch the full batch-DataFrame
API, so the same ``incremental_minhash_pairs`` operator runs unchanged —
batch and streaming dedup cannot drift apart.

Exactly-once caveat: foreachBatch is at-least-once on retries; both
writes are parquet appends, so a replayed batch can double-append.
Spark's checkpoint makes replays rare; for strict exactly-once, point
``output_path`` at an Iceberg/Delta table and dedupe the index by
(k, s) on compaction — the operator output is idempotent-by-content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from validatelite_spark.operators.dedup import (incremental_minhash_pairs,
                                                minhash_index_append)


def index_dedup_batch(
    batch: DataFrame,
    index_path: str,
    output_path: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.7,
) -> None:
    """Process ONE micro-batch: drop docs near-duplicating the index,
    append survivors to ``output_path`` and to the index itself."""
    pairs = incremental_minhash_pairs(batch, index_path, text_col,
                                      key_col, threshold)
    dup_ids = pairs.select(F.col("id2").alias(key_col)).distinct()
    kept = batch.join(dup_ids, key_col, "left_anti")
    # localCheckpoint: `kept` feeds TWO writes below; without it the
    # whole candidate join + verify would recompute per write
    kept = kept.localCheckpoint()
    kept.write.mode("append").parquet(output_path)
    minhash_index_append(kept, index_path, text_col, key_col)


def start_index_dedup_stream(
    stream: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    key_col: str = "doc_id",
    threshold: float = 0.7,
):
    """readStream → near-dup-vs-index filter → append survivors; the
    index grows with each batch so later batches dedup against earlier
    ones. Returns the started StreamingQuery."""
    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        index_dedup_batch(batch_df, index_path, output_path,
                          text_col, key_col, threshold)

    return (stream.writeStream.foreachBatch(_process)
            .option("checkpointLocation", checkpoint_path)
            .start())
