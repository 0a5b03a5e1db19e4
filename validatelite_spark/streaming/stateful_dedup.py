"""Stateful streaming dedup — custom operator via applyInPandasWithState.

Exact dedup over an UNBOUNDED stream: the batch operator
(operators/dedup.py) can sort within a dataset, but a stream needs
cross-micro-batch memory. Per-fingerprint GroupState remembers whether a
document content hash was already emitted; only first occurrences pass.

State is partitioned by the md5 fingerprint — uniformly distributed, so
the state store shards evenly across executors (no hot keys by
construction); state size is one boolean per distinct document.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from validatelite_spark.functions.textquality import fingerprint

OUTPUT_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("fp", T.StringType()),
])

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _dedup_fn(key: Any, pdfs: Iterable[pd.DataFrame],
              state: Any) -> Iterator[pd.DataFrame]:
    """Emit rows of this fingerprint group only if the state says the
    fingerprint was never seen; first row wins, everything after —
    within this batch or any later one — is dropped."""
    if state.exists and state.get[0]:
        for _ in pdfs:  # drain; all duplicates
            pass
        return
    emitted = False
    for pdf in pdfs:
        if not emitted and len(pdf):
            yield pdf.iloc[:1]
            emitted = True
    if emitted:
        state.update((True,))


def streaming_exact_dedup(stream: DataFrame, text_col: str = "text",
                          key_col: str = "url") -> DataFrame:
    """First-occurrence pass-through over a streaming pages DataFrame."""
    with_fp = (
        stream.filter(F.col(text_col).isNotNull())
        .select(F.col(key_col).alias("url"),
                F.col(text_col).alias("text"),
                fingerprint(F.col(text_col)).alias("fp"))
    )
    return with_fp.groupBy("fp").applyInPandasWithState(
        _dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA,
        "append", "NoTimeout")
