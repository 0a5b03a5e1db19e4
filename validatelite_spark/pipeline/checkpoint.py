"""Per-partition checkpointing with lineage — resumable runs.

north_rule requirement: a killed run resumes without recomputing
completed partitions. Mechanism (the Spark-native version of the
reference's two-phase "metadata pass → gated data pass" shape,
SURVEY.md §3.2):

- rows are assigned a deterministic bucket ``pmod(xxhash64(url), B)`` —
  a pure function of the data, so bucket membership is identical across
  runs, partition counts, and cluster sizes;
- buckets are processed in batches; each batch is one Spark job that
  writes ``bucket=<i>/`` parquet partitions with dynamic partition
  overwrite (idempotent on retry: a re-run of a half-written batch
  replaces exactly its own partitions);
- after a batch lands, a manifest JSON (one per batch, atomic rename)
  records the finished buckets + row counts + wall time — the lineage;
- resume = read the manifest, skip finished buckets.

At cluster scale the manifest lives on the shared filesystem next to the
output. Each manifest also pins the INPUT version via
sources/iceberg_support.py — an Iceberg snapshot id when the runtime is
in the classpath, a parquet file-set fingerprint otherwise — and resume
refuses (InputDriftError) when the input changed under a half-finished
run, so the output can never silently mix two input versions.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

MANIFEST_DIR = "_vlite_manifest"
BUCKET_COL = "__bucket"


@dataclass
class CheckpointState:
    out_dir: str
    n_buckets: int
    done: set[int]
    input_pin: Optional[dict] = None  # fingerprint from the manifests

    @property
    def remaining(self) -> list[int]:
        return [b for b in range(self.n_buckets) if b not in self.done]


def _manifest_path(out_dir: str) -> Path:
    return Path(out_dir) / MANIFEST_DIR


def read_state(out_dir: str, n_buckets: int) -> CheckpointState:
    done: set[int] = set()
    input_pin: Optional[dict] = None
    mdir = _manifest_path(out_dir)
    if mdir.exists():
        for f in sorted(mdir.glob("batch-*.json")):
            payload = json.loads(f.read_text())
            if payload.get("n_buckets") != n_buckets:
                raise ValueError(
                    f"manifest bucket count {payload.get('n_buckets')} != "
                    f"requested {n_buckets}; use a fresh out_dir")
            done.update(payload["buckets"])
            input_pin = payload.get("input") or input_pin
    return CheckpointState(out_dir, n_buckets, done, input_pin)


def _write_manifest(out_dir: str, n_buckets: int, buckets: list[int],
                    rows: int, elapsed: float,
                    input_pin: Optional[dict] = None) -> None:
    mdir = _manifest_path(out_dir)
    mdir.mkdir(parents=True, exist_ok=True)
    payload = {
        "n_buckets": n_buckets,
        "buckets": buckets,
        "rows": rows,
        "elapsed_sec": round(elapsed, 3),
        "completed_at": time.time(),
    }
    if input_pin is not None:
        payload["input"] = input_pin
    tmp = mdir / f".tmp-{uuid.uuid4().hex}"
    tmp.write_text(json.dumps(payload))
    os.replace(tmp, mdir / f"batch-{min(buckets):05d}.json")


def run_checkpointed(
    df: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    out_dir: str,
    n_buckets: int = 64,
    batch_buckets: int = 16,
    key_column: str = "url",
    progress: Optional[Callable[[str], None]] = None,
    input_source: Optional[str] = None,
    allow_input_drift: bool = False,
) -> CheckpointState:
    """Run ``transform`` over ``df`` in resumable bucket batches.

    ``transform`` must be deterministic per-row (the pipeline's annotate
    is). Output lands at ``out_dir`` partitioned by bucket; call again
    with the same arguments after a crash and only unfinished buckets run.

    ``input_source``: the Iceberg table identifier / parquet path ``df``
    was read from. When given, each manifest pins the input version
    (snapshot id or file-set fingerprint) and a resume raises
    InputDriftError if the input changed since the finished buckets were
    written — unless ``allow_input_drift=True``.
    """
    from validatelite_spark.sources.iceberg_support import (
        check_input_drift,
        input_fingerprint,
    )

    spark = df.sparkSession
    state = read_state(out_dir, n_buckets)
    input_pin: Optional[dict] = None
    if input_source is not None:
        if state.input_pin is not None:
            check_input_drift(spark, state.input_pin, allow_input_drift)
        # pin the CURRENT version (after an allowed drift the new batches
        # record what they actually read)
        input_pin = input_fingerprint(spark, input_source)
    bucket = F.pmod(F.xxhash64(F.col(key_column)), F.lit(n_buckets)).cast("int")
    with_bucket = df.withColumn(BUCKET_COL, bucket)

    remaining = state.remaining
    for i in range(0, len(remaining), batch_buckets):
        batch = remaining[i:i + batch_buckets]
        t0 = time.time()
        part = with_bucket.filter(F.col(BUCKET_COL).isin(batch))
        result = transform(part)
        if BUCKET_COL not in result.columns:
            raise ValueError("transform must preserve the bucket column")
        # row count rides the write via Observation (no second scan), and
        # dynamic partition-overwrite is set per-write so the shared
        # session's conf is never mutated (ADVICE r1)
        obs = Observation(f"ckpt_batch_{batch[0]}")
        (result.observe(obs, F.count(F.lit(1)).alias("rows"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(BUCKET_COL)
         .parquet(out_dir))
        rows = int(obs.get["rows"])
        _write_manifest(out_dir, n_buckets, batch, rows, time.time() - t0,
                        input_pin)
        state.done.update(batch)
        if progress:
            progress(f"buckets {batch[0]}..{batch[-1]} done "
                     f"({len(state.done)}/{n_buckets})")
    return state
