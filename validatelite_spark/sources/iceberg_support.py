"""Iceberg snapshot pinning + input-drift fencing for checkpointed runs.

north_rule: the pipeline "checkpoints per-Iceberg-snapshot with
per-partition lineage", i.e. a resumed run must be reading THE SAME
input the finished buckets were computed from — otherwise the resumed
half of the output silently mixes two input versions.

Two tiers, one seam:

- **Iceberg in the classpath** (production): the manifest pins the
  table's current snapshot id, read from the ``<table>.snapshots``
  metadata table. Resume compares snapshot ids; a new snapshot means the
  input advanced and the run must either restart or be explicitly
  allowed to continue (``allow_input_drift=True`` — e.g. for
  append-only tables where finished buckets are immutable).
- **Plain parquet** (this sandbox ships no Iceberg jars): the manifest
  pins a deterministic fingerprint of the parquet directory — the md5
  of the sorted (relative path, size, mtime_ns) listing. Any rewrite,
  addition, or deletion of a data file changes the digest.

Both produce the same small JSON-able dict, so the checkpoint manifest
code (pipeline/checkpoint.py) is agnostic to which tier is active.

Reference analogue: ConnectionSchema's hive/spark reservations
(reference: shared/enums/connection_types.py) — the reference reserves
lake connection types but ships no lake lineage; this module is the
Spark-native realization of that seam.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Any, Optional

from pyspark.sql import SparkSession


class InputDriftError(RuntimeError):
    """The checkpoint manifest was written against a different input
    version (Iceberg snapshot / parquet file set) than the one present
    now; resuming would mix two input versions in one output."""


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg runtime is in the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.Snapshot")
        return True
    except Exception:
        return False


def current_snapshot_id(spark: SparkSession, table: str) -> Optional[int]:
    """Latest committed snapshot id of an Iceberg table, or None when
    Iceberg (or the table) is unavailable."""
    if not iceberg_available(spark):
        return None
    try:
        rows = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            f"ORDER BY committed_at DESC LIMIT 1").collect()
        return int(rows[0][0]) if rows else None
    except Exception:
        return None


def parquet_fingerprint(path: str) -> str:
    """Deterministic digest of a parquet directory (or single file):
    md5 over the sorted (relative path, size, mtime_ns) listing of every
    data file. Cheap — a directory listing, no data read."""
    root = Path(path)
    if root.is_file():
        files = [root]
        base = root.parent
    else:
        files = sorted(p for p in root.rglob("*")
                       if p.is_file() and not p.name.startswith(("_", ".")))
        base = root
    h = hashlib.md5()
    for p in files:
        st = p.stat()
        h.update(f"{p.relative_to(base)}|{st.st_size}|{st.st_mtime_ns}\n"
                 .encode())
    return h.hexdigest()


def input_fingerprint(spark: SparkSession, source: str) -> dict[str, Any]:
    """Version-pin for ``source`` — an Iceberg table identifier or a
    parquet path. Returns a small JSON-able dict stored in the
    checkpoint manifest."""
    if source.startswith("file:"):
        source = source[len("file:"):]
    if os.path.exists(source):
        return {"kind": "parquet", "source": source,
                "digest": parquet_fingerprint(source)}
    snap = current_snapshot_id(spark, source)
    if snap is not None:
        return {"kind": "iceberg", "source": source, "snapshot_id": snap}
    return {"kind": "opaque", "source": source}


def check_input_drift(spark: SparkSession, recorded: dict[str, Any],
                      allow_input_drift: bool = False) -> None:
    """Raise InputDriftError when the input no longer matches the
    manifest's recorded fingerprint (no-op for opaque/unpinned inputs
    or when drift is explicitly allowed)."""
    if not recorded or recorded.get("kind") == "opaque":
        return
    current = input_fingerprint(spark, recorded["source"])
    if current == recorded or allow_input_drift:
        return
    raise InputDriftError(
        f"checkpoint manifest pins input {recorded}, but the source now "
        f"fingerprints as {current}; restart with a fresh out_dir or pass "
        f"allow_input_drift=True to resume anyway")
