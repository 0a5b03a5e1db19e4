"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery here is REAL and tested: schemas, Arrow
batch iteration via ``mapInPandas``, partition-preserving feature
extraction, deterministic batching. The actual media *decode* is STUBBED
(this container ships no image/audio libraries): ``decode_media`` raises
``NotImplementedError`` unless the deterministic fake decoder is
requested, which computes a byte-histogram "feature vector" + magic-byte
format sniffing — deterministic, so tests pin exact values.

Swap ``_fake_decode_batch`` for a Pillow/torchaudio-backed batch decoder
in production; the UDF signature, output schema, and batching are already
the production shape (Arrow batches in, Arrow batches out, no per-row
Python beyond the media library call itself).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: output schema of the feature-extraction pass
FEATURES_SCHEMA = (
    "url string, n_bytes long, format string, features array<float>"
)

_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG", "png"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"<html", "html"),
    (b"<!doc", "html"),
]


def _sniff_format(b: bytes) -> str:
    head = b[:8].lower() if b[:1] in (b"<",) else b[:8]
    for magic, name in _MAGIC:
        if head[: len(magic)].lower().startswith(magic.lower()):
            return name
    return "unknown"


def _fake_decode_batch(payloads: pd.Series) -> tuple[list[int], list[str],
                                                     list[list[float]]]:
    """Deterministic fake decode: 16-bin byte histogram (L1-normalized)
    as the 'feature vector'. Vectorized with numpy per Arrow batch."""
    n_bytes: list[int] = []
    formats: list[str] = []
    feats: list[list[float]] = []
    for raw in payloads:
        if raw is None:
            n_bytes.append(0)
            formats.append("missing")
            feats.append([0.0] * 16)
            continue
        b = bytes(raw)
        arr = np.frombuffer(b, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
        total = hist.sum()
        if total > 0:
            hist = hist / total
        n_bytes.append(len(b))
        formats.append(_sniff_format(b))
        feats.append([float(x) for x in hist])
    return n_bytes, formats, feats


def decode_media(
    df: DataFrame,
    binary_col: str = "html",
    key_col: str = "url",
    decoder: str = "fake",
) -> DataFrame:
    """Feature-extract a binary media column via ``mapInPandas``.

    decoder='fake'  → deterministic byte-histogram features (testable now)
    decoder='image' → real image decode — STUB: raises NotImplementedError
                      (no Pillow/opencv in this environment; plug the
                      batch decoder in here)
    """
    if decoder not in ("fake", "image"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "image":
        raise NotImplementedError(
            "real image decode requires an image library not present in "
            "this environment; use decoder='fake' for the plumbing path")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, formats, feats = _fake_decode_batch(pdf[binary_col])
            yield pd.DataFrame({
                "url": pdf[key_col],
                "n_bytes": n_bytes,
                "format": formats,
                "features": feats,
            })

    return (
        df.select(key_col, binary_col)
        .mapInPandas(extract, schema=FEATURES_SCHEMA)
    )


def frame_sample(
    df: DataFrame,
    binary_col: str = "html",
    key_col: str = "url",
    n_frames: int = 4,
) -> DataFrame:
    """'Frame sampling' over a binary column: emit ``n_frames`` evenly
    spaced 16-byte slices per payload (the deterministic stand-in for
    video frame extraction — the explode/schema/batch shape is the real
    one). Output: (url, frame_idx, frame_bytes)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for url, raw in zip(pdf[key_col], pdf[binary_col]):
                if raw is None or len(raw) == 0:
                    continue
                b = bytes(raw)
                step = max(len(b) // n_frames, 1)
                for i in range(min(n_frames, len(b))):
                    off = i * step
                    urls.append(url)
                    idxs.append(i)
                    frames.append(b[off:off + 16])
            yield pd.DataFrame({
                "url": urls, "frame_idx": idxs, "frame_bytes": frames})

    return (
        df.select(key_col, binary_col)
        .mapInPandas(sample,
                     schema="url string, frame_idx int, frame_bytes binary")
    )
