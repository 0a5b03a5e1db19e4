"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery here is REAL and tested: schemas, Arrow
batch iteration via ``mapInPandas``, partition-preserving feature
extraction, deterministic batching.

``decoder='fake'`` computes a byte-histogram "feature vector" +
magic-byte format sniffing — deterministic, so tests pin exact values.

``decoder='image'`` is a REAL decoder for the two formats decodable with
pure numpy (no image library ships in this container): uncompressed
24/32-bit BMP and binary PNM (P6 ppm / P5 pgm). It emits geometry +
per-channel means + a 4x4 nearest-neighbor grayscale thumbnail as the
feature vector; other formats pass through with ``features = NULL`` so a
mixed corpus never kills the job. Extend ``_decode_image`` with a
Pillow/torchaudio call for jpeg/png in production; the UDF signature,
output schema, and batching are already the production shape (Arrow
batches in, Arrow batches out, no per-row Python beyond the decode
itself).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: output schema of the feature-extraction pass
FEATURES_SCHEMA = (
    "url string, n_bytes long, format string, features array<float>"
)

_MAGIC = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG", "png"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"BM", "bmp"),
    (b"P6", "ppm"),
    (b"P5", "pgm"),
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


# --------------------------------------------------------------- real
# pure-numpy image codecs: uncompressed BMP (24/32-bit BI_RGB) + binary
# PNM (P6 ppm / P5 pgm). Enough to make decoder='image' real without an
# image library; jpeg/png would plug into _decode_image the same way.

def decode_bmp(b: bytes) -> np.ndarray | None:
    """Decode an uncompressed 24- or 32-bit BI_RGB BMP to an (H, W, 3)
    uint8 RGB array. Bottom-up and top-down row orders both handled.
    Returns None on anything it can't parse (truncated / compressed /
    palette formats)."""
    try:
        if len(b) < 54 or b[:2] != b"BM":
            return None
        off = int.from_bytes(b[10:14], "little")
        hdr = int.from_bytes(b[14:18], "little")
        if hdr < 40:  # BITMAPCOREHEADER etc. — not supported
            return None
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        bpp = int.from_bytes(b[28:30], "little")
        comp = int.from_bytes(b[30:34], "little")
        if comp != 0 or bpp not in (24, 32) or w <= 0 or w > 1 << 20:
            return None
        top_down = h < 0
        h = abs(h)
        if h == 0 or h > 1 << 20:
            return None
        nch = bpp // 8
        stride = (w * nch + 3) & ~3  # rows pad to 4 bytes
        if off + stride * h > len(b):
            return None
        rows = np.frombuffer(
            b, dtype=np.uint8, count=stride * h, offset=off
        ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
        if not top_down:
            rows = rows[::-1]
        # BMP stores BGR(A) → RGB
        return np.ascontiguousarray(rows[:, :, 2::-1])
    except Exception:
        return None


def decode_pnm(b: bytes) -> np.ndarray | None:
    """Decode binary PNM (P6 ppm → RGB, P5 pgm → gray replicated to
    RGB) with maxval <= 255 to an (H, W, 3) uint8 array. Returns None
    on parse failure."""
    try:
        magic = b[:2]
        if magic not in (b"P6", b"P5"):
            return None
        # header: magic, width, height, maxval — whitespace separated,
        # '#' comments allowed; one whitespace byte then raster.
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if pos < len(b) and b[pos : pos + 1] == b"#":
                while pos < len(b) and b[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            if pos == start:
                return None
            fields.append(int(b[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if not (0 < w <= 1 << 20 and 0 < h <= 1 << 20 and
                0 < maxval <= 255):
            return None
        nch = 3 if magic == b"P6" else 1
        need = w * h * nch
        if pos + need > len(b):
            return None
        arr = np.frombuffer(b, dtype=np.uint8, count=need,
                            offset=pos).reshape(h, w, nch)
        if nch == 1:
            arr = np.repeat(arr, 3, axis=2)
        return np.ascontiguousarray(arr)
    except Exception:
        return None


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a bottom-up 24-bit BMP.
    Data-gen / test helper (and round-trip check for decode_bmp)."""
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # BGR bottom-up
    raw = body.tobytes()
    header = (
        b"BM" + (54 + len(raw)).to_bytes(4, "little") + b"\0\0\0\0"
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raw).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + b"\0" * 8
    )
    return header + raw


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as binary P6 ppm."""
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample of an (H, W, C) array — the resize
    primitive for thumbnailing; vectorized numpy (index gather, no
    Python loop over pixels)."""
    h, w = arr.shape[:2]
    ys = ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64)
    xs = ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64)
    return arr[ys.clip(0, h - 1)][:, xs.clip(0, w - 1)]


def _decode_image(b: bytes) -> np.ndarray | None:
    """Dispatch on magic bytes to a pure-numpy decoder. Extension point
    for jpeg/png (Pillow/opencv) in production."""
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:2] in (b"P6", b"P5"):
        return decode_pnm(b)
    return None


def _real_decode_batch(payloads: pd.Series) -> tuple[list[int], list[str],
                                                     list]:
    """Real decode per Arrow batch: geometry + channel means + a 4x4
    grayscale nearest-neighbor thumbnail (21 floats). Undecodable
    payloads keep their sniffed format with features=None."""
    n_bytes: list[int] = []
    formats: list[str] = []
    feats: list = []
    for raw in payloads:
        if raw is None:
            n_bytes.append(0)
            formats.append("missing")
            feats.append(None)
            continue
        b = bytes(raw)
        n_bytes.append(len(b))
        formats.append(_sniff_format(b))
        img = _decode_image(b)
        if img is None:
            feats.append(None)
            continue
        h, w = img.shape[:2]
        px = img.astype(np.float64) / 255.0
        means = px.mean(axis=(0, 1))  # R, G, B in [0, 1]
        gray = px @ np.array([0.299, 0.587, 0.114])
        thumb = resize_nearest(gray, 4, 4).ravel()
        feats.append([float(w), float(h), *map(float, means),
                      *map(float, thumb)])
    return n_bytes, formats, feats


# --------------------------------------------------------------- audio
def decode_wav(b: bytes) -> tuple[np.ndarray, int] | None:
    """Decode a RIFF/WAVE PCM payload (8- or 16-bit integer PCM) to
    (samples float64 in [-1, 1] shaped (n, channels), sample_rate).
    Walks the chunk list (fmt may not directly precede data). Returns
    None on parse failure / non-PCM."""
    try:
        if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            size = int.from_bytes(b[pos + 4 : pos + 8], "little")
            body = b[pos + 8 : pos + 8 + size]
            if cid == b"fmt " and len(body) >= 16:
                fmt = body
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks pad to even
        if fmt is None or data is None:
            return None
        audio_fmt = int.from_bytes(fmt[0:2], "little")
        nch = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if audio_fmt != 1 or nch < 1 or bits not in (8, 16) or rate <= 0:
            return None
        if bits == 16:
            raw = np.frombuffer(data, dtype="<i2",
                                count=len(data) // 2)
            samples = raw.astype(np.float64) / 32768.0
        else:  # 8-bit PCM is unsigned
            raw = np.frombuffer(data, dtype=np.uint8)
            samples = (raw.astype(np.float64) - 128.0) / 128.0
        n = len(samples) // nch
        if n == 0:
            return None
        return samples[: n * nch].reshape(n, nch), rate
    except Exception:
        return None


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] (1-D mono or (n, ch)) as 16-bit
    PCM RIFF/WAVE. Data-gen / round-trip helper for decode_wav."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    nch = arr.shape[1]
    pcm = np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block = nch * 2
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + nch.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + (16).to_bytes(2, "little"))
    hdr = (b"RIFF" + (4 + len(fmt) + 8 + len(data)).to_bytes(4, "little")
           + b"WAVE")
    return hdr + fmt + b"data" + len(data).to_bytes(4, "little") + data


def _audio_features(b: bytes) -> list[float] | None:
    """21 floats, mirroring the image layout: [channels, sample_rate,
    n_samples, rms, zero-crossing rate, 16-bin normalized magnitude
    spectrum of the (mono-mixed) first 4096 samples]."""
    decoded = decode_wav(b)
    if decoded is None:
        return None
    samples, rate = decoded
    mono = samples.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono * mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
    spec = np.abs(np.fft.rfft(mono[:4096]))
    # 16 equal-width bins over the magnitude spectrum, L1-normalized
    edges = np.linspace(0, len(spec), 17).astype(int)
    bins = np.array([spec[a:z].sum() for a, z in zip(edges, edges[1:])])
    total = bins.sum()
    if total > 0:
        bins = bins / total
    return [float(samples.shape[1]), float(rate), float(len(mono)),
            rms, zcr, *map(float, bins)]


def _audio_decode_batch(payloads: pd.Series) -> tuple[list[int], list[str],
                                                      list]:
    n_bytes: list[int] = []
    formats: list[str] = []
    feats: list = []
    for raw in payloads:
        if raw is None:
            n_bytes.append(0)
            formats.append("missing")
            feats.append(None)
            continue
        b = bytes(raw)
        n_bytes.append(len(b))
        is_wav = b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        formats.append("wav" if is_wav else _sniff_format(b))
        feats.append(_audio_features(b) if is_wav else None)
    return n_bytes, formats, feats


# --------------------------------------------------------------- video
def decode_y4m(b: bytes) -> tuple[np.ndarray, float] | None:
    """Decode a YUV4MPEG2 (y4m) stream — the uncompressed video format
    decodable with pure numpy. Supports C420 (default) and C444 8-bit.
    Returns (luma frames uint8 shaped (n_frames, H, W), fps). Chroma
    planes are parsed (to advance correctly) but only luma is kept —
    the features below are luma statistics. None on parse failure."""
    try:
        if not b.startswith(b"YUV4MPEG2"):
            return None
        nl = b.index(b"\n")
        w = h = 0
        fps = 0.0
        csp = "420"
        for tok in b[9:nl].split():
            t = tok.decode("ascii", "replace")
            if t[0] == "W":
                w = int(t[1:])
            elif t[0] == "H":
                h = int(t[1:])
            elif t[0] == "F":
                num, den = t[1:].split(":")
                fps = int(num) / int(den)
            elif t[0] == "C":
                csp = t[1:]
        if not (0 < w <= 1 << 16 and 0 < h <= 1 << 16):
            return None
        if csp.startswith("420"):
            frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
        elif csp.startswith("444"):
            frame_bytes = 3 * w * h
        else:
            return None
        pos, frames = nl + 1, []
        while pos < len(b):
            if not b.startswith(b"FRAME", pos):
                return None
            pos = b.index(b"\n", pos) + 1  # FRAME line may carry params
            if pos + frame_bytes > len(b):
                return None
            frames.append(np.frombuffer(
                b, dtype=np.uint8, count=w * h, offset=pos).reshape(h, w))
            pos += frame_bytes
        if not frames:
            return None
        return np.stack(frames), fps
    except Exception:
        return None


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (n, H, W) uint8 luma frames as C420 y4m with neutral
    (128) chroma. Data-gen / round-trip helper for decode_y4m."""
    n, h, w = frames.shape
    hdr = b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)
    chroma = np.full(((h // 2) * (w // 2)), 128, dtype=np.uint8).tobytes()
    out = [hdr]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def _video_features(b: bytes) -> list[float] | None:
    """21 floats: [w, h, n_frames, fps, mean inter-frame luma delta,
    16-value 4x4 luma thumbnail of the middle frame]."""
    decoded = decode_y4m(b)
    if decoded is None:
        return None
    frames, fps = decoded
    n, h, w = frames.shape
    px = frames.astype(np.float64) / 255.0
    motion = (float(np.mean(np.abs(np.diff(px, axis=0))))
              if n > 1 else 0.0)
    thumb = resize_nearest(px[n // 2], 4, 4).ravel()
    return [float(w), float(h), float(n), float(fps), motion,
            *map(float, thumb)]


def _video_decode_batch(payloads: pd.Series) -> tuple[list[int], list[str],
                                                      list]:
    n_bytes: list[int] = []
    formats: list[str] = []
    feats: list = []
    for raw in payloads:
        if raw is None:
            n_bytes.append(0)
            formats.append("missing")
            feats.append(None)
            continue
        b = bytes(raw)
        n_bytes.append(len(b))
        is_y4m = b.startswith(b"YUV4MPEG2")
        formats.append("y4m" if is_y4m else _sniff_format(b))
        feats.append(_video_features(b) if is_y4m else None)
    return n_bytes, formats, feats


_DECODERS = {
    "fake": _fake_decode_batch,
    "image": _real_decode_batch,
    "audio": _audio_decode_batch,
    "video": _video_decode_batch,
}


def decode_media(
    df: DataFrame,
    binary_col: str = "html",
    key_col: str = "url",
    decoder: str = "fake",
) -> DataFrame:
    """Feature-extract a binary media column via ``mapInPandas``.

    decoder='fake'  → deterministic byte-histogram features
    decoder='image' → REAL decode for numpy-decodable formats (BMP,
                      binary PNM); features = [w, h, mean_r, mean_g,
                      mean_b, 16x thumbnail] or NULL if undecodable
    decoder='audio' → REAL RIFF/WAVE PCM decode; features = [channels,
                      rate, n_samples, rms, zcr, 16-bin spectrum] or
                      NULL if undecodable
    decoder='video' → REAL YUV4MPEG2 (y4m) decode; features = [w, h,
                      n_frames, fps, motion, 4x4 mid-frame luma
                      thumbnail] or NULL if undecodable
    """
    if decoder not in _DECODERS:
        raise ValueError(f"unknown decoder {decoder!r}")
    batch_fn = _DECODERS[decoder]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, formats, feats = batch_fn(pdf[binary_col])
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


def synthesize_images(spark, n: int, height: int = 8,
                      width: int = 8) -> DataFrame:
    """Deterministic synthetic image corpus: (url, html binary) where
    html is a P6 ppm (even ids) or 24-bit BMP (odd ids) whose pixels are
    a pure function of (id, y, x) — partition-count invariant, like the
    pages generator (CLAUDE.md rule 6). Generated per Arrow batch from
    spark.range ids; no driver-side data."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yy, xx = np.mgrid[0:height, 0:width]
        for pdf in batches:
            urls, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                px = (i * 31 + yy * 13 + xx * 7) % 256  # int64 grid
                img = np.stack([px, (px * 3 + 17) % 256,
                                (px * 5 + 101) % 256],
                               axis=2).astype(np.uint8)
                blobs.append(encode_ppm(img) if i % 2 == 0
                             else encode_bmp(img))
                urls.append(f"img://corpus/{i:08d}")
            yield pd.DataFrame({"url": urls, "html": blobs})

    # few rows per clip corpus: size partitions to the data, not the
    # cluster (a 32-slot session would spin 32 Python workers for 2k
    # rows); output is a pure function of id, so the count is free to
    # vary without changing results
    parts = max(1, min(int(spark.sparkContext.defaultParallelism),
                       n // 256))
    return (spark.range(n, numPartitions=parts).mapInPandas(
        gen, schema="url string, html binary"))


def synthesize_audio(spark, n: int, n_samples: int = 2048,
                     rate: int = 16000) -> DataFrame:
    """Deterministic synthetic audio corpus: (url, html binary) of
    16-bit PCM WAVs. Each clip is a sine at a pitch that is a pure
    function of the row id (partition-count invariant, rule 6)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(n_samples, dtype=np.float64) / rate
        for pdf in batches:
            urls, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                freq = 110.0 * (1 + i % 37)  # 110 Hz .. ~4 kHz
                wave = 0.5 * np.sin(2 * np.pi * freq * t)
                blobs.append(encode_wav(wave, rate))
                urls.append(f"audio://corpus/{i:08d}")
            yield pd.DataFrame({"url": urls, "html": blobs})

    # few rows per clip corpus: size partitions to the data, not the
    # cluster (a 32-slot session would spin 32 Python workers for 2k
    # rows); output is a pure function of id, so the count is free to
    # vary without changing results
    parts = max(1, min(int(spark.sparkContext.defaultParallelism),
                       n // 256))
    return (spark.range(n, numPartitions=parts).mapInPandas(
        gen, schema="url string, html binary"))


def synthesize_videos(spark, n: int, n_frames: int = 6, height: int = 8,
                      width: int = 8, fps: int = 25) -> DataFrame:
    """Deterministic synthetic video corpus: (url, html binary) of y4m
    clips whose luma is a pure function of (id, frame, y, x) — a moving
    gradient, so inter-frame motion is nonzero and pinned."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ff, yy, xx = np.mgrid[0:n_frames, 0:height, 0:width]
        for pdf in batches:
            urls, blobs = [], []
            for i in pdf["id"]:
                i = int(i)
                luma = ((i * 29 + ff * 11 + yy * 13 + xx * 7) % 256
                        ).astype(np.uint8)
                blobs.append(encode_y4m(luma, fps))
                urls.append(f"video://corpus/{i:08d}")
            yield pd.DataFrame({"url": urls, "html": blobs})

    # few rows per clip corpus: size partitions to the data, not the
    # cluster (a 32-slot session would spin 32 Python workers for 2k
    # rows); output is a pure function of id, so the count is free to
    # vary without changing results
    parts = max(1, min(int(spark.sparkContext.defaultParallelism),
                       n // 256))
    return (spark.range(n, numPartitions=parts).mapInPandas(
        gen, schema="url string, html binary"))


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


# ------------------------------------------------------ perceptual dedup

def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash (dHash) of an HxWx3 uint8 image: luma ->
    nearest-neighbor resample to 8 rows x 9 cols -> each bit is
    gray[y, x+1] > gray[y, x]. Robust to uniform brightness shifts and
    resizing (the standard cheap perceptual fingerprint). Returned as a
    SIGNED 64-bit int so it round-trips a Spark long."""
    g = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    ys = (np.arange(8) * g.shape[0]) // 8
    xs = (np.arange(9) * g.shape[1]) // 9
    s = g[np.ix_(ys, xs)]
    bits = (s[:, 1:] > s[:, :-1]).ravel()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def image_dhash(df, bin_col: str = "html",
                key_col: str = "url"):
    """(k, sh): perceptual dHash per decodable image (BMP/PNM; rows
    that fail to decode are dropped). One Arrow-batched pandas UDF."""
    @pandas_udf("long")
    def dh(payloads: pd.Series) -> pd.Series:
        out = []
        for b in payloads:
            arr = _decode_image(bytes(b)) if b is not None else None
            out.append(dhash64(arr) if arr is not None else None)
        return pd.Series(out, dtype="object")

    return (df.select(F.col(key_col).alias("k"),
                      dh(F.col(bin_col)).alias("sh"))
            .filter(F.col("sh").isNotNull()))


def image_near_dup_pairs(
    df,
    bin_col: str = "html",
    key_col: str = "url",
    max_distance: int = 3,
    blocks: int | None = None,
):
    """Perceptual image near-dup pairs: dHash signatures fed through
    the SAME Manku pigeonhole banding + exact hamming verify as text
    SimHash (operators/dedup.simhash_candidates — recall exactly 1 by
    construction, bucket-capped star edges on pathological clusters).
    Returns (id1, id2, distance). Binary payloads are not
    SQL-replayable, so the driver check is rows-only; the dHash itself
    is pinned against a numpy reference in tests."""
    from validatelite_spark.operators.dedup import simhash_candidates

    sig = image_dhash(df, bin_col, key_col)
    return simhash_candidates(sig, max_distance=max_distance,
                              blocks=blocks)


def audio_fp64(samples: np.ndarray, rate: int = 16000) -> int:
    """64-bit spectral fingerprint of a mono clip: power spectrum ->
    65 linearly spaced bands -> each bit is band[i+1] > band[i]
    (a Haitsma-Kalker-style energy-difference hash — robust to gain,
    sensitive to pitch/content). Signed 64-bit for a Spark long."""
    spec = np.abs(np.fft.rfft(samples.astype(np.float64))) ** 2
    n = len(spec)
    edges = np.linspace(1, n, 66).astype(int)
    bands = np.array([spec[a:b].sum() if b > a else 0.0
                      for a, b in zip(edges[:-1], edges[1:])])
    h = 0
    for b in bands[1:] > bands[:-1]:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def audio_fingerprint(df, bin_col: str = "html",
                      key_col: str = "url"):
    """(k, sh): spectral fingerprint per decodable WAV clip."""
    @pandas_udf("long")
    def fp(payloads: pd.Series) -> pd.Series:
        out = []
        for b in payloads:
            dec = decode_wav(bytes(b)) if b is not None else None
            out.append(audio_fp64(dec[0], dec[1])
                       if dec is not None else None)
        return pd.Series(out, dtype="object")

    return (df.select(F.col(key_col).alias("k"),
                      fp(F.col(bin_col)).alias("sh"))
            .filter(F.col("sh").isNotNull()))


def audio_near_dup_pairs(
    df,
    bin_col: str = "html",
    key_col: str = "url",
    max_distance: int = 3,
    blocks: int | None = None,
):
    """Audio near-dup pairs: spectral fingerprints through the shared
    pigeonhole banding + exact hamming verify
    (operators/dedup.simhash_candidates). Rows-only driver check;
    fingerprint pinned vs numpy in tests."""
    from validatelite_spark.operators.dedup import simhash_candidates

    sig = audio_fingerprint(df, bin_col, key_col)
    return simhash_candidates(sig, max_distance=max_distance,
                              blocks=blocks)


def video_fp64(frames: np.ndarray) -> int:
    """64-bit temporal dHash of a luma clip shaped (T, H, W): sample 8
    evenly spaced frames, collapse each to 9 column means (nearest
    columns, rows averaged), each bit is col[t, x+1] > col[t, x] — the
    per-frame horizontal-gradient-sign family (videohash/TMK-lite),
    robust to uniform gain and resolution, sensitive to content and
    frame order. A single changed frame flips at most 8 of 64 bits.
    Signed 64-bit for a Spark long."""
    g = frames.astype(np.float64)
    ts = (np.arange(8) * g.shape[0]) // 8
    xs = (np.arange(9) * g.shape[2]) // 9
    col_means = g[ts].mean(axis=1)          # 8 sampled frames x W
    s = col_means[:, xs]                    # 8 x 9
    bits = (s[:, 1:] > s[:, :-1]).ravel()
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    return h - (1 << 64) if h >= (1 << 63) else h


def video_fingerprint(df, bin_col: str = "html",
                      key_col: str = "url"):
    """(k, sh): temporal dHash per decodable y4m clip."""
    @pandas_udf("long")
    def fp(payloads: pd.Series) -> pd.Series:
        out = []
        for b in payloads:
            dec = decode_y4m(bytes(b)) if b is not None else None
            out.append(video_fp64(dec[0]) if dec is not None else None)
        return pd.Series(out, dtype="object")

    return (df.select(F.col(key_col).alias("k"),
                      fp(F.col(bin_col)).alias("sh"))
            .filter(F.col("sh").isNotNull()))


def video_near_dup_pairs(
    df,
    bin_col: str = "html",
    key_col: str = "url",
    max_distance: int = 3,
    blocks: int | None = None,
):
    """Video near-dup pairs: temporal dHashes through the shared
    pigeonhole banding + exact hamming verify
    (operators/dedup.simhash_candidates) — the same scale shape as the
    image and audio paths. Rows-only driver check (binary codec is
    non-SQL); video_fp64 pinned vs numpy in tests."""
    from validatelite_spark.operators.dedup import simhash_candidates

    sig = video_fingerprint(df, bin_col, key_col)
    return simhash_candidates(sig, max_distance=max_distance,
                              blocks=blocks)
