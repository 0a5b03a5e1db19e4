"""WARC (Web ARChive, ISO 28500) ingestion — the Common-Crawl wire
format, parsed with a pure-stdlib reader over Spark's binaryFile
source.

A crawl-scale corpus arrives as WARC files (~1 GB each, gzip members
per record); the quality pipeline's real entry point is
``read_warc(spark, "s3://.../segment/*.warc.gz")`` → a DataFrame in
exactly the input_hint shape (url, warc_ts, html binary, ...). The
format is simple and public: each record is

    WARC/1.0\\r\\n
    <Name>: <value>\\r\\n ...          (WARC headers)
    \\r\\n
    <Content-Length bytes of block>\\r\\n\\r\\n

and a ``response`` record's block is an HTTP response (status line +
headers + \\r\\n\\r\\n + body); the body is the page payload. A .gz
WARC is a concatenation of independent gzip members (one per record),
which ``gzip.decompress`` handles natively.

Scale shape: ``binaryFile`` assigns ONE FILE PER TASK (no splitting)
— the natural WARC parallelism unit, since gzip members can't be
sought into without a CDX index; 1000 executors chew a segment of
~60k files evenly. Parsing runs in ``mapInPandas`` (Arrow-batched;
one Python pass per file, emitted in bounded chunks so a 1 GB file
never materializes as one giant Arrow batch). The 2 GB binaryFile
cap matches the WARC convention (files are rotated at ~1 GB). For
payload-seekable scale-out beyond that, pair with CDX offset indexes
and a range-read source — out of scope here, noted for the cluster.

Reference: the reference reads CSV/Excel/JSON/DB only
(shared/database/query_executor.py, cli/core/data_validator.py); WARC
has no analogue there — it exists for the Common-Crawl mandate
(BASELINE.json input_hint).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: rows per emitted Arrow batch while parsing one file
_CHUNK_ROWS = 2_000

WARC_SCHEMA = ("warc_file string, rec_type string, url string, "
               "warc_ts string, content_type string, status int, "
               "payload binary")


def _split_headers(block: bytes) -> tuple[dict, bytes]:
    """(case-folded header dict, remainder after the blank line)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return {}, b""
    headers = {}
    for line in block[:sep].split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
    return headers, block[sep + 4:]


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield raw records from one (decompressed) WARC byte string.

    Tolerant of trailing garbage: parsing stops at the first
    malformed record boundary instead of raising — a truncated crawl
    file yields its complete prefix."""
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos:pos + 5] == b"WARC/":
            return  # malformed tail
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        headers, _ = _split_headers(data[pos:head_end + 4])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        block_start = head_end + 4
        if block_start + clen > n:
            return  # truncated block
        yield {"headers": headers,
               "block": data[block_start:block_start + clen]}
        pos = block_start + clen


def _http_payload(block: bytes) -> tuple[int | None, str | None,
                                         bytes]:
    """(status, content-type, body) from an HTTP response block."""
    line_end = block.find(b"\r\n")
    status = None
    if line_end > 0 and block[:5] in (b"HTTP/",):
        parts = block[:line_end].split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    headers, body = _split_headers(block)
    return status, headers.get("content-type"), body


def _maybe_decompress(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)  # multi-member-safe
    return data


def records_from_file(path: str, data: bytes,
                      record_types: tuple) -> Iterator[tuple]:
    for rec in parse_warc(_maybe_decompress(data)):
        h = rec["headers"]
        rtype = h.get("warc-type", "")
        if record_types and rtype not in record_types:
            continue
        if rtype == "response":
            status, ctype, body = _http_payload(rec["block"])
        else:
            status, ctype, body = None, h.get("content-type"), \
                rec["block"]
        yield (path, rtype, h.get("warc-target-uri"),
               h.get("warc-date"), ctype, status, body)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple = ("response",),
) -> DataFrame:
    """DataFrame of WARC records under ``path`` (glob ok): columns
    ``warc_file, rec_type, url, warc_ts, content_type, status,
    payload`` — for ``response`` records the payload is the HTTP BODY
    (the html bytes), matching the input_hint shape after a rename."""
    import pandas as pd  # module scope would also work; local is fine

    bf = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    rts = tuple(record_types)
    cols = ["warc_file", "rec_type", "url", "warc_ts",
            "content_type", "status", "payload"]

    def gen(batches):
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for tup in records_from_file(path_, bytes(content),
                                             rts):
                    rows.append(tup)
                    if len(rows) >= _CHUNK_ROWS:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return bf.mapInPandas(gen, WARC_SCHEMA)


# ---------------------------------------------------------------- #
# deterministic fixture synthesis (tests + oracle queries)
# ---------------------------------------------------------------- #

def build_record(rtype: str, url: str | None, date: str,
                 block: bytes, content_type: str | None = None,
                 rec_id: str = "<urn:uuid:0>") -> bytes:
    h = [b"WARC/1.0",
         b"WARC-Type: " + rtype.encode(),
         b"WARC-Date: " + date.encode(),
         b"WARC-Record-ID: " + rec_id.encode()]
    if url is not None:
        h.append(b"WARC-Target-URI: " + url.encode())
    if content_type is not None:
        h.append(b"Content-Type: " + content_type.encode())
    h.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(h) + b"\r\n\r\n" + block + b"\r\n\r\n"


def build_response_record(url: str, date: str, body: bytes,
                          content_type: str = "text/html; "
                          "charset=utf-8") -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode()
            + b"\r\nContent-Length: " + str(len(body)).encode()
            + b"\r\n\r\n" + body)
    return build_record(
        "response", url, date, http,
        content_type="application/http; msgtype=response")


def write_warc(path: str, records: list[bytes],
               compress: bool = False) -> None:
    """Write records to one WARC file — deterministically (gzip mtime
    pinned to 0, one member per record like real crawlers emit)."""
    info = build_record("warcinfo", None,
                        "2024-01-01T00:00:00Z",
                        b"software: vlite-spark-fixture\r\n",
                        content_type="application/warc-fields")
    with open(path, "wb") as f:
        for rec in [info] + list(records):
            if compress:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb",
                                   mtime=0) as gz:
                    gz.write(rec)
                f.write(buf.getvalue())
            else:
                f.write(rec)
