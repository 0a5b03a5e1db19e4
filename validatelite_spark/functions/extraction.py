"""HTML → text extraction — the crawl-side step upstream of every rule.

The input table carries both ``html:binary`` (raw page) and
``text:string`` (extracted text); this module is the extractor that
produces the latter from the former, so the whole chain — bytes on disk
to rule decisions — is reproducible inside the engine. The north-rule
invariant is BYTE-IDENTICAL extracted text per url, pinned by
tests/test_extraction.py over every planted page class and by the
``html_extract_parity`` driver query.

Extraction semantics (a deterministic, dependency-free subset of the
usual trafilatura/jusText shape):

* ``script``/``style``/``noscript``/``template`` subtrees are dropped;
* block-level tags (p, div, li, headings, table rows, br, …) become
  newline separators; inline tags (a, b, span, …) vanish;
* character/entity references decode (``&amp;`` → ``&``);
* comments, declarations and processing instructions are dropped;
* runs of blank lines collapse; leading/trailing newlines are stripped;
  spaces inside a line are preserved EXACTLY (no token-level rewriting —
  byte-identity would be impossible otherwise).

Scale shape: one Arrow-batched pandas UDF (stdlib ``html.parser`` per
document — pure Python but linear, no backtracking regex), applied in
the same projection as the rest of the pipeline so extraction rides the
single corpus scan. The parser is html5-lenient: malformed markup
degrades to data, never raises.
"""

from __future__ import annotations

from html.parser import HTMLParser
from io import StringIO

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

#: subtrees whose text must never surface
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})

#: tags that separate text blocks (emit a newline on open AND close)
_BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "li",
    "main", "nav", "ol", "p", "pre", "section", "table", "td", "th",
    "tr", "ul",
})


class _TextExtractor(HTMLParser):
    """Streaming tag-stripper; collects text runs + block separators."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._buf = StringIO()
        self._skip = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self._buf.write("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS:
            self._buf.write("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            self._buf.write("\n")

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self._buf.write(data)

    def text(self) -> str:
        # drop blank lines (block-tag separators around empty content),
        # join the rest with single newlines; inner spaces are untouched
        # (byte-identity contract)
        return "\n".join(
            ln for ln in self._buf.getvalue().split("\n") if ln != "")


def extract_text_bytes(raw, empty_as_null: bool = True):
    """Extract text from one html payload (bytes or str) — the scalar
    core the UDF batches over; NULL/undecodable input → NULL."""
    if raw is None:
        return None
    if isinstance(raw, (bytes, bytearray, memoryview)):
        try:
            raw = bytes(raw).decode("utf-8", errors="replace")
        except Exception:
            return None
    p = _TextExtractor()
    try:
        p.feed(raw)
        p.close()
    except Exception:
        return None
    txt = p.text()
    if empty_as_null and txt == "":
        return None
    return txt


def extract_text(col: Column, empty_as_null: bool = True) -> Column:
    """Arrow-batched html→text extraction over a binary (or string)
    column. One pandas UDF — keep it in the same projection as the other
    pipeline stages so it rides the single scan."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def ex(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_text_bytes(b, empty_as_null) for b in blobs],
            dtype="object")

    return ex(col)


def extract_links(col: Column) -> Column:
    """All ``<a href="...">`` targets (double-quoted form) of an html
    STRING column, in document order — pure-Column
    ``regexp_extract_all``, engine-portable (DuckDB: same call).

    Contract is deliberately the crawler's 99% case: double-quoted
    href on an ``<a>`` tag, any attribute order before ``href``. The
    long tail (single quotes, unquoted, base-href resolution,
    javascript:) belongs to a real html parser — at that point use the
    Arrow extraction UDF (``extract_text``'s tier), not a wider regex.
    NULL html → NULL; no links → empty array."""
    return F.regexp_extract_all(col, F.lit(r'<a\s[^>]*href="([^"]*)"'), 1)


def url_host(col: Column) -> Column:
    """Lowercased host of an absolute http(s) url Column (ports and
    userinfo stripped); NULL for relative/other schemes. Mirrors the
    canonicalizer's host handling (functions/urls.py) but returns the
    bare host for graph keys."""
    h = F.regexp_extract(col, r"^[hH][tT][tT][pP][sS]?://([^/?#]+)", 1)
    h = F.lower(F.regexp_replace(F.regexp_replace(h, r"^[^@]*@", ""),
                                 r":\d+$", ""))
    return F.when(h == "", F.lit(None).cast("string")).otherwise(h)
