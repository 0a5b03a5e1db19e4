"""Unicode text normalization — the fix-text stage a web pipeline runs
before any tokenization or hashing (mojibake-adjacent cleanup; without
it, dedup fingerprints and token counts split on invisible byte
differences).

Steps, each engine-portable and DuckDB-replayable:

1. **NFC normalization** — composes e + combining-accent into é etc.;
   the one step Spark SQL cannot express natively, so it runs as an
   Arrow-batched pandas UDF over ``unicodedata.normalize`` (identical
   to DuckDB's ``nfc_normalize`` — Unicode normalization is specified
   bit-exactly, parity pinned in tests).
2. **control-char strip** — C0 controls except \\t \\n \\r, plus DEL.
3. **zero-width strip** — ZWSP/ZWNJ/ZWJ/BOM.
4. **quote/dash unification** — curly quotes → ASCII, en/em-dash → '-'.
5. **whitespace collapse** — runs of spaces/tabs → one space, trimmed
   per line (newlines preserved — line structure feeds line_dedup).

NULL → NULL. The reference has no text-normalization surface (its
values pass through typed comparisons untouched); this is a
training-data operator.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: zero-width + BOM code points, as a Java/RE2-safe class
_ZW = "​‌‍﻿"
_CTRL = "".join(chr(c) for c in range(0x00, 0x20)
                if chr(c) not in "\t\n\r") + "\x7f"
_QUOTES = {"‘": "'", "’": "'", "“": '"', "”": '"',
           "–": "-", "—": "-"}


def _nfc_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    return nfc


def normalize_text(col: Column) -> Column:
    """Steps 2-5 (pure Column — codegen); NFC is applied separately by
    ``normalize_docs`` so the scalar form stays UDF-free for use inside
    fused rule scans where NFC is not required."""
    out = F.translate(col, _CTRL + _ZW, "")
    for src, dst in _QUOTES.items():
        out = F.translate(out, src, dst)
    out = F.regexp_replace(out, "[ \\t]+", " ")
    out = F.regexp_replace(out, " ?\\n ?", "\n")
    return F.trim(out)


def normalize_docs(df: DataFrame, text_col: str = "text",
                   nfc: bool = True) -> DataFrame:
    """Replace ``text_col`` with its normalized form (full chain incl.
    NFC when ``nfc=True`` — ONE Arrow round-trip, then the Column
    steps; the UDF is applied first so composed characters are in
    canonical form before the character-class passes)."""
    c = F.col(text_col)
    if nfc:
        c = _nfc_udf()(c)
    return df.withColumn(text_col, normalize_text(c))


def duckdb_normalize_sql(expr: str) -> str:
    """DuckDB replay of ``normalize_docs`` (NFC via nfc_normalize —
    bit-exact vs unicodedata by the Unicode spec)."""
    # \x00 is omitted from the ORACLE list only: DuckDB's parser
    # rejects NUL in any string literal (it cannot appear in a DuckDB
    # varchar at all), so the Spark-side NUL strip has no DuckDB
    # counterpart to diverge from
    zw_ctrl = (_CTRL + _ZW).replace("\x00", "")
    u = f"nfc_normalize({expr})"
    # DuckDB translate deletes chars mapped past the target string's
    # length, same as Spark
    u = f"translate({u}, e'{_sql_escape(zw_ctrl)}', '')"
    for src, dst in _QUOTES.items():
        d = dst.replace("'", "''")
        u = f"translate({u}, e'{_sql_escape(src)}', '{d}')"
    u = f"regexp_replace({u}, '[ \\t]+', ' ', 'g')"
    u = f"regexp_replace({u}, ' ?\\n ?', e'\\n', 'g')"
    return f"trim({u})"


def _sql_escape(s: str) -> str:
    """Escape characters for a DuckDB e'' string literal. DuckDB's
    e-strings take \\xNN for control bytes but NOT \\uXXXX — non-ASCII
    code points are emitted raw (the connection is UTF-8)."""
    out = []
    for ch in s:
        if ch == "'":
            out.append("''")
        elif ch == "\\":
            out.append("\\\\")
        elif ord(ch) < 0x20 or ord(ch) == 0x7f:
            out.append("\\x%02x" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)
