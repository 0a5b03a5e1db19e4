"""Unicode normalization stage (functions/normalize.py): expected
forms, DuckDB replay parity, idempotence."""

from __future__ import annotations

import duckdb

from validatelite_spark.functions.normalize import (duckdb_normalize_sql,
                                                    normalize_docs)

CASES = [
    ("café", "café"),                      # NFC composition
    ("a​b‌ c﻿", "a‍b c".replace("‍", "")
     if False else "ab c"),                      # zero-widths stripped
    ("‘hi’ “there” – ok", "'hi' \"there\" - ok"),
    ("a\x01b\x07c", "abc"),                      # C0 controls (NUL is
    # Spark-only: DuckDB cannot represent it — see duckdb_normalize_sql)
    ("keep\ttabs? no:  a\tb", "keep tabs? no: a b"),
    ("  line one  \n  line two  ", "line one\nline two"),
    ("", ""),
    (None, None),
]


class TestNormalize:
    def test_expected_forms(self, spark):
        df = spark.createDataFrame([(i, u) for i, (u, _) in
                                    enumerate(CASES)],
                                   "i long, text string")
        got = {r["i"]: r["text"]
               for r in normalize_docs(df).collect()}
        for i, (_, want) in enumerate(CASES):
            assert got[i] == want, (i, got[i], want)

    def test_duckdb_replay_matches(self, spark):
        df = spark.createDataFrame([(i, u) for i, (u, _) in
                                    enumerate(CASES)],
                                   "i long, text string")
        got = sorted((r["i"], r["text"])
                     for r in normalize_docs(df).collect())
        con = duckdb.connect()
        sql = duckdb_normalize_sql("t")
        duck = sorted(
            (i, con.execute(f"SELECT {sql} FROM (SELECT ? AS t)",
                            [u]).fetchone()[0] if u is not None
             else None)
            for i, (u, _) in enumerate(CASES))
        assert got == duck

    def test_idempotent(self, spark):
        df = spark.createDataFrame([(i, u) for i, (u, _) in
                                    enumerate(CASES)],
                                   "i long, text string")
        once = normalize_docs(df)
        twice = normalize_docs(once)
        assert sorted(map(tuple, once.collect())) == \
            sorted(map(tuple, twice.collect()))
