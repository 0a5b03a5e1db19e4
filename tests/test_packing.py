"""Sequence packing (operators/packing.py): placement against an
independent pure-Python reference, partition-count invariance, split
semantics, and the stats aggregate."""

import pytest
from pyspark.sql import functions as F

from validatelite_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)

L = 100


def _ref_pack(rows, seq_len):
    """Independent reference: rows = [(key, tok)] sorted by key;
    returns {key: (start, first, last, n_seqs, offset)}."""
    out, start = {}, 0
    for k, tok in sorted(rows):
        first = start // seq_len
        last = first if tok <= 0 else (start + tok - 1) // seq_len
        out[k] = (start, first, last, last - first + 1, start % seq_len)
        start += tok
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, 1 + (i * 37) % 150) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, tok long"), rows


class TestPackSequences:
    def test_matches_reference(self, spark, docs):
        df, rows = docs
        got = {r["doc_id"]: (r["seq_start"], r["first_seq"],
                             r["last_seq"], r["n_seqs"], r["seq_offset"])
               for r in pack_sequences(
                   df, L, "tok", order_col="doc_id",
                   key_col="doc_id").collect()}
        assert got == _ref_pack(rows, L)

    def test_partition_count_invariance(self, spark, docs):
        df, rows = docs
        a = sorted(map(tuple, pack_sequences(
            df.repartition(1), L, "tok", order_col="doc_id",
            key_col="doc_id").collect()))
        b = sorted(map(tuple, pack_sequences(
            df.repartition(13), L, "tok", order_col="doc_id",
            key_col="doc_id", n_buckets=7).collect()))
        assert a == b

    def test_split_doc_spans_windows(self, spark):
        # 3 docs of 70 tokens into L=100: doc1 spans windows 0-1
        df = spark.createDataFrame(
            [(0, 70), (1, 70), (2, 70)], "doc_id long, tok long")
        got = {r["doc_id"]: (r["first_seq"], r["last_seq"], r["n_seqs"])
               for r in pack_sequences(
                   df, 100, "tok", order_col="doc_id",
                   key_col="doc_id").collect()}
        assert got == {0: (0, 0, 1), 1: (0, 1, 2), 2: (1, 2, 2)}

    def test_zero_token_doc_no_span(self, spark):
        # a zero-token doc exactly at a boundary stays in ONE window
        df = spark.createDataFrame(
            [(0, 100), (1, 0), (2, 50)], "doc_id long, tok long")
        got = {r["doc_id"]: (r["first_seq"], r["last_seq"], r["n_seqs"])
               for r in pack_sequences(
                   df, 100, "tok", order_col="doc_id",
                   key_col="doc_id").collect()}
        assert got[1] == (1, 1, 1)
        assert got[2] == (1, 1, 1)

    def test_grouped_streams_independent(self, spark):
        df = spark.createDataFrame(
            [(0, "a", 80), (1, "b", 80), (2, "a", 80), (3, "b", 30)],
            "doc_id long, g string, tok long")
        got = {r["doc_id"]: r["seq_start"] for r in pack_sequences(
            df, 100, "tok", order_col="doc_id", key_col="doc_id",
            by="g").collect()}
        assert got == {0: 0, 1: 0, 2: 80, 3: 80}

    def test_bad_seq_len(self, spark, docs):
        with pytest.raises(ValueError):
            pack_sequences(docs[0], 0, "tok")


class TestPackingStats:
    def test_global_stats(self, spark, docs):
        df, rows = docs
        ref = _ref_pack(rows, L)
        total = sum(t for _, t in rows)
        nseq = max(v[2] for v in ref.values()) + 1
        split = sum(1 for v in ref.values() if v[3] > 1)
        r = packing_stats(df, L, "tok", order_col="doc_id",
                          key_col="doc_id").first()
        assert (r["n_docs"], r["total_tokens"], r["n_sequences"],
                r["split_docs"], r["tail_padding"]) == (
            len(rows), total, nseq, split, nseq * L - total)

    def test_grouped_stats_rowcount(self, spark):
        df = spark.createDataFrame(
            [(i, "ab"[i % 2], 40) for i in range(10)],
            "doc_id long, g string, tok long")
        out = packing_stats(df, 100, "tok", order_col="doc_id",
                            key_col="doc_id", by="g")
        rows = {r["g"]: r for r in out.collect()}
        assert set(rows) == {"a", "b"}
        assert all(r["total_tokens"] == 200 for r in rows.values())
        assert all(r["n_sequences"] == 2 for r in rows.values())
