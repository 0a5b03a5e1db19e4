"""Bloom membership index (operators/bloom.py): no false negatives,
safe-direction errors only, NULL-text contract, packing correctness."""

import pytest

from validatelite_spark.operators.bloom import (
    BLOCK_BITS,
    bloom_build,
    bloom_filter_new,
    bloom_probe,
    bloom_stats,
)


@pytest.fixture(scope="module")
def halves(spark):
    old = spark.createDataFrame(
        [(i, f"history doc number {i} with some words") for i in range(200)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        # 0..49: exact re-crawls of history docs; 50..99 genuinely new;
        # 100: NULL text
        [(1000 + i, f"history doc number {i} with some words")
         for i in range(50)]
        + [(1100 + i, f"fresh doc number {i} never seen") for i in range(50)]
        + [(1200, None)],
        "doc_id long, text string")
    return old, new


def test_no_false_negatives(spark, halves):
    old, new = halves
    bloom = bloom_build(old, m_bits=1 << 20)
    got = {r.doc_id: r.maybe_member
           for r in bloom_probe(new, bloom, m_bits=1 << 20).collect()}
    for i in range(50):  # every true duplicate IS flagged — guaranteed
        assert got[1000 + i] is True
    assert got[1200] is False  # NULL text: no fingerprint, kept


def test_fp_rate_bounded_at_large_m(spark, halves):
    old, new = halves
    bloom = bloom_build(old, m_bits=1 << 20)
    kept = bloom_filter_new(new, bloom, m_bits=1 << 20)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    # at m=2^20 / n=200 / k=3 the fp rate is ~2e-10: every fresh doc
    # and the NULL row survive; every re-crawl is dropped
    assert ids == {1100 + i for i in range(50)} | {1200}


def test_whitespace_normalized_fingerprint(spark):
    old = spark.createDataFrame([(1, "hello   world")],
                                "doc_id long, text string")
    new = spark.createDataFrame([(2, "  HELLO WORLD ")],
                                "doc_id long, text string")
    bloom = bloom_build(old)
    assert bloom_probe(new, bloom).collect()[0].maybe_member is True


def test_packing_matches_position_set(spark, halves):
    old, _ = halves
    bloom = bloom_build(old, m_bits=1 << 12)
    from validatelite_spark.operators.bloom import _positions
    want = {p.pos for p in
            _positions(old, "text", "doc_id", 1 << 12, 3).collect()}
    got = set()
    for r in bloom.collect():
        for b in range(BLOCK_BITS):
            if r.bits & (1 << b):
                got.add(r.block * BLOCK_BITS + b)
    assert got == want


def test_stats(spark, halves):
    old, _ = halves
    m = 1 << 12
    s = bloom_stats(bloom_build(old, m_bits=m), m_bits=m).collect()[0]
    assert 0 < s.set_bits <= 600  # 200 docs * 3 hashes, minus collisions
    assert abs(s.fill_ratio - round(s.set_bits / m + 1e-9, 6)) < 1e-9
    assert s.est_fp_rate == round((s.set_bits / m) ** 3 + 1e-9, 6)
