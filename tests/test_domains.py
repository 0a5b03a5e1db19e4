"""Domain-level quality prior (operators/domains.py)."""

from __future__ import annotations

from validatelite_spark.operators.domains import (domain_quality_filter,
                                                  domain_stats)


def _corpus(spark):
    rows = []
    # good.example: avg 0.8 over 10 docs; bad.example: avg 0.2;
    # mid.example: 0.5; tiny.example: 1 doc (below min_docs=2)
    for i in range(10):
        rows.append((i, "good.example", 0.8))
        rows.append((100 + i, "bad.example", 0.2))
        rows.append((200 + i, "mid.example", 0.5))
    rows.append((300, "tiny.example", 0.0))
    rows.append((301, None, 0.9))
    rows.append((302, None, 0.9))
    return spark.createDataFrame(
        rows, "doc_id long, source string, score double")


class TestDomainStats:
    def test_report(self, spark):
        got = {r["domain"]: (r["n_docs"], r["avg_score"])
               for r in domain_stats(_corpus(spark), "score").collect()}
        assert got["good.example"] == (10, 0.8)
        assert got["bad.example"] == (10, 0.2)
        assert got[None] == (2, 0.9)


class TestDomainQualityFilter:
    def test_bottom_quantile_domains_dropped(self, spark):
        df = _corpus(spark)
        kept = domain_quality_filter(df, "score", q=0.3, min_docs=2)
        srcs = {r["source"] for r in kept.collect()}
        # judged domains (>=2 docs): bad(0.2) mid(0.5) good(0.8)
        # NULL(0.9); q=0.3 quantile of [0.2,0.5,0.8,0.9] = 0.47 → bad
        # drops; tiny.example (1 doc) passes through unjudged
        assert srcs == {"good.example", "mid.example", "tiny.example",
                        None}
        n = kept.count()
        assert n == 10 + 10 + 1 + 2

    def test_keep_small_false_drops_unjudged(self, spark):
        df = _corpus(spark)
        kept = domain_quality_filter(df, "score", q=0.3, min_docs=2,
                                     keep_small=False)
        srcs = {r["source"] for r in kept.collect()}
        assert "tiny.example" not in srcs

    def test_all_domains_judged_q_zero_keeps_all(self, spark):
        df = _corpus(spark)
        kept = domain_quality_filter(df, "score", q=0.0)
        assert kept.count() == df.count()

    def test_partition_invariance(self, spark):
        df = _corpus(spark)
        a = sorted(r["doc_id"] for r in
                   domain_quality_filter(df, "score", q=0.3).collect())
        b = sorted(r["doc_id"] for r in
                   domain_quality_filter(df.repartition(7), "score",
                                         q=0.3).collect())
        assert a == b


class TestBlocklistFilter:
    def _hosts(self, spark):
        rows = [
            (0, "a.example.com"),      # blocked by example.com
            (1, "example.com"),        # exact match
            (2, "notexample.com"),     # label boundary: NOT blocked
            (3, "x.y.bad.org"),        # deep subdomain of bad.org
            (4, "good.org"),           # clean
            (5, "s1.d2.net"),          # exact 3-label entry
            (6, "s2.d2.net"),          # sibling: NOT blocked
            (7, "evil"),               # 1-label entry, exact
            (8, "sub.evil"),           # under 1-label entry
        ]
        return spark.createDataFrame(rows, "doc_id long, host string")

    BL = ["example.com", "bad.org", "s1.d2.net", "evil"]

    def test_drop_semantics(self, spark):
        from validatelite_spark.operators.domains import (
            domain_blocklist_filter,
        )
        kept = domain_blocklist_filter(self._hosts(spark), self.BL,
                                       "host", "doc_id", mode="drop")
        assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4, 6]

    def test_report_mode_is_complement(self, spark):
        from validatelite_spark.operators.domains import (
            domain_blocklist_filter,
        )
        df = self._hosts(spark)
        blocked = domain_blocklist_filter(df, self.BL, "host",
                                          "doc_id", mode="report")
        assert sorted(r["doc_id"] for r in blocked.collect()) == \
            [0, 1, 3, 5, 7, 8]

    def test_blocklist_as_dataframe(self, spark):
        from validatelite_spark.operators.domains import (
            domain_blocklist_filter,
        )
        bl = spark.createDataFrame([(d,) for d in self.BL], "d string")
        kept = domain_blocklist_filter(self._hosts(spark), bl,
                                       "host", "doc_id")
        assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4, 6]

    def test_deep_entry_only_exact_beyond_cap(self, spark):
        from validatelite_spark.operators.domains import (
            domain_blocklist_filter,
        )
        # entry deeper than max_labels: exact host still blocked,
        # sub-host of it escapes (documented cap)
        deep = "a.b.c.d.e.f.g"
        df = spark.createDataFrame(
            [(0, deep), (1, "x." + deep)], "doc_id long, host string")
        kept = domain_blocklist_filter(df, [deep], "host", "doc_id",
                                       max_labels=3)
        assert sorted(r["doc_id"] for r in kept.collect()) == [1]

    def test_bad_mode(self, spark):
        from validatelite_spark.operators.domains import (
            domain_blocklist_filter,
        )
        import pytest as _pt
        with _pt.raises(ValueError):
            domain_blocklist_filter(self._hosts(spark), self.BL,
                                    "host", "doc_id", mode="nope")
