"""PageRank (operators/linkgraph.py) vs an independent pure-Python
power-iteration reference: exact (rounded) rank equality, dangling
mass, self-loop/dup cleaning, partition invariance."""

import pytest


def ref_pagerank(edges, damping=0.85, iters=10):
    e = {(s, d) for s, d in edges if s != d and s is not None
         and d is not None}
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    out = {}
    for s, d in e:
        out.setdefault(s, []).append(d)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r[v] for v in nodes if v not in out)
        nxt = {v: 0.0 for v in nodes}
        for s, ds in out.items():
            share = r[s] / len(ds)
            for d in ds:
                nxt[d] += share
        r = {v: (1 - damping) / n + damping * (nxt[v] + dang / n)
             for v in nodes}
    return {v: round(r[v] + 1e-9, 6) for v in nodes}


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
         ("d", "c"), ("c", "d"), ("e", "a"),  # e has in-degree 0
         ("f", "g")]                          # g is dangling


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string")


class TestPagerank:
    def test_matches_reference(self, spark, edges_df):
        from validatelite_spark.operators.linkgraph import pagerank
        got = {r["node"]: r["rank"]
               for r in pagerank(edges_df, iters=10).collect()}
        assert got == ref_pagerank(EDGES, iters=10)

    def test_mass_conserved(self, spark, edges_df):
        from validatelite_spark.operators.linkgraph import pagerank
        ranks = [r["rank"] for r in pagerank(edges_df, iters=8).collect()]
        assert abs(sum(ranks) - 1.0) < 1e-4

    def test_self_loops_and_dups_cleaned(self, spark):
        from validatelite_spark.operators.linkgraph import pagerank
        noisy = EDGES + [("a", "a"), ("a", "b"), ("a", "b")]
        df = spark.createDataFrame(noisy, "src string, dst string")
        got = {r["node"]: r["rank"] for r in pagerank(df, 0.85, 6).collect()}
        assert got == ref_pagerank(EDGES, iters=6)

    def test_partition_count_invariance(self, spark, edges_df):
        from validatelite_spark.operators.linkgraph import pagerank
        a = {r["node"]: r["rank"]
             for r in pagerank(edges_df.repartition(1), iters=6).collect()}
        b = {r["node"]: r["rank"]
             for r in pagerank(edges_df.repartition(13), iters=6).collect()}
        assert a == b

    def test_bad_args(self, spark, edges_df):
        from validatelite_spark.operators.linkgraph import pagerank
        with pytest.raises(ValueError):
            pagerank(edges_df, damping=1.5)
        with pytest.raises(ValueError):
            pagerank(edges_df, iters=0)


class TestSynthHostEdges:
    def test_deterministic_and_replayable(self, spark):
        from validatelite_spark.operators.linkgraph import synth_host_edges
        docs = spark.createDataFrame(
            [(d,) for d in "abcde" for _ in range(3)], "source string")
        got = sorted((r["src"], r["dst"])
                     for r in synth_host_edges(docs).collect())
        doms = sorted("abcde")
        want = sorted((doms[i], doms[(i * 7 + j) % 5])
                      for i in range(5) for j in (1, 2, 3))
        assert got == want


class TestHostEdges:
    def test_extraction_and_aggregation(self, spark):
        from validatelite_spark.operators.linkgraph import host_edges
        rows = [
            ("https://a.com/p1",
             '<p>x</p><a href="https://b.com/x">t</a>'
             '<a class="z" href="https://b.com/y">u</a>'
             '<a href="https://a.com/self">self</a>'
             '<a href="/relative">r</a>'),
            ("https://a.com/p2", '<a href="HTTP://B.com:8080/z">c</a>'),
            ("https://c.org/", "<p>no links at all</p>"),
            (None, '<a href="https://b.com/q">orphan</a>'),
        ]
        df = spark.createDataFrame(rows, "url string, html string")
        got = {(r.src, r.dst): r.n_links
               for r in host_edges(df).collect()}
        # a.com -> b.com counted 3x (2 from p1, 1 port-stripped/cased
        # from p2); self and relative links dropped; null url dropped
        assert got == {("a.com", "b.com"): 3}

    def test_binary_html_and_self_kept(self, spark):
        from validatelite_spark.operators.linkgraph import host_edges
        df = spark.createDataFrame(
            [("https://a.com/", bytearray(
                b'<a href="https://a.com/x">s</a>'
                b'<a href="https://d.net/">d</a>'))],
            "url string, html binary")
        got = {(r.src, r.dst): r.n_links
               for r in host_edges(df, drop_self=False).collect()}
        assert got == {("a.com", "a.com"): 1, ("a.com", "d.net"): 1}

    def test_feeds_pagerank(self, spark):
        from validatelite_spark.operators.linkgraph import (
            host_edges, pagerank)
        df = spark.createDataFrame(
            [("https://a.com/", '<a href="https://b.com/">x</a>'),
             ("https://b.com/", '<a href="https://a.com/">y</a>'),
             ("https://c.org/", '<a href="https://a.com/">z</a>')],
            "url string, html string")
        ranks = {r.node: r.rank for r in pagerank(
            host_edges(df), iters=8).collect()}
        assert set(ranks) == {"a.com", "b.com", "c.org"}
        # c has no inlinks -> floor rank; the a<->b cycle holds the
        # rest (their mutual order still oscillates at finite iters)
        assert min(ranks["a.com"], ranks["b.com"]) > ranks["c.org"]
        assert abs(sum(ranks.values()) - 1.0) < 1e-4
