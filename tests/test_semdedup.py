"""SemDeDup semantic dedup: Lloyd-path parity vs an independent numpy
reference, skew-cap conservatism, NULL handling, partition invariance.

The LSH mode and the iters=0 kmeans mode are additionally replayed
end-to-end by the DuckDB oracles (`semantic_dedup`,
`semantic_dedup_kmeans` in __spark_entry__.py); these tests cover what
the oracles cannot — the Lloyd-refined centroid path and the guards.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from validatelite_spark.operators.semdedup import (bucket_mean_centroids,
                                                   bucket_sizes,
                                                   semdedup_assign,
                                                   semdedup_flags,
                                                   semdedup_keep)


def _rhu(x, r=6):
    """Spark F.round semantics: HALF_UP (half away from zero)."""
    m = 10.0 ** r
    x = np.asarray(x, dtype=np.float64)
    return np.where(x >= 0, np.floor(x * m + 0.5),
                    np.ceil(x * m - 0.5)) / m


def _ref_semdedup(vecs, ids, k, iters, eps, r=6):
    """Independent reference of the kmeans-mode pipeline: first-k seed,
    Lloyd with python-round(+1e-12) per iteration (kmeans_centroids),
    final argmax-dot assignment, bucket-mean ranking centroids with
    HALF_UP rounding (bucket_mean_centroids uses F.round), dominance at
    rounded cosine >= eps with (centroid_sim ASC, id ASC) rank."""
    vecs = np.asarray(vecs, dtype=np.float64)
    order = np.argsort(ids)
    cents = np.array([vecs[order[i]] for i in range(k)])
    for _ in range(iters):
        buckets = (vecs @ cents.T).argmax(axis=1)
        nxt = cents.copy()
        for b in range(k):
            members = vecs[buckets == b]
            if len(members):
                nxt[b] = [round(m + 1e-12, r)
                          for m in members.mean(axis=0)]
        cents = nxt
    buckets = (vecs @ cents.T).argmax(axis=1)
    rank_cents = {}
    for b in set(buckets.tolist()):
        rank_cents[b] = _rhu(vecs[buckets == b].mean(axis=0) + 1e-12, r)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    csim = np.array([
        float(_rhu(vecs[i] @ rank_cents[buckets[i]]
                   / (norms[i] * np.sqrt((rank_cents[buckets[i]] ** 2)
                                         .sum()))))
        for i in range(len(vecs))])
    kept = {}
    for i in range(len(vecs)):
        dropped = False
        for j in range(len(vecs)):
            if i == j or buckets[i] != buckets[j]:
                continue
            better = (csim[j] < csim[i]
                      or (csim[j] == csim[i] and ids[j] < ids[i]))
            if not better:
                continue
            cos = float(_rhu(vecs[i] @ vecs[j] / (norms[i] * norms[j])))
            if cos >= eps:
                dropped = True
                break
        kept[ids[i]] = not dropped
    return buckets, csim, kept


@pytest.fixture(scope="module")
def corpus(spark):
    """120 vectors in 8 dims: 30 bases + near-duplicate perturbations,
    deterministic seed — forces real within-cluster drops."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((30, 8))
    rows = []
    i = 0
    for b in base:
        for _ in range(4):
            v = b + rng.standard_normal(8) * 0.05
            rows.append((i, [float(x) for x in v]))
            i += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, rows


class TestLloydParity:
    def test_kmeans_lloyd_matches_numpy_reference(self, corpus):
        df, rows = corpus
        ids = [r[0] for r in rows]
        vecs = [r[1] for r in rows]
        k, iters, eps = 4, 2, 0.9
        got = {r["id"]: (r["bucket"], r["centroid_sim"], r["kept"])
               for r in semdedup_flags(df, eps=eps, mode="kmeans",
                                       n_clusters=k, iters=iters)
               .collect()}
        buckets, csim, kept = _ref_semdedup(vecs, ids, k, iters, eps)
        assert len(got) == len(ids)
        for pos, i in enumerate(ids):
            assert got[i][0] == buckets[pos], f"bucket mismatch id={i}"
            assert got[i][1] == pytest.approx(csim[pos], abs=2e-6)
            assert got[i][2] == kept[i], f"kept mismatch id={i}"

    def test_near_duplicates_actually_dropped(self, corpus):
        df, rows = corpus
        flags = semdedup_flags(df, eps=0.9, mode="kmeans",
                               n_clusters=4, iters=2)
        n_kept = flags.filter("kept").count()
        # 30 bases x 4 near-copies at eps=0.9: the copies collapse to
        # ~one survivor per base (a couple of cross-base semantic
        # merges can dip it slightly below 30 — that is the algorithm
        # working, not over-deletion)
        assert 20 <= n_kept <= 40


class TestGuards:
    def test_max_cluster_size_keeps_oversized_whole(self, corpus):
        df, _ = corpus
        capped = semdedup_flags(df, eps=0.9, mode="kmeans", n_clusters=4,
                                iters=2, max_cluster_size=5)
        sizes = {r["bucket"]: r["n"]
                 for r in bucket_sizes(df, mode="kmeans", n_clusters=4,
                                       iters=2).collect()}
        # every bucket in this corpus exceeds the cap -> nothing dropped
        assert all(n > 5 for n in sizes.values())
        assert capped.filter("NOT kept").count() == 0

    def test_null_vectors_kept_verbatim(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)],
            "vec_id long, embedding array<double>")
        flags = {r["id"]: r for r in
                 semdedup_flags(df, eps=0.99, mode="kmeans", n_clusters=1,
                                iters=1).collect()}
        assert flags[3]["kept"] and flags[3]["bucket"] is None
        # the identical pair: exactly one survives
        assert sorted([flags[1]["kept"], flags[2]["kept"]]) == [False, True]

    def test_keep_matches_flags(self, corpus):
        df, _ = corpus
        kw = dict(eps=0.9, mode="kmeans", n_clusters=4, iters=2)
        kept_ids = {r["id"] for r in semdedup_flags(df, **kw)
                    .filter("kept").collect()}
        got = {r["vec_id"] for r in semdedup_keep(df, **kw).collect()}
        assert got == kept_ids

    def test_unknown_mode_raises(self, corpus):
        df, _ = corpus
        with pytest.raises(ValueError):
            semdedup_assign(df, mode="cosine").collect()


class TestInvariance:
    def test_partition_count_invariance_lsh(self, corpus):
        df, _ = corpus
        kw = dict(eps=0.8, mode="lsh", n_planes=4, dim=8)
        one = sorted(map(tuple, semdedup_flags(
            df.repartition(1), **kw).collect()))
        many = sorted(map(tuple, semdedup_flags(
            df.repartition(7), **kw).collect()))
        assert one == many

    def test_bucket_mean_centroids_shape(self, corpus):
        df, _ = corpus
        assigned = semdedup_assign(df, mode="lsh", n_planes=4, dim=8)
        cents = bucket_mean_centroids(assigned).collect()
        assert all(len(r["centroid"]) == 8 for r in cents)
        n_buckets = assigned.select("bucket").distinct().count()
        assert len(cents) == n_buckets


class TestCentroidSimilarity:
    def test_matches_numpy(self, spark):
        import numpy as np
        from validatelite_spark.operators.similarity import \
            centroid_similarity
        rng = {0: [[1.0, 0.0], [0.8, 0.2]],
               1: [[0.0, 1.0], [0.2, 0.8]],
               2: [[1.0, 1.0]]}
        rows = [(lab, [float(x) for x in v])
                for lab, vs in rng.items() for v in vs]
        df = spark.createDataFrame(rows, "label int, embedding array<float>")
        got = {(r["l1"], r["l2"]): r["cos"]
               for r in centroid_similarity(df).collect()}
        cents = {k: np.mean(np.array(v, dtype=np.float64)
                            .astype(np.float32).astype(np.float64), axis=0)
                 for k, v in rng.items()}
        for (a, b), c in got.items():
            ca, cb = cents[a], cents[b]
            want = round(float(ca @ cb / (np.linalg.norm(ca)
                                          * np.linalg.norm(cb))) + 1e-9, 6)
            assert c == pytest.approx(want, abs=2e-6)
        assert set(got) == {(0, 1), (0, 2), (1, 2)}
        assert got[(0, 2)] > got[(0, 1)]

    def test_null_rows_dropped(self, spark):
        from validatelite_spark.operators.similarity import \
            centroid_similarity
        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (None, [1.0, 1.0]),
             (0, None)],
            "label int, embedding array<float>")
        out = centroid_similarity(df).collect()
        assert len(out) == 1


class TestEmbeddingDecontaminate:
    def _dfs(self, spark):
        # bench vec + a near-copy (cos ~0.9999), an orthogonal vec,
        # and an anti-parallel vec
        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0], 10),
             (2, [0.999, 0.001, 0.0], 11),
             (3, [0.0, 1.0, 0.0], 12),
             (4, [-1.0, 0.0, 0.0], 13)],
            "vec_id long, embedding array<double>, label int")
        bench = corpus.filter("vec_id = 1")
        return corpus, bench

    def test_keep_drops_near_copies(self, spark):
        from validatelite_spark.operators.similarity import (
            embedding_decontaminate)
        corpus, bench = self._dfs(spark)
        kept = {r.vec_id for r in embedding_decontaminate(
            corpus, bench, threshold=0.95).collect()}
        assert kept == {3, 4}  # 1 self-matches, 2 is a paraphrase-dup

    def test_report_scores(self, spark):
        from validatelite_spark.operators.similarity import (
            embedding_decontaminate)
        corpus, bench = self._dfs(spark)
        rep = {r.vec_id: r.max_score for r in embedding_decontaminate(
            corpus, bench, threshold=0.95, mode="report").collect()}
        assert rep[1] == 1.0
        assert 0.999 < rep[2] <= 1.0
        assert 3 not in rep and 4 not in rep

    def test_bad_mode(self, spark):
        from validatelite_spark.operators.similarity import (
            embedding_decontaminate)
        corpus, bench = self._dfs(spark)
        import pytest as _pt
        with _pt.raises(ValueError):
            embedding_decontaminate(corpus, bench, mode="purge")


class TestKernelJoinParity:
    """r06 optimization pin: the per-bucket _max_prior_cos kernel must
    reproduce the within-bucket candidate-join + pure-Column cosine
    fold it replaced, bit-for-bit, on the real embeddings corpus."""

    def test_kernel_equals_join_shape(self, spark):
        from validatelite_spark.operators.semdedup import (
            _max_prior_cos, semdedup_assign, bucket_mean_centroids)
        from validatelite_spark.operators.similarity import _dot, _norm

        emb = (spark.read.parquet(
            "/root/testdata/sf0.01/embeddings.parquet")
            .withColumn("embedding",
                        F.col("embedding").cast("array<double>")))
        assigned = semdedup_assign(emb, mode="lsh", n_planes=6, dim=64)
        cents = bucket_mean_centroids(assigned)
        sims = (assigned.join(F.broadcast(cents), "bucket")
                .select("id", "bucket", "v",
                        F.round(_dot(F.col("v"), F.col("centroid"))
                                / (_norm(F.col("v"))
                                   * _norm(F.col("centroid"))),
                                6).alias("centroid_sim")))
        ranked = sims.select("id", "bucket", "centroid_sim", "v")
        eps = 0.3

        # kernel path
        new_dropped = {r["id"] for r in _max_prior_cos(ranked)
                       .filter(F.round(F.col("max_cos"), 6) >= eps)
                       .collect()}

        # the old join shape, reconstructed literally
        rk = ranked.select("id", "bucket", "centroid_sim")
        p = rk.select(F.col("id").alias("pid"), "bucket",
                      F.col("centroid_sim").alias("psim"))
        q = rk.select(F.col("id").alias("qid"),
                      F.col("bucket").alias("qb"),
                      F.col("centroid_sim").alias("qsim"))
        cand = (p.join(q, (p["bucket"] == q["qb"])
                       & ((q["qsim"] < p["psim"])
                          | ((q["qsim"] == p["psim"])
                             & (q["qid"] < p["pid"]))))
                .select("pid", "qid"))
        pv = assigned.select(F.col("id").alias("pid"),
                             F.col("v").alias("pv"),
                             _norm(F.col("v")).alias("pn"))
        qv = assigned.select(F.col("id").alias("qid"),
                             F.col("v").alias("qv"),
                             _norm(F.col("v")).alias("qn"))
        d = _dot(F.col("pv"), F.col("qv")) / (F.col("pn") * F.col("qn"))
        old_dropped = {r["pid"] for r in
                       cand.join(pv, "pid").join(qv, "qid")
                       .filter(F.round(d, 6) >= eps)
                       .select("pid").distinct().collect()}

        assert new_dropped == old_dropped
