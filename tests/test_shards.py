from __future__ import annotations

import hashlib

import pytest

from validatelite_spark.operators.shards import (
    assign_shards, shard_manifest, write_shards)


def _h60(key: str, seed: int = 42) -> int:
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)


def _expected_shards(rows, target, seed=42):
    """Single-threaded reference: sort by (hash, key), cut on the
    pre-doc running total."""
    ordered = sorted(rows, key=lambda r: (_h60(str(r[0]), seed), str(r[0])))
    out, pre = {}, 0
    for k, tok in ordered:
        out[k] = pre // target
        pre += tok or 0
    return out


class TestAssignShards:
    def test_matches_reference_cut(self, spark):
        rows = [(i, 10 + (i * 7) % 50) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, tok long")
        got = {r.doc_id: r.shard_id for r in assign_shards(
            df, 300, "tok", "doc_id").collect()}
        assert got == _expected_shards(rows, 300)

    def test_partition_count_invariance(self, spark):
        rows = [(i, 25) for i in range(100)]
        a = assign_shards(spark.createDataFrame(rows, "doc_id long, tok long")
                          .repartition(1), 100, "tok", "doc_id")
        b = assign_shards(spark.createDataFrame(rows, "doc_id long, tok long")
                          .repartition(13), 100, "tok", "doc_id", n_buckets=7)
        assert ({(r.doc_id, r.shard_id) for r in a.collect()}
                == {(r.doc_id, r.shard_id) for r in b.collect()})

    def test_null_tokens_weigh_zero(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, 50), (3, None), (4, 50)],
            "doc_id long, tok long")
        got = assign_shards(df, 60, "tok", "doc_id").collect()
        assert all(r.shard_id is not None for r in got)
        ref = _expected_shards([(1, 0), (2, 50), (3, 0), (4, 50)], 60)
        assert {r.doc_id: r.shard_id for r in got} == ref

    def test_oversized_doc_gets_one_shard(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (2, 1000), (3, 10)], "doc_id long, tok long")
        got = {r.doc_id: r.shard_id for r in assign_shards(
            df, 100, "tok", "doc_id").collect()}
        assert got == _expected_shards([(1, 10), (2, 1000), (3, 10)], 100)
        assert len(set(got.values())) >= 2

    def test_explicit_order_col(self, spark):
        df = spark.createDataFrame(
            [(1, 30, 3), (2, 30, 1), (3, 30, 2)],
            "doc_id long, tok long, pos long")
        got = {r.doc_id: r.shard_id for r in assign_shards(
            df, 60, "tok", "doc_id", order_col="pos").collect()}
        # pos order: 2,3,1 -> pre 0,30,60 -> shards 0,0,1
        assert got == {2: 0, 3: 0, 1: 1}

    def test_bad_target(self, spark):
        df = spark.createDataFrame([(1, 1)], "doc_id long, tok long")
        with pytest.raises(ValueError):
            assign_shards(df, 0, "tok", "doc_id")


class TestShardManifest:
    def test_counts_and_checksum(self, spark):
        rows = [(i, 10) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, tok long")
        assigned = assign_shards(df, 100, "tok", "doc_id")
        man = shard_manifest(assigned, "tok", "doc_id").collect()
        assert sum(r.n_docs for r in man) == 40
        assert sum(r.n_tokens for r in man) == 400
        # checksum is order-independent: recompute per shard in python
        by_shard = {}
        for r in assigned.collect():
            by_shard.setdefault(r.shard_id, []).append(r.doc_id)
        for r in man:
            assert int(r.checksum) == sum(
                int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
                for d in by_shard[r.shard_id])

    def test_manifest_detects_drop(self, spark):
        df = spark.createDataFrame(
            [(i, 10) for i in range(20)], "doc_id long, tok long")
        a = assign_shards(df, 1000, "tok", "doc_id")
        full = shard_manifest(a, "tok", "doc_id").collect()[0]
        tampered = shard_manifest(
            a.filter("doc_id <> 7"), "tok", "doc_id").collect()[0]
        assert full.checksum != tampered.checksum
        assert full.n_docs == tampered.n_docs + 1


class TestWriteShards:
    def test_one_file_per_shard(self, spark, tmp_path):
        import glob
        df = spark.createDataFrame(
            [(i, 10) for i in range(60)], "doc_id long, tok long")
        assigned = assign_shards(df, 150, "tok", "doc_id")
        n_shards = assigned.select("shard_id").distinct().count()
        out = str(tmp_path / "shards")
        write_shards(assigned, out)
        dirs = glob.glob(f"{out}/shard_id=*")
        assert len(dirs) == n_shards
        for d in dirs:
            assert len(glob.glob(f"{d}/part-*.parquet")) == 1
        back = spark.read.parquet(out)
        assert back.count() == 60
        assert {r.doc_id for r in back.collect()} == set(range(60))


class TestKnownBoundsPath:
    def test_no_stats_scan_and_identical_output(self, spark):
        from pyspark.sql import functions as F

        from validatelite_spark.operators.sampling import prefix_sums
        rows = [(i, 10 + (i * 7) % 50) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, tok long")
        # known-bounds path: no min/max aggregate in the plan
        a = assign_shards(df, 300, "tok", "doc_id")
        plan = a._jdf.queryExecution().executedPlan().toString()
        assert "partial_max" not in plan
        assert {(r.doc_id, r.shard_id) for r in a.collect()} \
            == set(_expected_shards(rows, 300).items())
        # prefix_sums: bounded vs measured bucketing agree exactly
        base = df.withColumn("__g", F.lit(0))
        m = prefix_sums(base, "tok", "__g", order_col="doc_id",
                        key_col="doc_id")
        k = prefix_sums(base, "tok", "__g", order_col="doc_id",
                        key_col="doc_id", order_bounds=(0, 200))
        assert ({(r["doc_id"], r["__pre"]) for r in m.collect()}
                == {(r["doc_id"], r["__pre"]) for r in k.collect()})

    def test_bad_bounds(self, spark):
        from pyspark.sql import functions as F

        from validatelite_spark.operators.sampling import prefix_sums
        df = spark.createDataFrame([(1, 1)], "doc_id long, tok long") \
            .withColumn("__g", F.lit(0))
        with pytest.raises(ValueError):
            prefix_sums(df, "tok", "__g", order_col="doc_id",
                        key_col="doc_id", order_bounds=(5, 5))


class TestVerifyShards:
    def test_clean_and_tampered(self, spark):
        from validatelite_spark.operators.shards import verify_shards
        df = spark.createDataFrame(
            [(i, 10) for i in range(40)], "doc_id long, tok long")
        assigned = assign_shards(df, 100, "tok", "doc_id")
        man = shard_manifest(assigned, "tok", "doc_id")
        clean = verify_shards(assigned, man, "tok", "doc_id").collect()
        assert all(r.ok for r in clean)
        # drop one doc: exactly its shard flips to not-ok
        victim = assigned.collect()[0]
        tampered = verify_shards(
            assigned.filter(f"doc_id <> {victim.doc_id}"),
            man, "tok", "doc_id").collect()
        bad = [r for r in tampered if not r.ok]
        assert [r.shard_id for r in bad] == [victim.shard_id]
        # swap a doc between shards: both shards flip, totals equal
        from pyspark.sql import functions as F
        swapped = assigned.withColumn(
            "shard_id",
            F.when(F.col("doc_id") == victim.doc_id,
                   (F.col("shard_id") + 1)).otherwise(F.col("shard_id")))
        t2 = verify_shards(swapped, man, "tok", "doc_id").collect()
        assert sum(1 for r in t2 if not r.ok) >= 2

    def test_missing_shard_reported(self, spark):
        from validatelite_spark.operators.shards import verify_shards
        df = spark.createDataFrame(
            [(i, 10) for i in range(20)], "doc_id long, tok long")
        assigned = assign_shards(df, 50, "tok", "doc_id")
        man = shard_manifest(assigned, "tok", "doc_id")
        first = assigned.select("shard_id").distinct().collect()[0][0]
        rep = verify_shards(assigned.filter(f"shard_id <> {first}"),
                            man, "tok", "doc_id").collect()
        gone = [r for r in rep if r.shard_id == first]
        assert len(gone) == 1 and not gone[0].ok
        assert gone[0].n_docs is None and gone[0].m_docs is not None
