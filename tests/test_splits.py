"""Leakage-safe splitting (operators/splits.py): group atomicity,
determinism under repartition, NULL-group handling, weight validation,
and the leakage audit."""

import pytest

from validatelite_spark.operators.splits import (
    leakage_safe_split,
    split_leakage,
    split_summary,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"dom{i % 17}.com" if i % 23 else None, i * 3)
            for i in range(400)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long")


def test_group_atomic(docs):
    out = leakage_safe_split(docs, "source").select("source", "split")
    per_group = (out.distinct().groupBy("source").count().collect())
    assert all(r["count"] == 1 for r in per_group)


def test_leakage_empty_by_construction(docs):
    assert split_leakage(
        leakage_safe_split(docs, "source"), "source").count() == 0


def test_null_group_single_split(docs):
    splits = (leakage_safe_split(docs, "source")
              .filter("source IS NULL").select("split").distinct()
              .collect())
    assert len(splits) == 1


def test_partition_invariance(docs):
    a = sorted(map(tuple, leakage_safe_split(docs, "source")
                   .select("doc_id", "split").collect()))
    b = sorted(map(tuple,
                   leakage_safe_split(docs.repartition(7), "source")
                   .select("doc_id", "split").collect()))
    assert a == b


def test_summary_covers_all(docs):
    s = split_summary(docs, "source", size_col="n_chars").collect()
    assert sum(r.n_docs for r in s) == 400
    assert sum(r.size for r in s) == sum(i * 3 for i in range(400))


def test_weights_must_sum_to_one(docs):
    with pytest.raises(ValueError):
        leakage_safe_split(docs, "source",
                           weights={"train": 0.5, "test": 0.4})


def test_union_of_seeds_leaks(docs):
    u = (leakage_safe_split(docs, "source", seed=0)
         .unionByName(leakage_safe_split(docs, "source", seed=1)))
    leaks = split_leakage(u, "source").collect()
    # different seeds reshuffle domains; at least one of 18 groups
    # (17 domains + NULL) moves — and every reported row is genuine
    assert leaks
    for r in leaks:
        assert r.n_splits == len(r.splits) > 1
