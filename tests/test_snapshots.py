"""Snapshot delta (operators/snapshots.py): status classification,
NULL semantics, within-snapshot duplicate collapse."""

import pytest


@pytest.fixture()
def snaps(spark):
    old = spark.createDataFrame([
        ("u1", "same text"),
        ("u2", "old version"),
        ("u3", "will vanish"),
        ("u5", None),
        ("u6", None),
        ("u7", "dup"), ("u7", "dup"),
    ], "url string, text string")
    new = spark.createDataFrame([
        ("u1", "Same   TEXT "),          # normalizes equal -> unchanged
        ("u2", "new version"),           # changed
        ("u4", "brand new"),             # new
        ("u5", None),                    # null == null -> unchanged
        ("u6", "now has text"),          # null -> text = changed
        ("u7", "dup"),                   # dups collapse -> unchanged
    ], "url string, text string")
    return old, new


class TestSnapshotDelta:
    def test_statuses(self, spark, snaps):
        from validatelite_spark.operators.snapshots import snapshot_delta
        old, new = snaps
        got = {r["url"]: r["status"]
               for r in snapshot_delta(old, new).collect()}
        assert got == {"u1": "unchanged", "u2": "changed", "u3": "gone",
                       "u4": "new", "u5": "unchanged", "u6": "changed",
                       "u7": "unchanged"}

    def test_report(self, spark, snaps):
        from validatelite_spark.operators.snapshots import \
            snapshot_delta_report
        old, new = snaps
        got = {r["status"]: r["n"]
               for r in snapshot_delta_report(old, new).collect()}
        assert got == {"unchanged": 3, "changed": 2, "gone": 1, "new": 1}

    def test_conflicting_dups_collapse_to_min(self, spark):
        # two different texts under one key in the SAME snapshot must
        # reduce deterministically (min fingerprint) on both sides
        from validatelite_spark.operators.snapshots import snapshot_delta
        old = spark.createDataFrame(
            [("u", "alpha"), ("u", "beta")], "url string, text string")
        new = spark.createDataFrame(
            [("u", "beta"), ("u", "alpha")], "url string, text string")
        (r,) = snapshot_delta(old, new).collect()
        assert r["status"] == "unchanged"
