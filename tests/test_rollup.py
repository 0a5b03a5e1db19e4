"""Hierarchical time rollup: level composition + single-scan plan."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from validatelite_spark.operators.rollup import time_rollup


def _events(spark):
    rows = [
        (datetime(2024, 1, 1, 0, 10), 1.0),
        (datetime(2024, 1, 1, 0, 40), 2.0),
        (datetime(2024, 1, 1, 5, 0), 4.0),
        (datetime(2024, 1, 2, 3, 0), 8.0),
        (datetime(2024, 2, 1, 0, 0), 16.0),
    ]
    return spark.createDataFrame(rows, "ts timestamp, value double")


class TestTimeRollup:
    def test_levels_compose(self, spark):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        out = {(r["gran"], r["bucket"]): r for r in time_rollup(
            _events(spark), "ts", "value",
            granularities=("hour", "day", "month")).collect()}
        assert out[("hour", "2024-01-01 00:00:00")]["sum_value"] == 3.0
        assert out[("hour", "2024-01-01 00:00:00")]["n"] == 2
        assert out[("day", "2024-01-01 00:00:00")]["sum_value"] == 7.0
        assert out[("day", "2024-01-01 00:00:00")]["max_value"] == 4.0
        assert out[("month", "2024-01-01 00:00:00")]["sum_value"] == 15.0
        assert out[("month", "2024-02-01 00:00:00")]["n"] == 1
        # row counts per level: 4 hours, 3 days, 2 months
        grans = [g for g, _ in out]
        assert (grans.count("hour"), grans.count("day"),
                grans.count("month")) == (4, 3, 2)

    def test_week_does_not_feed_month(self, spark):
        """ISO weeks straddle month boundaries: Mon 2024-01-29 and Thu
        2024-02-01 share a week, so a month level naively re-aggregated
        from the week level would merge them into January (ADVICE r2).
        The month level must come from a nesting source instead."""
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        rows = [(datetime(2024, 1, 29, 12, 0), 2.0),
                (datetime(2024, 2, 1, 12, 0), 1.0)]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        out = {(r["gran"], r["bucket"]): r["sum_value"] for r in time_rollup(
            df, "ts", "value", granularities=("week", "month")).collect()}
        # one straddling week bucket, but months must stay separate
        assert out[("week", "2024-01-29 00:00:00")] == 3.0
        assert out[("month", "2024-01-01 00:00:00")] == 2.0
        assert out[("month", "2024-02-01 00:00:00")] == 1.0

    def test_day_feeds_week_and_month(self, spark):
        """day nests into both week and month — both derive from the
        cached day aggregate and totals stay per-unit-correct."""
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        rows = [(datetime(2024, 1, 29, 1, 0), 2.0),
                (datetime(2024, 1, 29, 23, 0), 4.0),
                (datetime(2024, 2, 1, 12, 0), 1.0)]
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        out = {(r["gran"], r["bucket"]): r["sum_value"] for r in time_rollup(
            df, "ts", "value",
            granularities=("day", "week", "month")).collect()}
        assert out[("day", "2024-01-29 00:00:00")] == 6.0
        assert out[("week", "2024-01-29 00:00:00")] == 7.0
        assert out[("month", "2024-01-01 00:00:00")] == 6.0
        assert out[("month", "2024-02-01 00:00:00")] == 1.0

    def test_coarse_levels_reuse_finest(self, spark):
        """Day/month branches read the cached hour aggregate, not the
        source — the source relation appears once under the cache."""
        df = _events(spark)
        plan = (time_rollup(df, "ts", "value")
                ._jdf.queryExecution().optimizedPlan().toString())
        assert plan.count("InMemoryRelation") >= 3  # all levels hit cache
        # the raw LocalRelation feeds ONLY the cached aggregate, so it
        # does not appear in the union branches themselves
        assert "LocalRelation" not in plan.split("InMemoryRelation")[0]
