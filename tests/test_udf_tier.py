"""udf_tier function tests — ports of the reference's registered SQLite
functions (reference: shared/database/sqlite_functions.py:11-174)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from validatelite_spark.functions import udf_tier


@pytest.fixture(scope="module")
def vals(spark):
    rows = [
        (1, "123", "12.34"), (2, "12345", "123.456"), (3, "abc", "abc"),
        (4, None, None), (5, "12.5", "0.01"), (6, "-42", "-1.5"),
    ]
    return spark.createDataFrame(rows, "id long, iv string, fv string")


def _failed_ids(df, pred):
    return sorted(r["id"] for r in df.filter(pred).select("id").collect())


class TestIntegerDigits:
    def test_detect_invalid_integer_digits(self, spark, vals):
        # max 3 digits: '12345' too long; 'abc' non-numeric; '12.5'
        # fractional; NULL passes (reference: sqlite_functions.py:11-46)
        pred = udf_tier.invalid_integer_digits(F.col("iv"), 3)
        assert _failed_ids(vals, pred) == [2, 3, 5]

    def test_negative_uses_abs(self, spark, vals):
        pred = udf_tier.invalid_integer_digits(F.col("iv"), 2)
        assert 6 not in _failed_ids(vals, pred)  # abs(-42) has 2 digits


class TestFloatPrecision:
    def test_detect_invalid_float_precision(self, spark, vals):
        # float(4,2): '123.456' → 3 int digits > 4-2, 3 dec > 2; 'abc' bad
        pred = udf_tier.invalid_float_precision(F.col("fv"), 4, 2)
        assert _failed_ids(vals, pred) == [2, 3]

    def test_null_passes(self, spark, vals):
        pred = udf_tier.invalid_float_precision(F.col("fv"), 10, 5)
        assert 4 not in _failed_ids(vals, pred)


class TestStringLength:
    def test_native_length_check(self, spark, vals):
        pred = udf_tier.invalid_string_length(F.col("iv"), 3)
        assert _failed_ids(vals, pred) == [2, 5]  # '12345', '12.5' exceed 3


class TestRegexEngines:
    def test_python_vs_java_agree_on_common_subset(self, spark, vals):
        pat = r"^-?[0-9]+$"
        py = _failed_ids(vals, udf_tier.regex_fail(F.col("iv"), pat))
        jv = _failed_ids(vals, udf_tier.regex_fail_native(F.col("iv"), pat))
        # python: NULL not failed; java native: same NULL guard
        assert py == jv == [3, 5]
