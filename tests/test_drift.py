"""Drift detection (operators/drift.py): PSI/KS against an
independent numpy reference, identity and shift behavior, NULL
bucketing, and plan shape (one scan per snapshot)."""

import math

import pytest
from pyspark.sql import functions as F

from validatelite_spark.operators.drift import (
    PSI_EPS,
    categorical_drift,
    drift_report,
)

BINS = 10


def _ref_psi_ks(ref_vals, new_vals, bins=BINS):
    """Independent reference implementation over raw python lists
    (None = NULL)."""
    nn_ref = [v for v in ref_vals if v is not None]
    lo, hi = min(nn_ref), max(nn_ref)

    def bin_of(v):
        if v is None:
            return -1
        if hi - lo <= 0:
            return 0
        return max(0, min(bins - 1,
                          math.floor((v - lo) / (hi - lo) * bins)))

    cr = {k: 0 for k in range(-1, bins)}
    cn = {k: 0 for k in range(-1, bins)}
    for v in ref_vals:
        cr[bin_of(v)] += 1
    for v in new_vals:
        cn[bin_of(v)] += 1
    tr, tn = sum(cr.values()), sum(cn.values())
    psi = 0.0
    for k in range(-1, bins):
        pr = (cr[k] + PSI_EPS) / (tr + (bins + 1) * PSI_EPS)
        pn = (cn[k] + PSI_EPS) / (tn + (bins + 1) * PSI_EPS)
        psi += (pr - pn) * math.log(pr / pn)
    nnr = tr - cr[-1]
    nnn = tn - cn[-1]
    ks, acc_r, acc_n = 0.0, 0, 0
    for k in range(0, bins):
        acc_r += cr[k]
        acc_n += cn[k]
        if nnr and nnn:
            ks = max(ks, abs(acc_r / nnr - acc_n / nnn))
    return (round(psi + 1e-9, 6), round(ks + 1e-9, 6),
            nnr, nnn, cr[-1], cn[-1])


@pytest.fixture(scope="module")
def frames(spark):
    ref_vals = [float(10 + (i * 7) % 90) for i in range(200)] \
        + [None] * 8
    new_vals = [float(30 + (i * 11) % 60) for i in range(120)] \
        + [None] * 2
    mk = lambda vals: spark.createDataFrame(  # noqa: E731
        [(v,) for v in vals], "x double")
    return mk(ref_vals), mk(new_vals), ref_vals, new_vals


class TestDriftReport:
    def test_matches_reference(self, spark, frames):
        ref, new, rv, nv = frames
        r = drift_report(ref, new, ["x"]).first()
        psi, ks, nnr, nnn, nulr, nuln = _ref_psi_ks(rv, nv)
        assert (r["psi"], r["ks"]) == (psi, ks)
        assert (r["n_ref"], r["n_new"]) == (nnr, nnn)
        assert (r["null_ref"], r["null_new"]) == (nulr, nuln)

    def test_identity_near_zero(self, spark, frames):
        ref = frames[0]
        r = drift_report(ref, ref, ["x"]).first()
        assert r["psi"] < 1e-6
        assert r["ks"] < 1e-6

    def test_shift_detected(self, spark, frames):
        ref = frames[0]
        shifted = ref.select((F.col("x") + 40).alias("x"))
        r = drift_report(ref, shifted, ["x"]).first()
        assert r["psi"] > 0.25  # major-shift territory
        assert r["ks"] > 0.3

    def test_multi_col_single_scan_each(self, spark, frames):
        ref, new = frames[0], frames[1]
        ref2 = ref.select("x", (F.col("x") * 2).alias("y"))
        new2 = new.select("x", (F.col("x") * 2).alias("y"))
        out = drift_report(ref2, new2, ["x", "y"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one scan per snapshot (ranges are inlined literals)
        assert plan.count("Scan ExistingRDD") == 2
        assert out.count() == 2

    def test_guards(self, spark, frames):
        with pytest.raises(ValueError):
            drift_report(frames[0], frames[1], [])
        with pytest.raises(ValueError):
            drift_report(frames[0], frames[1], ["x"], bins=1)


class TestCategoricalDrift:
    def test_proportions_and_terms(self, spark):
        ref = spark.createDataFrame(
            [("a",)] * 60 + [("b",)] * 30 + [(None,)] * 10,
            "g string")
        new = spark.createDataFrame(
            [("a",)] * 20 + [("c",)] * 80, "g string")
        rows = {r["category"]: r for r in
                categorical_drift(ref, new, "g").collect()}
        assert set(rows) == {"a", "b", "c", None}
        ncat = 4
        tr, tn = 100, 100
        pa_r = (60 + PSI_EPS) / (tr + ncat * PSI_EPS)
        pa_n = (20 + PSI_EPS) / (tn + ncat * PSI_EPS)
        assert rows["a"]["p_ref"] == round(pa_r + 1e-9, 6)
        assert rows["a"]["psi_term"] == round(
            (pa_r - pa_n) * math.log(pa_r / pa_n) + 1e-9, 6)
        # category only in new: cnt_ref 0, still a row
        assert rows["c"]["cnt_ref"] == 0 and rows["c"]["cnt_new"] == 80
        # NULL category tracked
        assert rows[None]["cnt_ref"] == 10
