"""The parity harness itself must be dtype-strict.

CORRECTNESS_r05's one red row (heavy_hitter_maintenance) shipped with a
green local parity suite because the old cell canonicalization compared
with Python ``==``, where ``2.0 == 2`` — an int64-vs-float64 surface
divergence was invisible locally while the driver's representation-
sensitive hash failed. These tests pin the harness's authority over the
driver gate: numerically-equal-but-differently-typed surfaces must FAIL
(VERDICT r5 next-steps #2)."""

from __future__ import annotations

from decimal import Decimal

import pandas as pd

from tests.parity import compare


class _FakeSparkDF:
    """Minimal stand-in: compare() only calls .toPandas()."""

    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf


def test_int_vs_float_column_fails():
    spark_side = pd.DataFrame({"k": ["a", "b"], "cnt": pd.array([2, 3], dtype="int64")})
    oracle_side = pd.DataFrame({"k": ["a", "b"], "cnt": pd.array([2.0, 3.0], dtype="float64")})
    result = compare("dtype_guard", _FakeSparkDF(spark_side), oracle_side)
    assert not result.ok
    assert any("dtype-kind mismatch" in i for i in result.issues)


def test_identical_frames_pass():
    a = pd.DataFrame({"k": ["a", "b"], "cnt": pd.array([2, 3], dtype="int64")})
    b = pd.DataFrame({"k": ["b", "a"], "cnt": pd.array([3, 2], dtype="int64")})
    result = compare("order_free", _FakeSparkDF(a), b)
    assert result.ok, str(result)


def test_int_vs_float_inside_array_cell_fails():
    """Array columns are object-dtyped on both sides, so the per-column
    dtype check cannot see inside — the cell canonicalization must."""
    spark_side = pd.DataFrame({"k": ["a"], "xs": [[1, 2]]})
    oracle_side = pd.DataFrame({"k": ["a"], "xs": [[1.0, 2.0]]})
    result = compare("array_guard", _FakeSparkDF(spark_side), oracle_side)
    assert not result.ok


def test_decimal_vs_float_cell_fails():
    """A Decimal reaching the surface violates the decimals-as-double
    boundary convention; it must not silently compare equal to a float."""
    spark_side = pd.DataFrame({"v": [1.5]})
    oracle_side = pd.DataFrame({"v": [Decimal("1.5")]})
    result = compare("decimal_guard", _FakeSparkDF(spark_side), oracle_side)
    assert not result.ok


def test_bool_vs_int_cell_fails():
    spark_side = pd.DataFrame({"v": pd.array([True, False], dtype="bool")})
    oracle_side = pd.DataFrame({"v": pd.array([1, 0], dtype="int64")})
    result = compare("bool_guard", _FakeSparkDF(spark_side), oracle_side)
    assert not result.ok


def test_value_difference_still_fails():
    a = pd.DataFrame({"cnt": pd.array([2], dtype="int64")})
    b = pd.DataFrame({"cnt": pd.array([4], dtype="int64")})
    result = compare("value_guard", _FakeSparkDF(a), b)
    assert not result.ok


def test_float_deviation_diagnostic_survives_tagging():
    """The near-miss diagnostic must still see through the (kind, value)
    cell tags: a tiny float drift reports a nonzero max relative dev."""
    a = pd.DataFrame({"v": [1.0, 2.0]})
    b = pd.DataFrame({"v": [1.0, 2.0 + 1e-9]})
    result = compare("float_dev", _FakeSparkDF(a), b)
    assert not result.ok
    dev_lines = [i for i in result.issues if "max rel float dev" in i]
    assert dev_lines and "0.000e+00" not in dev_lines[0], result.issues


def test_signed_zero_cell_fails():
    """IEEE -0.0 == 0.0 in Python but the driver hash distinguishes the
    bit patterns (SCALE.md signed-zero trap: Spark round() can produce
    +0.0 where DuckDB round() produces -0.0). The harness must fail."""
    a = pd.DataFrame({"v": [0.0]})
    b = pd.DataFrame({"v": [-0.0]})
    result = compare("zero_guard", _FakeSparkDF(a), b)
    assert not result.ok


def test_equal_positive_zeros_pass():
    a = pd.DataFrame({"v": [0.0, 1.5]})
    b = pd.DataFrame({"v": [1.5, 0.0]})
    result = compare("zero_ok", _FakeSparkDF(a), b)
    assert result.ok, str(result)


def test_nan_vs_null_object_cell_fails():
    """NaN must not canonicalize to None (ADVICE r6): in object-dtyped
    columns (arrays, mixed surfaces) a Spark NULL vs an oracle NaN is
    representation-distinct to the driver's hash, so it must fail here.
    Array cells keep both sides object-dtyped, dodging pandas' own
    NULL-as-NaN conflation inside float64 columns."""
    spark_side = pd.DataFrame({"k": ["a"], "xs": [[1.0, None]]})
    oracle_side = pd.DataFrame({"k": ["a"], "xs": [[1.0, float("nan")]]})
    result = compare("nan_guard", _FakeSparkDF(spark_side), oracle_side)
    assert not result.ok


def test_equal_nans_pass():
    """Two NaNs must compare equal to each other (nan != nan under
    Python ==, so the canonical tag has to be a comparable sentinel)."""
    a = pd.DataFrame({"k": ["a"], "xs": [[float("nan"), 2.0]]})
    b = pd.DataFrame({"k": ["a"], "xs": [[float("nan"), 2.0]]})
    result = compare("nan_ok", _FakeSparkDF(a), b)
    assert result.ok, str(result)
