"""Validator edge cases the registry query can't show: missing columns,
unsafe identifiers, empty-table freshness."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_etl_spark.validate import ValidationSpec, safe_identifier, validate


def _report_dict(report):
    return {(r["check_name"], r["column_name"]): r["status"] for r in report.collect()}


def test_missing_mandatory_and_pk_columns_fail(spark):
    df = spark.createDataFrame([(1, "Y")], ["a", "flag"])
    spec = ValidationSpec(
        min_rows=1,
        mandatory_columns=("a", "missing_col"),
        flag_columns=("flag",),
        pk_column="also_missing",
    )
    statuses = _report_dict(validate(spark, df, spec))
    assert statuses[("mandatory_column", "a")] == "PASS"
    assert statuses[("mandatory_column", "missing_col")] == "FAIL"
    assert statuses[("pk_unique", "also_missing")] == "FAIL"
    assert statuses[("flag_domain", "flag")] == "PASS"


def test_min_rows_and_freshness_fail_on_empty(spark):
    df = spark.createDataFrame([], "k long, d timestamp")
    spec = ValidationSpec(min_rows=1, freshness=("d", F.lit("2024-01-01").cast("timestamp")))
    statuses = _report_dict(validate(spark, df, spec))
    assert statuses[("min_rows", None)] == "FAIL"
    assert statuses[("freshness", "d")] == "FAIL"


def test_identifier_safety():
    assert safe_identifier("fact_sales_dw")
    assert safe_identifier("COL$1#x")
    assert not safe_identifier("bad name")
    assert not safe_identifier("drop;table")
    assert not safe_identifier("")
    assert not safe_identifier("x" * 129)
