"""The four named retail pipelines (dynamic_etl_spark/pipelines/retail.py)
— the reference's DAGs as a user-callable surface (VERDICT r8 #8). The
inline e2e composition lives in tests/test_pipeline_e2e.py; this suite
drives the FACTORIES, including the two-day incremental story the
wall-clock-scheduled reference only gets implicitly."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dynamic_etl_spark.pipelines import (

    dw_load_pipeline,
    extract_pipeline,
    generation_pipeline,
    retail_daily_run,
    validation_pipeline,
)

pytestmark = pytest.mark.slow  # fast-tier skip (FULL_SUITE=1 runs it) — VERDICT r13 #7: the
# default `pytest tests/` run must finish inside the driver budget; this
# file is long-tail wall time (streaming/stress/e2e composites), fully
# covered by the round-start FULL_SUITE run.


SCRATCH = Path(__file__).resolve().parent.parent / ".tmp" / "retail_pipelines"


@pytest.fixture()
def scratch():
    shutil.rmtree(SCRATCH, ignore_errors=True)
    SCRATCH.mkdir(parents=True)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_retail_daily_two_day_cycle(spark, scratch):
    """Day 1 bootstraps everything; day 2 continues: fact surrogates
    continue from the high-water mark, Current rotates to Archive, the
    DW fact grain stays unique, and the queue marks files processed."""
    root = str(scratch)
    r1 = retail_daily_run(
        spark, root, date_id=20240617,
        n_stores=20, n_products=30, n_distributors=10, rows_per_day=200,
    )
    assert set(r1) == {
        "retail_daily_generation", "retail_daily_extract",
        "retail_daily_validation", "retail_target_dw_load",
    }
    assert r1["retail_daily_generation"].outputs["fact_sales"] == 200
    name1, dw_rows1 = r1["retail_target_dw_load"].outputs["load_fact_sales"]
    assert name1 is not None and dw_rows1 > 0

    src_fact = spark.read.parquet(str(scratch / "source" / "fact_sales"))
    hwm1 = src_fact.agg(F.max("sales_id")).collect()[0][0]

    r2 = retail_daily_run(
        spark, root, date_id=20240618,
        n_stores=20, n_products=30, n_distributors=10, rows_per_day=200,
    )
    src_fact = spark.read.parquet(str(scratch / "source" / "fact_sales"))
    # day 2 continued the surrogate sequence past day 1's high-water mark
    day2_min = (
        src_fact.filter(F.col("date_id") == 20240618)
        .agg(F.min("sales_id")).collect()[0][0]
    )
    assert day2_min > hwm1
    assert src_fact.count() == 400

    # extract rotated day 1's file out of Current
    current = scratch / "extract" / "Current"
    archive = scratch / "extract" / "Archive"
    assert any("20240618" in p.name for p in current.iterdir())
    assert any("20240617" in p.name for p in archive.iterdir())
    # the archive smoke task saw the rotated file
    assert r2["retail_daily_extract"].outputs["read_archive"] > 0

    # DW fact grain unique after two loads
    dw = spark.read.parquet(str(scratch / "dw" / "fact_sales_dw"))
    grain = ["date_id", "store_id", "product_id", "distributor_id"]
    assert dw.count() == dw.select(*grain).distinct().count()
    name2, dw_rows2 = r2["retail_target_dw_load"].outputs["load_fact_sales"]
    assert name2 is not None and dw_rows2 >= dw_rows1


def test_generation_precondition_probe(spark, scratch):
    """A date_id past the calendar horizon fails the fact step by name —
    the reference's SystemExit probe (fact_sales_daily.py:22-33): the
    fact generator must refuse to run when dim_date generation hasn't
    caught up to today."""
    pipe = generation_pipeline(
        spark, str(scratch / "source"), date_id=20240617,
        n_stores=5, n_products=5, n_distributors=5, rows_per_day=10,
        calendar_end="2024-06-10",
    )
    with pytest.raises(RuntimeError, match="failed at step 'fact_sales'"):
        pipe.run()


def test_validation_gate_fails_on_thin_fact(spark, scratch):
    """The production min_rows=1000 threshold fails a 50-row day — the
    DAG-task FAIL semantics, by step name."""
    gen = generation_pipeline(
        spark, str(scratch / "source"), date_id=20240617,
        n_stores=5, n_products=10, n_distributors=5, rows_per_day=50,
    )
    gen.run()
    ext = extract_pipeline(
        spark, str(scratch / "source"), str(scratch / "extract"),
        date_id=20240617,
    )
    ext.run()
    val = validation_pipeline(
        spark, str(scratch / "source"), str(scratch / "extract"),
        date_id=20240617, min_dim_rows=1, min_date_rows=1, min_fact_rows=1000,
    )
    with pytest.raises(RuntimeError, match="failed at step 'validate_fact_sales'"):
        val.run()


def test_production_thresholds_contract_and_warn_only_freshness(spark, scratch):
    """production_thresholds() is the DAG invocation contract verbatim:
    the documented numbers, plus the fact task's --skip_freshness_check
    semantics — the freshness check RUNS and a miss warns instead of
    failing (scripts/validate_table.py:336-390 demotes, never skips)."""
    from dynamic_etl_spark.pipelines import production_thresholds

    preset = production_thresholds()
    assert preset == {
        "min_dim_rows": 1000, "min_date_rows": 700,
        "min_fact_rows": 1000, "min_file_rows": 1,
        "fact_freshness_warn_only": True,
    }

    gen = generation_pipeline(
        spark, str(scratch / "source"), date_id=20240617,
        n_stores=5, n_products=10, n_distributors=5, rows_per_day=50,
    )
    gen.run()
    ext = extract_pipeline(
        spark, str(scratch / "source"), str(scratch / "extract"),
        date_id=20240617,
    )
    ext.run()
    # validate AS OF a date the fact table does not carry: enforced
    # freshness fails the step; the production preset's warn-only mode
    # passes with a warning (fixture-sized row thresholds — the preset's
    # 1000-row gates are exercised by test_validation_gate_fails_on_
    # thin_fact; here the subject is the freshness demotion)
    small = dict(min_dim_rows=1, min_date_rows=1, min_fact_rows=1)
    strict = validation_pipeline(
        spark, str(scratch / "source"), str(scratch / "extract"),
        date_id=20240618, **small,
    )
    with pytest.raises(RuntimeError, match="failed at step 'validate_fact_sales'"):
        strict.run()
    demoted = validation_pipeline(
        spark, str(scratch / "source"), str(scratch / "extract"),
        date_id=20240618, **small,
        fact_freshness_warn_only=preset["fact_freshness_warn_only"],
    )
    with pytest.warns(UserWarning, match="freshness"):
        results = demoted.run()
    assert "validate_fact_sales" in results.outputs


def test_dw_load_skips_when_no_file(spark, scratch):
    """An empty Current dir is a no-op load, not a failure (the queue
    returns (None, None) — retry-next-day semantics, U6)."""
    (scratch / "extract" / "Current").mkdir(parents=True)
    gen = generation_pipeline(
        spark, str(scratch / "source"), date_id=20240617,
        n_stores=5, n_products=10, n_distributors=5, rows_per_day=20,
    )
    gen.run()
    pipe = dw_load_pipeline(
        spark, str(scratch / "source"), str(scratch / "extract"),
        str(scratch / "dw"),
    )
    result = pipe.run()
    assert result.outputs["load_fact_sales"] == (None, None)
    # dims still refreshed
    assert result.outputs["load_dim_store"] == 5
