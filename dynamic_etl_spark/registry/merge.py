"""Merge/SCD queries (SURVEY.md §2.9 U1-U6, §2.3 J5/J8).

The reference's signature operation: every DW table load ends in a MERGE
(scripts2/load_fact_sales_dw.py:390-416 et al), preceded by change
detection against the existing table (J8). Here both are distributed
joins — no driver-side dicts, no staging tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.joins import change_detection
from dynamic_etl_spark.registry.core import Query, QueryRegistry, t


def _incoming_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic re-sent feed derived from orders: every 10th key is new
    (INSERT), every 4th price moved beyond tolerance (UPDATE), every 7th
    moved within tolerance 0.01 (NOOP), every 6th status changed (UPDATE).
    Mirrors the dirty-fixture semantics of FIXTURES.md §3 without external
    files so the DuckDB oracle can rebuild the same feed."""
    k = F.col("o_orderkey")
    return t(spark, sf_dir, "orders").select(
        F.when(k % 10 == 0, k + 100000000).otherwise(k).alias("o_orderkey"),
        F.when(k % 6 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        F.when(k % 4 == 0, F.col("o_totalprice") + 1.0)
        .when(k % 7 == 0, F.col("o_totalprice") + 0.005)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )


_INCOMING_SQL = """
  SELECT CASE WHEN o_orderkey % 10 = 0 THEN o_orderkey + 100000000 ELSE o_orderkey END AS o_orderkey,
         CASE WHEN o_orderkey % 6 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 1.0
              WHEN o_orderkey % 7 = 0 THEN o_totalprice + 0.005
              ELSE o_totalprice END AS o_totalprice
  FROM orders
"""


# --------------------------------------------------------------------------
# J8/F24 — INSERT/UPDATE/NOOP classification with tolerance compare
# (reference: scripts2/load_fact_sales_dw.py:299-350 loads the whole fact
# table into a driver dict; here one distributed left join)
# --------------------------------------------------------------------------

def change_detection_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return change_detection(
        _incoming_orders(spark, sf_dir),
        existing,
        natural_key=["o_orderkey"],
        exact_cols=["o_orderstatus"],
        tolerance_cols=["o_totalprice"],
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "operation")


CHANGE_DETECTION_ORACLE = f"""
WITH incoming AS ({_INCOMING_SQL})
SELECT i.o_orderkey, i.o_orderstatus, i.o_totalprice,
       CASE WHEN e.o_orderkey IS NULL THEN 'INSERT'
            WHEN (i.o_orderstatus IS DISTINCT FROM e.o_orderstatus)
              OR (NOT (i.o_totalprice IS NULL AND e.o_totalprice IS NULL)
                  AND COALESCE(ABS(i.o_totalprice - e.o_totalprice) > 0.01, TRUE))
            THEN 'UPDATE' ELSE 'NOOP' END AS operation
FROM incoming i
LEFT JOIN orders e ON i.o_orderkey = e.o_orderkey
"""


QUERIES: QueryRegistry = {
    "change_detection_classification": Query(
        change_detection_classification,
        CHANGE_DETECTION_ORACLE,
        "J8/F24 INSERT/UPDATE/NOOP classification, tolerance 0.01",
    ),
}
