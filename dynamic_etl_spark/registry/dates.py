"""Calendar / date queries (SURVEY.md §2.7 F13-F21, §2.11 G4, §2.3 J4,
§2.9 U5).

full_date surfaces as timestamp (pandas/DuckDB render DATE as midnight
datetimes — boundary convention from registry/cleaning.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_etl_spark.ops import clean as C
from dynamic_etl_spark.ops import dates as DT
from dynamic_etl_spark.registry.core import Query, QueryRegistry, t
from dynamic_etl_spark.session import ensure_fanout_parallelism

_HOLIDAY_VALUES = ", ".join(f"({k}, '{v}')" for k, v in DT.INDIAN_HOLIDAYS)

# DuckDB twin of the calendar attribute block, parameterized on the day
# expression `d` (must be a DATE).
_CAL_COLS_SQL = """
    CAST(strftime(d, '%Y%m%d') AS INT) AS date_id,
    CAST(d AS TIMESTAMP) AS full_date,
    CAST(day(d) AS INT) AS day,
    dayname(d) AS day_name,
    CAST(isodow(d) AS INT) AS day_of_week,
    CAST(weekofyear(d) AS INT) AS week_of_year,
    CAST(month(d) AS INT) AS month,
    monthname(d) AS month_name,
    CAST(quarter(d) AS INT) AS quarter,
    CAST(year(d) AS INT) AS year,
    CAST(CASE WHEN month(d) >= 4 THEN (month(d) - 4) // 3 + 1 ELSE 4 END AS INT)
      AS fiscal_quarter,
    CAST(CASE WHEN month(d) >= 4 THEN year(d) + 1 ELSE year(d) END AS INT) AS fiscal_year,
    CASE WHEN isodow(d) >= 6 THEN 'Y' ELSE 'N' END AS is_weekend,
    CASE WHEN d = last_day(d) THEN 'Y' ELSE 'N' END AS is_month_end,
    CASE WHEN d = last_day(d) AND month(d) IN (3,6,9,12) THEN 'Y' ELSE 'N' END
      AS is_quarter_end,
    CASE WHEN d = last_day(d) AND month(d) IN (3,6,9,12) THEN 'Y' ELSE 'N' END
      AS is_fiscal_quarter_end,
    CASE WHEN month(d) = 12 AND day(d) = 31 THEN 'Y' ELSE 'N' END AS is_year_end,
    CASE WHEN month(d) = 3 AND day(d) = 31 THEN 'Y' ELSE 'N' END AS is_fiscal_year_end,
    CASE WHEN h.holiday_name IS NOT NULL THEN 'Y' ELSE 'N' END AS is_holiday,
    h.holiday_name AS holiday_name,
    CASE WHEN isodow(d) <= 5 AND h.holiday_name IS NULL THEN 'Y' ELSE 'N' END
      AS is_business_day
"""


def _with_ts_full_date(df: DataFrame) -> DataFrame:
    return df.withColumn("full_date", F.col("full_date").cast("timestamp_ntz"))


# ==========================================================================
# G4/F13-F17/F18 — date dimension build over a fixed 2-year span that
# exercises the holiday table, fiscal boundaries, and leap handling
# ==========================================================================

def date_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _with_ts_full_date(DT.build_date_dimension(spark, "2023-01-01", "2024-12-31"))


DATE_DIM_ORACLE = f"""
WITH holidays(date_id, holiday_name) AS (VALUES {_HOLIDAY_VALUES}),
days AS (
  SELECT CAST(gs AS DATE) AS d
  FROM generate_series(DATE '2023-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(gs)
)
SELECT {_CAL_COLS_SQL}
FROM days
LEFT JOIN holidays h ON CAST(strftime(d, '%Y%m%d') AS INT) = h.date_id
"""


# ==========================================================================
# J4/F13/F19 — date-typed key lookup: parse a string date column, derive the
# int yyyyMMdd key, probe the date dimension
# (reference: scripts2/load_fact_sales_dw.py:153-155,241-256)
# ==========================================================================

def date_key_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    d = F.col("o_orderdate").cast("date")
    # Dirty string dates in three formats + garbage (F19 feeds J4)
    raw = (
        F.when(k % 4 == 0, F.date_format(d, "yyyy/MM/dd"))
        .when(k % 4 == 1, F.date_format(d, "dd-MM-yyyy"))
        .when(k % 4 == 2, F.lit("not a date"))
        .otherwise(d.cast("string"))
    )
    parsed = C.lenient_date(raw, max_date="1998-12-31")
    # multi-format try_to_timestamp is ~µs/row-attempt CPU — heavy enough
    # that a 1-split input (sf0.1 orders is one row group) serializes the
    # whole parse on one task; fan out first (no-op on well-split inputs)
    feed = ensure_fanout_parallelism(orders).select(
        F.col("o_orderkey").alias("order_key"),
        DT.date_key(parsed).alias("date_id"),
    )
    dim = DT.build_date_dimension(spark, "1992-01-01", "1998-12-31").select(
        "date_id", "fiscal_year", "fiscal_quarter", "is_weekend", "is_business_day"
    )
    # The calendar is bounded and small at any corpus scale -> broadcast;
    # unresolved keys (unparseable dates) drop like the reference's dropna.
    return feed.join(F.broadcast(dim), "date_id", "inner")


DATE_LOOKUP_ORACLE = f"""
WITH holidays(date_id, holiday_name) AS (VALUES {_HOLIDAY_VALUES}),
days AS (
  SELECT CAST(gs AS DATE) AS d
  FROM generate_series(DATE '1992-01-01', DATE '1998-12-31', INTERVAL 1 DAY) t(gs)
),
dim AS (
  SELECT {_CAL_COLS_SQL}
  FROM days LEFT JOIN holidays h ON CAST(strftime(d, '%Y%m%d') AS INT) = h.date_id
),
feed AS (
  SELECT o_orderkey AS order_key,
         CASE WHEN o_orderkey % 4 = 0 THEN strftime(CAST(o_orderdate AS DATE), '%Y/%m/%d')
              WHEN o_orderkey % 4 = 1 THEN strftime(CAST(o_orderdate AS DATE), '%d-%m-%Y')
              WHEN o_orderkey % 4 = 2 THEN 'not a date'
              ELSE CAST(CAST(o_orderdate AS DATE) AS VARCHAR) END AS raw
  FROM orders
),
parsed AS (
  SELECT order_key,
         CASE WHEN COALESCE(try_strptime(trim(raw), '%Y-%m-%d'),
                            try_strptime(trim(raw), '%Y/%m/%d'),
                            try_strptime(trim(raw), '%d-%m-%Y'))
                   BETWEEN TIMESTAMP '1990-01-01' AND TIMESTAMP '1998-12-31 00:00:00'
              THEN CAST(strftime(COALESCE(try_strptime(trim(raw), '%Y-%m-%d'),
                                          try_strptime(trim(raw), '%Y/%m/%d'),
                                          try_strptime(trim(raw), '%d-%m-%Y')), '%Y%m%d') AS INT)
              ELSE NULL END AS date_id
  FROM feed
)
SELECT p.order_key, p.date_id, dim.fiscal_year, dim.fiscal_quarter,
       dim.is_weekend, dim.is_business_day
FROM parsed p JOIN dim ON p.date_id = dim.date_id
"""


# ==========================================================================
# U5/F20/P11 — incremental gap-fill: existing dim through 1997-06-30,
# as-of 1997-07-31 -> exactly July 1997 is generated
# (reference: scripts2/load_dim_date_dw.py:181-207)
# ==========================================================================

def date_gap_fill_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = DT.build_date_dimension(spark, "1997-01-01", "1997-06-30")
    delta = DT.date_dimension_delta(spark, existing, as_of="1997-07-31")
    return _with_ts_full_date(delta)


GAP_FILL_ORACLE = f"""
WITH holidays(date_id, holiday_name) AS (VALUES {_HOLIDAY_VALUES}),
days AS (
  SELECT CAST(gs AS DATE) AS d
  FROM generate_series(DATE '1997-07-01', DATE '1997-07-31', INTERVAL 1 DAY) t(gs)
)
SELECT {_CAL_COLS_SQL}
FROM days LEFT JOIN holidays h ON CAST(strftime(d, '%Y%m%d') AS INT) = h.date_id
"""


# ==========================================================================
# U5 initial branch — empty dim -> 2-year backfill from Jan 1
# ==========================================================================

def date_backfill_initial(spark: SparkSession, sf_dir: str) -> DataFrame:
    empty = DT.build_date_dimension(spark, "1995-01-01", "1995-01-01").limit(0)
    delta = DT.date_dimension_delta(spark, empty, as_of="1995-03-15")
    return _with_ts_full_date(delta)


BACKFILL_ORACLE = f"""
WITH holidays(date_id, holiday_name) AS (VALUES {_HOLIDAY_VALUES}),
days AS (
  SELECT CAST(gs AS DATE) AS d
  FROM generate_series(DATE '1993-01-01', DATE '1995-03-15', INTERVAL 1 DAY) t(gs)
)
SELECT {_CAL_COLS_SQL}
FROM days LEFT JOIN holidays h ON CAST(strftime(d, '%Y%m%d') AS INT) = h.date_id
"""


QUERIES: QueryRegistry = {
    "date_dimension_build": Query(
        date_dimension_build, DATE_DIM_ORACLE,
        "G4/F13-F17 calendar build: fiscal, flags, holidays, ISO weeks",
    ),
    "date_key_lookup": Query(
        date_key_lookup, DATE_LOOKUP_ORACLE,
        "J4/F13/F19 lenient parse -> yyyyMMdd key -> broadcast dim probe",
    ),
    "date_gap_fill_incremental": Query(
        date_gap_fill_incremental, GAP_FILL_ORACLE,
        "U5 incremental gap-fill from MAX(full_date)+1",
    ),
    "date_backfill_initial": Query(
        date_backfill_initial, BACKFILL_ORACLE,
        "U5 initial-mode 2-year backfill",
    ),
}
