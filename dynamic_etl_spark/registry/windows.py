"""Window-function and dedup queries (SURVEY.md §2.5 W1-W5, §2.6 D1-D3).

The reference's only true window requirement is sequential surrogate-key
assignment (W5); ranking/lag/moving windows are engine extras exposed for
free. Every window here is tie-broken to a total order so results are
deterministic and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_etl_spark.ops import agg as A
from dynamic_etl_spark.ops import dedup as D
from dynamic_etl_spark.ops.keys import assign_surrogate_keys
from dynamic_etl_spark.registry.core import Query, QueryRegistry, sql_dsum, t


# --------------------------------------------------------------------------
# W5 — surrogate-key continuation from a high-water-mark
# (reference: next_key + i loop, scripts2/load_fact_sales_dw.py:352-357;
# explicitly rejected SQL ROW_NUMBER in load_dim_product_dw.py:628-630 —
# we embrace it)
# --------------------------------------------------------------------------

def surrogate_key_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation")
    return assign_surrogate_keys(
        nation, order_cols=["n_name"], key_col="nation_key", offset=1000
    ).select("nation_key", "n_nationkey", "n_name")


SURROGATE_ORACLE = """
SELECT 1000 + ROW_NUMBER() OVER (ORDER BY n_name) AS nation_key,
       n_nationkey, n_name
FROM nation
"""


# --------------------------------------------------------------------------
# Ranking / lag / running aggregate per group (engine extras;
# frame sums use exact decimals so window evaluation order can't skew them)
# --------------------------------------------------------------------------

def customer_order_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.lag("o_totalprice").over(w).alias("prev_total"),
        F.lead("o_totalprice").over(w).alias("next_total"),
        A.as_double(F.sum(F.col("o_totalprice").cast("decimal(25,6)")).over(run)).alias(
            "running_total"
        ),
    )


SEQUENCE_ORACLE = """
SELECT
  o_custkey, o_orderkey, o_orderdate, o_totalprice,
  ROW_NUMBER() OVER w AS order_seq,
  LAG(o_totalprice)  OVER w AS prev_total,
  LEAD(o_totalprice) OVER w AS next_total,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,4)) AS DOUBLE)
    AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --------------------------------------------------------------------------
# W3 — top-1 per group (latest order per customer; reference's
# latest-file pick generalized — scripts/read_extract_snapshot.py:9-21)
# --------------------------------------------------------------------------

def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


LATEST_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# D1/D2 — keep-last / keep-first dedup with explicit ordering
# (reference: drop_duplicates keep='last'/'first',
# load_dim_product_dw.py:387-392, load_dim_store_dw.py:261-267)
# --------------------------------------------------------------------------

# (l_orderkey, l_linenumber) is NOT unique in this corpus, so the ordering
# column set includes the measures — otherwise keep-first/keep-last picks an
# arbitrary row among ties (the D1 hard part from SURVEY.md §7c).
_DEDUP_ORDER = ["l_linenumber", "l_quantity", "l_extendedprice"]


def dedup_keep_last_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return D.dedup_keep_last(li, keys=["l_orderkey"], order=_DEDUP_ORDER).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


KEEP_LAST_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
      ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


def dedup_keep_last_line_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same D1 semantics as ``dedup_keep_last_line`` via the hot-key-
    resilient ``max_by`` aggregate (map-side partial combine; see
    ops/dedup.dedup_keep_last_agg). Shares the window oracle — the two
    formulations are required to agree exactly."""
    li = t(spark, sf_dir, "lineitem")
    return D.dedup_keep_last_agg(li, keys=["l_orderkey"], order=_DEDUP_ORDER).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


def dedup_keep_first_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return D.dedup_keep_first(li, keys=["l_orderkey"], order=_DEDUP_ORDER).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


KEEP_FIRST_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_orderkey
      ORDER BY l_linenumber ASC, l_quantity ASC, l_extendedprice ASC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# D3 — full duplicate-group membership
# --------------------------------------------------------------------------

def duplicate_group_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = t(spark, sf_dir, "supplier")
    return D.duplicate_members(supplier, ["s_nationkey"]).select(
        "s_suppkey", "s_name", "s_nationkey"
    )


DUP_MEMBERS_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey
FROM (
  SELECT *, COUNT(*) OVER (PARTITION BY s_nationkey) AS n FROM supplier
) WHERE n > 1
"""


# --------------------------------------------------------------------------
# Correlated-aggregate filter: orders above their own customer's average
# — the decorrelated form of `WHERE price > (SELECT AVG(...) WHERE
# custkey = o.custkey)`. A window average (exact-decimal sum / count, so
# both engines compare against the identical double) replaces the
# correlated subquery: one customer-key shuffle, no join, no re-scan.
# --------------------------------------------------------------------------

def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    price = F.col("o_totalprice")
    cavg = (
        A.as_double(F.sum(price.cast(A.MEASURE_DECIMAL)).over(w))
        / F.count(price).over(w)
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            cavg.alias("__cavg"),
        )
        .filter(price > F.col("__cavg"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round("__cavg", 6).alias("cust_avg"),
        )
    )


ABOVE_AVG_ORACLE = """
WITH w AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
              OVER (PARTITION BY o_custkey) AS DECIMAL(38,4)) AS DOUBLE)
         / COUNT(o_totalprice) OVER (PARTITION BY o_custkey) AS cavg
  FROM orders
)
SELECT o_orderkey, o_custkey, o_totalprice, round(cavg, 6) AS cust_avg
FROM w
WHERE o_totalprice > cavg
"""


# --------------------------------------------------------------------------
# Distribution ranks: ntile / percent_rank / cume_dist per customer under
# a total order (ties broken by order key, so rank ties cannot occur and
# the integer-ratio definitions produce identical doubles both engines).
# --------------------------------------------------------------------------

def order_price_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


DISTRIBUTION_RANKS_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


def customer_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days from last order to a
    FIXED anchor — the repo determinism rule bans current_date),
    frequency (order count) and monetary (exact-decimal spend), each
    quintiled with a total-ordered ntile and concatenated into the
    classic 3-digit segment. Quintile windows are unpartitioned — the
    exact-equi-depth global sort (same caveat as
    events_equidepth_deciles: the validator-scale tool; sketch the
    boundaries at 100 TB)."""
    orders = t(spark, sf_dir, "orders")
    anchor = F.lit("1998-12-31 00:00:00").cast("timestamp_ntz")
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order_ts"),
        F.count(F.lit(1)).alias("n_orders"),
        A.dsum("o_totalprice", "total_spend"),
    )
    rfm = base.withColumn(
        "recency_days", F.datediff(anchor, F.col("last_order_ts")).cast("long")
    )
    # lower recency = better = higher bucket: ascending ntile on the
    # NEGATED ordering, ties broken by custkey (total order)
    r_w = Window.orderBy(F.col("recency_days").desc(), F.col("o_custkey"))
    f_w = Window.orderBy(F.col("n_orders"), F.col("o_custkey"))
    m_w = Window.orderBy(F.col("total_spend"), F.col("o_custkey"))
    return rfm.select(
        "o_custkey",
        "recency_days",
        "n_orders",
        "total_spend",
        F.ntile(5).over(r_w).cast("long").alias("r_bucket"),
        F.ntile(5).over(f_w).cast("long").alias("f_bucket"),
        F.ntile(5).over(m_w).cast("long").alias("m_bucket"),
    ).withColumn(
        "segment",
        F.concat_ws("", F.col("r_bucket"), F.col("f_bucket"), F.col("m_bucket")),
    ).orderBy("o_custkey")


RFM_ORACLE = f"""
WITH base AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order_ts,
         COUNT(*) AS n_orders,
         {sql_dsum('o_totalprice')} AS total_spend
  FROM orders GROUP BY o_custkey
),
rfm AS (
  SELECT o_custkey, last_order_ts, n_orders, total_spend,
         CAST(datediff('day', last_order_ts, TIMESTAMP '1998-12-31') AS BIGINT)
           AS recency_days
  FROM base
)
SELECT o_custkey, recency_days, n_orders, total_spend,
       CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS BIGINT) AS r_bucket,
       CAST(ntile(5) OVER (ORDER BY n_orders, o_custkey) AS BIGINT) AS f_bucket,
       CAST(ntile(5) OVER (ORDER BY total_spend, o_custkey) AS BIGINT) AS m_bucket,
       CAST(ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS VARCHAR)
         || CAST(ntile(5) OVER (ORDER BY n_orders, o_custkey) AS VARCHAR)
         || CAST(ntile(5) OVER (ORDER BY total_spend, o_custkey) AS VARCHAR)
         AS segment
FROM rfm
ORDER BY o_custkey
"""


QUERIES: QueryRegistry = {
    "surrogate_key_assignment": Query(surrogate_key_assignment, SURROGATE_ORACLE, "W5 row_number + high-water-mark offset"),
    "customer_order_sequence": Query(customer_order_sequence, SEQUENCE_ORACLE, "rank/lag/lead/running-total windows"),
    "latest_order_per_customer": Query(latest_order_per_customer, LATEST_ORACLE, "W3 top-1 per group"),
    "dedup_keep_last_line": Query(dedup_keep_last_line, KEEP_LAST_ORACLE, "D1 keep-last dedup"),
    "dedup_keep_last_line_agg": Query(dedup_keep_last_line_agg, KEEP_LAST_ORACLE, "D1 keep-last dedup, skew-resilient max_by form"),
    "dedup_keep_first_line": Query(dedup_keep_first_line, KEEP_FIRST_ORACLE, "D2 keep-first dedup"),
    "duplicate_group_members": Query(duplicate_group_members, DUP_MEMBERS_ORACLE, "D3 duplicate-group members"),
    "orders_above_customer_avg": Query(
        orders_above_customer_avg, ABOVE_AVG_ORACLE,
        "correlated-aggregate filter decorrelated to a window average",
    ),
    "order_price_distribution_ranks": Query(
        order_price_distribution_ranks, DISTRIBUTION_RANKS_ORACLE,
        "ntile/percent_rank/cume_dist under a total order",
    ),
    "customer_rfm_segmentation": Query(
        customer_rfm_segmentation, RFM_ORACLE,
        "RFM quintile segmentation with fixed anchor and total-ordered ntiles",
    ),
}
