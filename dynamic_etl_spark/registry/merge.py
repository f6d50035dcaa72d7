"""Merge/SCD queries (SURVEY.md §2.9 U1-U6, §2.3 J5/J8).

The reference's signature operation: every DW table load ends in a MERGE
(scripts2/load_fact_sales_dw.py:390-416 et al), preceded by change
detection against the existing table (J8). Here both are distributed
joins — no driver-side dicts, no staging tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_etl_spark.ops.joins import change_detection, snapshot_diff
from dynamic_etl_spark.ops.merge import (
    merge_insert_only,
    scd1_merge,
    scd2_merge,
    upsert_mini_dim,
)
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


# --------------------------------------------------------------------------
# U1/J5 — SCD-1 MERGE as a full-outer-join rewrite: the complete merged
# table (KEEP/NOOP keep existing values, UPDATE takes incoming with the
# existing surrogate, INSERT gets MAX+1.. keys)
# (reference: scripts2/load_fact_sales_dw.py:299-416)
# --------------------------------------------------------------------------

def scd1_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    existing = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("sales_key"),
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        F.col("o_totalprice"),
    )
    return scd1_merge(
        existing,
        _incoming_orders(spark, sf_dir),
        natural_key=["o_orderkey"],
        surrogate_col="sales_key",
        exact_cols=["o_orderstatus"],
        tolerance_cols=["o_totalprice"],
    )


SCD1_ORACLE = f"""
WITH incoming AS ({_INCOMING_SQL}),
ex AS (
  SELECT o_orderkey AS sales_key, o_orderkey, o_orderstatus, o_totalprice FROM orders
),
hwm AS (SELECT COALESCE(MAX(sales_key), 0) AS v FROM ex),
j AS (
  SELECT ex.sales_key AS ex_sk, ex.o_orderkey AS ex_nk,
         ex.o_orderstatus AS ex_status, ex.o_totalprice AS ex_price,
         i.o_orderkey AS in_nk, i.o_orderstatus AS in_status, i.o_totalprice AS in_price,
         CASE WHEN i.o_orderkey IS NULL THEN 'KEEP'
              WHEN ex.o_orderkey IS NULL THEN 'INSERT'
              WHEN (i.o_orderstatus IS DISTINCT FROM ex.o_orderstatus)
                OR (NOT (i.o_totalprice IS NULL AND ex.o_totalprice IS NULL)
                    AND COALESCE(ABS(i.o_totalprice - ex.o_totalprice) > 0.01, TRUE))
              THEN 'UPDATE' ELSE 'NOOP' END AS operation
  FROM ex FULL OUTER JOIN incoming i ON ex.o_orderkey = i.o_orderkey
)
SELECT CASE WHEN operation = 'INSERT'
            THEN (SELECT v FROM hwm)
                 + ROW_NUMBER() OVER (PARTITION BY (operation = 'INSERT')
                                      ORDER BY COALESCE(in_nk, ex_nk))
            ELSE ex_sk END AS sales_key,
       COALESCE(in_nk, ex_nk) AS o_orderkey,
       CASE WHEN operation IN ('UPDATE', 'INSERT') THEN in_status ELSE ex_status END
         AS o_orderstatus,
       CASE WHEN operation IN ('UPDATE', 'INSERT') THEN in_price ELSE ex_price END
         AS o_totalprice,
       operation
FROM j
"""


# --------------------------------------------------------------------------
# SCD Type-2 — history-preserving MERGE (beyond-reference: the reference
# stops at Type-1 overwrite). Deterministic customer-dim fixture:
# history rows for every 9th key, missing / changed-beyond-tolerance /
# changed-name / within-tolerance / brand-new incoming slices by key
# modulus, effective date a fixed literal (determinism rule).
# --------------------------------------------------------------------------

def scd2_merge_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    k = F.col("c_custkey")

    def ts(s: str):
        return F.lit(s).cast("timestamp_ntz")

    cur = cust.select(
        k.alias("cust_sk"),
        "c_custkey",
        "c_name",
        "c_acctbal",
        ts("2020-01-01 00:00:00").alias("valid_from"),
        ts("2100-01-01 00:00:00").alias("valid_to"),
        F.lit("Y").alias("is_current"),
    )
    hist = cust.filter(k % 9 == 0).select(
        (k + 5_000_000).alias("cust_sk"),
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") - 50.0).alias("c_acctbal"),
        ts("2015-01-01 00:00:00").alias("valid_from"),
        ts("2020-01-01 00:00:00").alias("valid_to"),
        F.lit("N").alias("is_current"),
    )
    incoming = cust.filter(k % 13 != 5).select(
        "c_custkey",
        F.when(k % 10 == 3, F.concat(F.col("c_name"), F.lit(" JR")))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when(k % 7 == 0, F.col("c_acctbal") + 100.0)
        .when(k % 17 == 2, F.col("c_acctbal") + 0.005)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    ).unionByName(
        cust.filter(k % 11 == 0).select(
            (k + 1_000_000).alias("c_custkey"),
            F.concat(F.lit("NEW "), F.col("c_name")).alias("c_name"),
            F.col("c_acctbal"),
        )
    )
    return scd2_merge(
        cur.unionByName(hist),
        incoming,
        natural_key=["c_custkey"],
        surrogate_col="cust_sk",
        effective_date="2024-06-01 00:00:00",
        exact_cols=["c_name"],
        tolerance_cols=["c_acctbal"],
    )


SCD2_ORACLE = """
WITH cur AS (
  SELECT c_custkey AS cust_sk, c_custkey, c_name, c_acctbal,
         TIMESTAMP '2020-01-01' AS valid_from,
         TIMESTAMP '2100-01-01' AS valid_to, 'Y' AS is_current
  FROM customer
),
hist AS (
  SELECT c_custkey + 5000000 AS cust_sk, c_custkey, c_name,
         c_acctbal - 50.0 AS c_acctbal,
         TIMESTAMP '2015-01-01' AS valid_from,
         TIMESTAMP '2020-01-01' AS valid_to, 'N' AS is_current
  FROM customer WHERE c_custkey % 9 = 0
),
inc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 3 THEN c_name || ' JR' ELSE c_name END AS c_name,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
              WHEN c_custkey % 17 = 2 THEN c_acctbal + 0.005
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 13 <> 5
  UNION ALL
  SELECT c_custkey + 1000000, 'NEW ' || c_name, c_acctbal
  FROM customer WHERE c_custkey % 11 = 0
),
hwm AS (
  SELECT max(cust_sk) AS v
  FROM (SELECT cust_sk FROM cur UNION ALL SELECT cust_sk FROM hist)
),
j AS (
  SELECT cur.cust_sk AS ex_sk, cur.c_custkey AS ex_key,
         cur.c_name AS ex_name, cur.c_acctbal AS ex_bal,
         cur.valid_from AS ex_vf, cur.valid_to AS ex_vt,
         i.c_custkey AS in_key, i.c_name AS in_name, i.c_acctbal AS in_bal,
         CASE WHEN i.c_custkey IS NULL THEN 'KEEP'
              WHEN cur.c_custkey IS NULL THEN 'INSERT'
              WHEN (i.c_name IS DISTINCT FROM cur.c_name)
                OR (NOT (i.c_acctbal IS NULL AND cur.c_acctbal IS NULL)
                    AND COALESCE(ABS(i.c_acctbal - cur.c_acctbal) > 0.01, TRUE))
              THEN 'CHANGED' ELSE 'KEEP' END AS cls
  FROM cur FULL OUTER JOIN inc i ON cur.c_custkey = i.c_custkey
)
SELECT cust_sk, c_custkey, c_name, c_acctbal,
       valid_from, valid_to, is_current, operation
FROM (
  SELECT cust_sk, c_custkey, c_name, c_acctbal, valid_from, valid_to,
         is_current, 'HISTORY' AS operation
  FROM hist
  UNION ALL
  SELECT ex_sk, ex_key, ex_name, ex_bal, ex_vf, ex_vt, 'Y', 'KEEP'
  FROM j WHERE cls = 'KEEP' AND ex_key IS NOT NULL
  UNION ALL
  SELECT ex_sk, ex_key, ex_name, ex_bal, ex_vf, TIMESTAMP '2024-06-01',
         'N', 'CLOSE'
  FROM j WHERE cls = 'CHANGED'
  UNION ALL
  SELECT (SELECT v FROM hwm) + ROW_NUMBER() OVER (ORDER BY in_key),
         in_key, in_name, in_bal, TIMESTAMP '2024-06-01',
         TIMESTAMP '2100-01-01', 'Y',
         CASE WHEN cls = 'INSERT' THEN 'INSERT' ELSE 'REVISE' END
  FROM j WHERE cls IN ('INSERT', 'CHANGED')
)
"""


# --------------------------------------------------------------------------
# U2 — mini-dimension upsert: existing brand dim grows MAX+1.. keys for
# unseen brands (reference upsert_dim, load_dim_product_dw.py:428-468)
# --------------------------------------------------------------------------

def mini_dim_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = t(spark, sf_dir, "part")
    # Existing dim: brands seen in "already-loaded" parts, dense keys in
    # name order (deterministic fixture for the upsert).
    from pyspark.sql import Window

    existing_names = (
        part.filter(F.col("p_partkey") % 3 == 0).select("p_brand").distinct()
    )
    w = Window.orderBy("p_brand")
    dim = existing_names.select(
        F.row_number().over(w).cast("long").alias("brand_key"),
        F.col("p_brand").alias("brand_name"),
    )
    values = part.select(F.col("p_brand").alias("brand_name"))
    return upsert_mini_dim(dim, values, "brand_key", "brand_name")


MINI_DIM_ORACLE = """
WITH existing AS (
  SELECT ROW_NUMBER() OVER (ORDER BY p_brand) AS brand_key, p_brand AS brand_name
  FROM (SELECT DISTINCT p_brand FROM part WHERE p_partkey % 3 = 0)
),
hwm AS (SELECT COALESCE(MAX(brand_key), 0) AS v FROM existing),
new_names AS (
  SELECT DISTINCT p_brand AS brand_name FROM part
  WHERE p_brand NOT IN (SELECT brand_name FROM existing)
)
SELECT brand_key, brand_name FROM existing
UNION ALL
SELECT (SELECT v FROM hwm) + ROW_NUMBER() OVER (ORDER BY brand_name) AS brand_key,
       brand_name
FROM new_names
"""


# --------------------------------------------------------------------------
# U3 — snowflake extraction: distinct segment values become a keyed
# mini-dim; source rows carry the surrogate FK
# (reference chain extraction, load_dim_store_dw.py:227-257,296)
# --------------------------------------------------------------------------

def snowflake_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from dynamic_etl_spark.ops.merge import snowflake_extract

    customer = t(spark, sf_dir, "customer")
    seed_names = (
        customer.select("c_mktsegment")
        .filter(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"))
        .distinct()
    )
    w = Window.orderBy("c_mktsegment")
    dim = seed_names.select(
        F.row_number().over(w).cast("long").alias("segment_key"),
        F.col("c_mktsegment").alias("segment_name"),
    )
    joined, _ = snowflake_extract(
        customer, "c_mktsegment", dim, "segment_key", dim_name_col="segment_name"
    )
    return joined.select("c_custkey", "c_mktsegment", "segment_key")


SNOWFLAKE_ORACLE = """
WITH seed AS (
  SELECT ROW_NUMBER() OVER (ORDER BY c_mktsegment) AS segment_key,
         c_mktsegment AS segment_name
  FROM (SELECT DISTINCT c_mktsegment FROM customer
        WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING'))
),
hwm AS (SELECT COALESCE(MAX(segment_key), 0) AS v FROM seed),
new_names AS (
  SELECT DISTINCT c_mktsegment AS segment_name FROM customer
  WHERE c_mktsegment IS NOT NULL
    AND c_mktsegment NOT IN (SELECT segment_name FROM seed)
),
dim AS (
  SELECT segment_key, segment_name FROM seed
  UNION ALL
  SELECT (SELECT v FROM hwm) + ROW_NUMBER() OVER (ORDER BY segment_name), segment_name
  FROM new_names
)
SELECT c.c_custkey, c.c_mktsegment, d.segment_key
FROM customer c LEFT JOIN dim d ON c.c_mktsegment = d.segment_name
"""


# --------------------------------------------------------------------------
# U4 — insert-only MERGE (idempotent append): re-sent rows are skipped,
# genuinely new keys are appended
# (reference: load_dim_store_dw.py:247-254)
# --------------------------------------------------------------------------

def insert_only_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # Incoming re-sends every existing row AND five new ones (keys +100) —
    # idempotence means only the five genuinely-new keys land.
    new_rows = nation.filter(F.col("n_nationkey") < 5).select(
        (F.col("n_nationkey") + 100).alias("n_nationkey"),
        F.concat(F.lit("NEW "), F.col("n_name")).alias("n_name"),
    )
    incoming = nation.unionByName(new_rows)
    return merge_insert_only(nation, incoming, "n_nationkey")


INSERT_ONLY_ORACLE = """
SELECT n_nationkey, n_name FROM nation
UNION ALL
SELECT n_nationkey + 100 AS n_nationkey, 'NEW ' || n_name AS n_name
FROM nation WHERE n_nationkey < 5
"""


def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-side SCD-2: every order attributed to the customer-dim
    VERSION open at its order date (ops/joins.point_in_time_join).
    Two-version fixture: v1 (acctbal-50) valid 1992→1996 for keys with
    c_custkey % 13 != 5 — the %13=5 keys have NO early version, so their
    pre-1996 orders left-join to nulls; v2 (current) valid 1996→2100 for
    all keys. Orders dated exactly 1996-01-01 must land on v2
    (half-open-interval boundary semantics)."""
    from dynamic_etl_spark.ops.joins import point_in_time_join

    cust = t(spark, sf_dir, "customer")

    def ts(s: str):
        return F.lit(s).cast("timestamp_ntz")

    v1 = cust.filter(F.col("c_custkey") % 13 != 5).select(
        F.col("c_custkey").alias("dim_key"),
        F.col("c_custkey").alias("cust_sk"),
        (F.col("c_acctbal") - 50.0).alias("acctbal_v"),
        ts("1992-01-01 00:00:00").alias("valid_from"),
        ts("1996-01-01 00:00:00").alias("valid_to"),
    )
    v2 = cust.select(
        F.col("c_custkey").alias("dim_key"),
        (F.col("c_custkey") + 5_000_000).alias("cust_sk"),
        F.col("c_acctbal").alias("acctbal_v"),
        ts("1996-01-01 00:00:00").alias("valid_from"),
        ts("2100-01-01 00:00:00").alias("valid_to"),
    )
    facts = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").alias("order_ts")
    )
    joined = point_in_time_join(
        facts, v1.unionByName(v2), "o_custkey", "dim_key", "order_ts"
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "order_ts",
        "cust_sk",
        F.col("acctbal_v").alias("acctbal_at_order"),
    ).orderBy("o_orderkey")


SCD2_PIT_ORACLE = """
WITH dim AS (
  SELECT c_custkey AS dim_key, c_custkey AS cust_sk,
         c_acctbal - 50.0 AS acctbal_v,
         TIMESTAMP '1992-01-01' AS valid_from,
         TIMESTAMP '1996-01-01' AS valid_to
  FROM customer WHERE c_custkey % 13 <> 5
  UNION ALL
  SELECT c_custkey, c_custkey + 5000000, c_acctbal,
         TIMESTAMP '1996-01-01', TIMESTAMP '2100-01-01'
  FROM customer
)
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate AS order_ts,
       d.cust_sk, d.acctbal_v AS acctbal_at_order
FROM orders o
LEFT JOIN dim d
  ON o.o_custkey = d.dim_key
 AND o.o_orderdate >= d.valid_from
 AND o.o_orderdate < d.valid_to
ORDER BY o_orderkey
"""




def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed diff of two table versions (ops/joins.snapshot_diff): the
    read-side audit of the io/versioned commit chain. The "new" snapshot
    derives from orders with the repo's key-modulo dirty-fixture
    convention so DuckDB rebuilds both sides: every 31st key dropped
    (REMOVED), every 31st re-added under key+10000000 (ADDED), every 7th
    residue-3 price shifted (CHANGED: o_totalprice), every 13th
    residue-5 status flipped (CHANGED: o_orderstatus; overlapping keys
    attribute BOTH columns)."""
    k = F.col("o_orderkey")
    old = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    surviving = old.filter(k % 31 != 0).select(
        "o_orderkey",
        "o_custkey",
        F.when(k % 13 == 5, F.lit("X")).otherwise(F.col("o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.when(
            k % 7 == 3, F.col("o_totalprice") + F.lit(1.5).cast("decimal(12,2)")
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    added = old.filter(k % 31 == 0).select(
        (k + 10000000).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
    )
    new = surviving.unionByName(added)
    return snapshot_diff(
        old, new, ["o_orderkey"], ["o_custkey", "o_orderstatus", "o_totalprice"]
    ).orderBy("o_orderkey")


SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
),
new AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 13 = 5 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         CASE WHEN o_orderkey % 7 = 3
              THEN o_totalprice + CAST(1.5 AS DECIMAL(12,2))
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 31 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 31 = 0
),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         concat_ws(',',
           CASE WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                THEN 'o_custkey' END,
           CASE WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                THEN 'o_orderstatus' END,
           CASE WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                THEN 'o_totalprice' END) AS cc
  FROM old o FULL OUTER JOIN new n USING (o_orderkey)
)
SELECT o_orderkey,
       CASE WHEN NOT in_old THEN 'ADDED'
            WHEN NOT in_new THEN 'REMOVED'
            WHEN cc <> '' THEN 'CHANGED'
            ELSE 'UNCHANGED' END AS change_type,
       CASE WHEN in_old AND in_new THEN cc ELSE '' END AS changed_cols
FROM j
ORDER BY o_orderkey
"""

QUERIES: QueryRegistry = {
    "orders_snapshot_diff": Query(
        orders_snapshot_diff, SNAPSHOT_DIFF_ORACLE,
        "full-outer snapshot diff: ADDED/REMOVED/CHANGED/UNCHANGED with per-column attribution",
    ),
    "change_detection_classification": Query(
        change_detection_classification,
        CHANGE_DETECTION_ORACLE,
        "J8/F24 INSERT/UPDATE/NOOP classification, tolerance 0.01",
    ),
    "scd1_merge_orders": Query(
        scd1_merge_orders, SCD1_ORACLE,
        "U1/J5 SCD-1 full-outer MERGE rewrite with surrogate continuation",
    ),
    "scd2_merge_customers": Query(
        scd2_merge_customers, SCD2_ORACLE,
        "SCD-2 history-preserving MERGE: KEEP/CLOSE/REVISE/INSERT/HISTORY",
    ),
    "mini_dim_upsert": Query(
        mini_dim_upsert, MINI_DIM_ORACLE, "U2 mini-dimension upsert MAX+1 keys"
    ),
    "snowflake_extraction": Query(
        snowflake_extraction, SNOWFLAKE_ORACLE,
        "U3 snowflake extraction + surrogate FK join-back",
    ),
    "insert_only_merge": Query(
        insert_only_merge, INSERT_ONLY_ORACLE, "U4 idempotent insert-only MERGE"
    ),
    "scd2_point_in_time_lookup": Query(
        scd2_point_in_time_lookup, SCD2_PIT_ORACLE,
        "SCD-2 read side: facts attributed to the dim version open at "
        "fact time (half-open intervals, left-join null accounting)",
    ),
}
