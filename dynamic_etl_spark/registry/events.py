"""Event-stream queries over events.parquet (SURVEY.md §2.12, FIXTURES.md
§6).

The reference has no streaming operators — its incremental surface is the
file queue (S8). These are the engine extras a stream table needs: tumbling
/ sliding window aggregation, session windows, and JSON property
extraction. The same ``F.window``/``F.session_window`` expressions run
unchanged under Structured Streaming (dynamic_etl_spark/streaming) with a
watermark bolted on; here they run in batch so DuckDB can oracle-check the
semantics (time_bucket / gaps-and-islands twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dynamic_etl_spark.ops import agg as A
from dynamic_etl_spark.registry.core import Query, QueryRegistry, sql_dsum, t


# --------------------------------------------------------------------------
# Tumbling window: 1-hour buckets per event_type
# --------------------------------------------------------------------------

def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            A.dsum("value", "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


TUMBLING_ORACLE = f"""
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS total_value
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Sliding window: 1-hour length, 30-minute slide (every event lands in two
# windows; the DuckDB twin unions the two 30-minute-grid alignments)
# --------------------------------------------------------------------------

def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), A.dsum("value", "total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


SLIDING_ORACLE = f"""
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE AS window_start, value
  FROM events
)
SELECT window_start, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
FROM assigned
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Session windows: 5-minute inactivity gap per user
# (Spark session_window ≡ gaps-and-islands LAG + running sum in SQL)
# --------------------------------------------------------------------------

def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 5 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM marked
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 5 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""


# --------------------------------------------------------------------------
# JSON property extraction (§2.8 — the corpus's only semi-structured column)
# --------------------------------------------------------------------------

def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        "event_type",
        k.alias("k_value"),
        (k % 10).alias("k_bucket"),
    ).filter(F.col("k_value") > 50)


JSON_ORACLE = """
SELECT event_id, event_type,
       CAST(json_extract(props, '$.k') AS INT) AS k_value,
       CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket
FROM events
WHERE CAST(json_extract(props, '$.k') AS INT) > 50
"""


# --------------------------------------------------------------------------
# Per-type rate profile: conditional counts + safe ratio over one pass
# --------------------------------------------------------------------------

def events_rate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        A.dsum("value", "total_value"),
        A.count_if(F.col("value") >= 30, "high_value_events"),
    )
    w = Window.partitionBy()
    return per_type.select(
        "event_type",
        "n_events",
        "total_value",
        "high_value_events",
        (F.col("n_events") / F.sum("n_events").over(w)).alias("share_of_events"),
    )


RATE_ORACLE = f"""
WITH per_type AS (
  SELECT event_type, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value,
         CAST(SUM(CASE WHEN value >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS high_value_events
  FROM events GROUP BY event_type
)
SELECT event_type, n_events, total_value, high_value_events,
       CAST(n_events AS DOUBLE) / SUM(n_events) OVER () AS share_of_events
FROM per_type
"""


# --------------------------------------------------------------------------
# As-of join: every click event gets the user's most recent purchase at or
# before it (union + running last-non-null — see ops/asof.py for why this
# beats a range join at scale). DuckDB's native ASOF JOIN is the oracle,
# so the two formulations check each other. (user_id, ts) is unique in
# events, so the tiebreak never fires — it's there for the total order.
# --------------------------------------------------------------------------

def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamic_etl_spark.ops.asof import asof_join

    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        key_cols=["user_id"],
        ts_col="ts",
        attach_cols=["event_id", "value", "ts"],
        tiebreak_col="event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_event_id").alias("purchase_event_id"),
        F.col("asof_value").alias("purchase_value"),
        # timestampdiff works on TIMESTAMP_NTZ directly (unix_micros does not)
        F.expr("timestampdiff(MICROSECOND, asof_ts, ts)").alias(
            "micros_since_purchase"
        ),
    )


ASOF_ORACLE = """
SELECT p.event_id,
       p.user_id,
       p.ts,
       s.event_id AS purchase_event_id,
       s.value AS purchase_value,
       date_diff('microsecond', s.ts, p.ts) AS micros_since_purchase
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') p
ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'purchase') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


# --------------------------------------------------------------------------
# Range join: 2-hour analysis windows every 7 hours across January 2024,
# each aggregating the events it contains. Bucketized to stay an
# equi-join (ops/rangejoin.py); the oracle is DuckDB's plain inequality
# join, which a small table can afford.
# --------------------------------------------------------------------------

_RANGE_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_RANGE_N, _RANGE_EVERY_H, _RANGE_LEN_H = 103, 7, 2


def events_range_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynamic_etl_spark.ops.rangejoin import point_in_interval_join

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    hour_us = 3_600_000_000
    ivals = spark.range(_RANGE_N).select(
        F.col("id").alias("interval_id"),
        F.timestamp_micros(
            F.lit(_RANGE_BASE_US) + F.col("id") * (_RANGE_EVERY_H * hour_us)
        ).alias("w_start"),
        F.timestamp_micros(
            F.lit(_RANGE_BASE_US)
            + F.col("id") * (_RANGE_EVERY_H * hour_us)
            + _RANGE_LEN_H * hour_us
        ).alias("w_end"),
    )
    joined = point_in_interval_join(
        ev, ivals, ts_col="ts", bucket_seconds=_RANGE_LEN_H * 3600, how="left"
    )
    return joined.groupBy("interval_id", "w_start").agg(
        F.count("event_id").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        A.dsum("value", "total_value"),
    )


RANGE_ORACLE = f"""
WITH intervals AS (
  SELECT i AS interval_id,
         TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL '{_RANGE_EVERY_H} hours' AS w_start,
         TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL '{_RANGE_EVERY_H} hours'
           + INTERVAL '{_RANGE_LEN_H} hours' AS w_end
  FROM unnest(range(0, {_RANGE_N})) AS t(i)
)
SELECT i.interval_id, i.w_start,
       COUNT(e.event_id) AS n_events,
       COUNT(DISTINCT e.user_id) AS n_users,
       {sql_dsum('e.value')} AS total_value
FROM intervals i
LEFT JOIN events e ON e.ts >= i.w_start AND e.ts < i.w_end
GROUP BY i.interval_id, i.w_start
"""


# --------------------------------------------------------------------------
# Funnel conversion: view -> click (strictly after first view) -> purchase
# (strictly after that click), per user, collapsed to one global row of
# stage counts + conversion rates. One shuffle on user_id: the three
# "first event after prior stage" timestamps are whole-partition window
# MINs (order-independent, so no ORDER BY is needed — the total-order rule
# applies to rank/row_number windows, not commutative aggregates).
# --------------------------------------------------------------------------

def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return funnel_conversion(ev)


def funnel_conversion(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id")
    ty = F.col("event_type")
    staged = (
        ev.withColumn("__fv", F.min(F.when(ty == "view", F.col("ts"))).over(w))
        .withColumn(
            "__fc",
            F.min(
                F.when((ty == "click") & (F.col("ts") > F.col("__fv")), F.col("ts"))
            ).over(w),
        )
        .withColumn(
            "__fp",
            F.min(
                F.when((ty == "purchase") & (F.col("ts") > F.col("__fc")), F.col("ts"))
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("__fv").alias("fv"), F.min("__fc").alias("fc"), F.min("__fp").alias("fp")
    )
    out = per_user.agg(
        F.count("*").alias("n_users"),
        F.count("fv").alias("n_viewed"),
        F.count("fc").alias("n_clicked_after_view"),
        F.count("fp").alias("n_purchased_after_funnel"),
    )
    rate = lambda num, den: F.round(  # noqa: E731
        F.when(F.col(den) > 0, F.col(num).cast("double") / F.col(den)).otherwise(0.0), 6
    )
    return out.select(
        "*",
        rate("n_clicked_after_view", "n_viewed").alias("view_to_click_rate"),
        rate("n_purchased_after_funnel", "n_clicked_after_view").alias("click_to_purchase_rate"),
        rate("n_purchased_after_funnel", "n_viewed").alias("view_to_purchase_rate"),
    )


FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, min(ts) AS fv FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS fc
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.fv
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS fp
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.fc
  GROUP BY e.user_id
),
counts AS (
  SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
         (SELECT count(*) FROM v) AS n_viewed,
         (SELECT count(*) FROM c) AS n_clicked_after_view,
         (SELECT count(*) FROM p) AS n_purchased_after_funnel
)
SELECT *,
       round(CASE WHEN n_viewed > 0
             THEN CAST(n_clicked_after_view AS DOUBLE) / n_viewed ELSE 0.0 END, 6)
         AS view_to_click_rate,
       round(CASE WHEN n_clicked_after_view > 0
             THEN CAST(n_purchased_after_funnel AS DOUBLE) / n_clicked_after_view
             ELSE 0.0 END, 6) AS click_to_purchase_rate,
       round(CASE WHEN n_viewed > 0
             THEN CAST(n_purchased_after_funnel AS DOUBLE) / n_viewed ELSE 0.0 END, 6)
         AS view_to_purchase_rate
FROM counts
"""


# --------------------------------------------------------------------------
# Trailing 1-hour rolling aggregate per user: a RANGE frame over the
# event-time epoch (both engines define RANGE ... PRECEDING inclusively,
# and equal-timestamp rows share the same frame, so no ORDER tiebreak is
# needed for these commutative aggregates). The in-frame sum is the
# exact-decimal pattern, so partial-order differences can't leak into the
# hash. One shuffle on user_id; frame cost is bounded by one user's rate.
# --------------------------------------------------------------------------

_HOUR_US = 3_600_000_000


def events_rolling_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-_HOUR_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        A.as_double(F.sum(F.col("value").cast(A.MEASURE_DECIMAL)).over(w)).alias(
            "sum_1h"
        ),
    )


ROLLING_ORACLE = """
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_1h,
       CAST(CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w
            AS DECIMAL(38,4)) AS DOUBLE) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# Rolling distinct users: Spark has no countDistinct over a window — the
# native form is size(collect_set() OVER frame), which buffers only the
# frame's distinct keys (bounded by the 1-hour rate). Same RANGE frame
# semantics as events_rolling_user_value.
# --------------------------------------------------------------------------

def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "ts", "user_id")
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(epoch)
        .rangeBetween(-_HOUR_US, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        F.size(F.collect_set("user_id").over(w)).cast("long").alias(
            "distinct_users_1h"
        ),
    )


ROLLING_DISTINCT_ORACLE = """
SELECT event_id, event_type, ts,
       count(DISTINCT user_id) OVER (PARTITION BY event_type ORDER BY ts
             RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
         AS distinct_users_1h
FROM events
"""


# --------------------------------------------------------------------------
# Min-max feature scaling: (v - min) / (max - min) per group. Two-phase:
# the per-group extrema (a 5-row aggregate) broadcast back onto the
# corpus — the feature-engineering normalization pattern. Extrema are
# EXACT input doubles (no arithmetic, no quantization), so the scaling
# expression is identical IEEE math on both engines — none of the
# decimal-rounding parity traps apply.
# --------------------------------------------------------------------------

def events_minmax_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ext = ev.groupBy("event_type").agg(
        F.min("value").alias("__lo"), F.max("value").alias("__hi")
    )
    scaled = F.when(
        F.col("__hi") > F.col("__lo"),
        (F.col("value") - F.col("__lo")) / (F.col("__hi") - F.col("__lo")),
    ).otherwise(0.0)  # degenerate group: all values equal
    return ev.join(F.broadcast(ext), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(scaled, 6).alias("value_scaled"),
    )


MINMAX_ORACLE = """
WITH ext AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       round(CASE WHEN hi > lo THEN (e.value - lo) / (hi - lo)
                  ELSE 0.0 END, 6) AS value_scaled
FROM events e JOIN ext USING (event_type)
"""


# --------------------------------------------------------------------------
# Z-score standardization: the scaling pair's other half. Mean and
# variance derive from exact decimal(38,24) sums of v and v*v (order-
# independent; 24-dp quantization of a double is never a rounding tie,
# unlike the 6-dp money hop — see SCALE.md parity traps), converted to
# double ONCE and pushed through the identical variance formula on both
# engines, so the final 6dp rounding sees the same IEEE value.
# --------------------------------------------------------------------------

_ZDEC = "decimal(38,24)"


def events_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    v = F.col("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(v.cast(_ZDEC)).cast("double").alias("__s1"),
        F.sum((v * v).cast(_ZDEC)).cast("double").alias("__s2"),
    )
    mean = F.col("__s1") / F.col("__n")
    var = (F.col("__s2") - F.col("__n") * mean * mean) / (F.col("__n") - 1)
    b = stats.select(
        "event_type", mean.alias("__mean"), F.sqrt(var).alias("__sd")
    )
    z = F.when(
        F.col("__sd") > 0, (v - F.col("__mean")) / F.col("__sd")
    ).otherwise(0.0)
    return ev.join(F.broadcast(b), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.round(z, 6).alias("zscore"),
    )


def events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type time-trend drift audit: closed-form OLS of value against
    hours-since-anchor plus the Pearson correlation — the one-pass
    drift detector that tells a pipeline whether a metric is moving
    before any windowed comparison runs. One shuffle (the moment
    aggregation); the regression epilogue is scalar per group.

    Parity discipline: x is INTEGER hours via epoch-microsecond floor
    division (timestampdiff(HOUR) truncates elapsed time while DuckDB's
    date_diff counts boundary crossings — integer epoch division is the
    one formulation both engines compute identically); x-moments stay
    integer-exact in BIGINT, y-moments ride the decimal(38,24) sums of
    the zscore family, and the epilogue is the same IEEE double sequence
    in both engines. `+ 0.0` collapses IEEE -0.0 to +0.0 — slopes and
    correlations of un-trended data round to zero from either side, and
    the driver's hash distinguishes the two zeros."""
    ev = t(spark, sf_dir, "events").select("event_type", "ts", "value")
    # anchor 2024-01-01 00:00:00 UTC = 1704067200000000 epoch-us: keeps
    # the intercept at the fixture's own time origin instead of a 54-year
    # extrapolation to 1970 (slope and r are translation-invariant)
    x = F.expr(
        "(unix_micros(CAST(ts AS TIMESTAMP)) - 1704067200000000)"
        " div 3600000000"
    ).cast("long")
    v = F.col("value")
    # x-moments in decimal(38,0): sum(x*x) and the n*sxx / sx*sx products
    # overflow BIGINT near 1e9 rows x 1e5 hours (sum(x^2) ~ 7e19, sx^2 ~
    # 1e28 >> Long.MAX 9.2e18) — non-ANSI Spark would WRAP silently while
    # DuckDB's SUM(BIGINT)->HUGEINT stays exact. Exact 128-bit-class
    # integer arithmetic on both sides; each quantity crosses to double
    # exactly once, via the same explicit cast as the oracle's.
    _IDEC = "decimal(38,0)"
    m = ev.select("event_type", x.alias("__x"), v.alias("__y")).groupBy(
        "event_type"
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__x").cast(_IDEC)).alias("__sx"),
        F.sum((F.col("__x") * F.col("__x")).cast(_IDEC)).alias("__sxx"),
        F.sum(F.col("__y").cast(_ZDEC)).cast("double").alias("__sy"),
        F.sum((F.col("__y") * F.col("__y")).cast(_ZDEC)).cast("double").alias("__syy"),
        F.sum((F.col("__x") * F.col("__y")).cast(_ZDEC)).cast("double").alias("__sxy"),
    )
    n, sx, sxx = F.col("__n"), F.col("__sx"), F.col("__sxx")
    sy, syy, sxy = F.col("__sy"), F.col("__syy"), F.col("__sxy")
    sx_d = sx.cast("double")
    dx = (
        n.cast(_IDEC) * sxx - sx * sx
    ).cast("double")
    num = n * sxy - sx_d * sy
    dy = n * syy - sy * sy
    slope = num / dx
    return m.select(
        "event_type",
        n.cast("long").alias("n_events"),
        (
            F.round(F.when((dx > 0) & (dy > 0), slope).otherwise(0.0), 6) + 0.0
        ).alias("slope_per_hour"),
        (
            F.round(
                F.when(
                    (dx > 0) & (dy > 0),
                    (sy - slope * sx_d) / n,
                ).otherwise(0.0),
                6,
            )
            + 0.0
        ).alias("intercept"),
        (
            F.round(
                F.when(
                    (dx > 0) & (dy > 0), num / F.sqrt(dx * dy)
                ).otherwise(0.0),
                6,
            )
            + 0.0
        ).alias("pearson_r"),
    ).orderBy("event_type")


VALUE_TREND_ORACLE = """
WITH pts AS (
  SELECT event_type,
         (epoch_us(ts) - 1704067200000000) // 3600000000 AS x,
         value AS y
  FROM events
),
m AS (
  SELECT event_type,
         count(*) AS n,
         SUM(x) AS sx,
         SUM(x * x) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(38,24))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,24))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(x * y AS DECIMAL(38,24))) AS DOUBLE) AS sxy
  FROM pts GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       round(CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                   AND n * syy - sy * sy > 0
                  THEN (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
                  ELSE 0.0 END, 6) + 0.0 AS slope_per_hour,
       round(CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                   AND n * syy - sy * sy > 0
                  THEN (sy - ((n * sxy - sx * sy)
                              / CAST(n * sxx - sx * sx AS DOUBLE))
                             * CAST(sx AS DOUBLE)) / n
                  ELSE 0.0 END, 6) + 0.0 AS intercept,
       round(CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
                   AND n * syy - sy * sy > 0
                  THEN (n * sxy - sx * sy)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * (n * syy - sy * sy))
                  ELSE 0.0 END, 6) + 0.0 AS pearson_r
FROM m
ORDER BY event_type
"""


ZSCORE_ORACLE = """
WITH stats AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(38,24))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value * value AS DECIMAL(38,24))) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
),
b AS (
  SELECT event_type,
         s1 / n AS mean,
         sqrt((s2 - n * (s1 / n) * (s1 / n)) / (n - 1)) AS sd
  FROM stats
)
SELECT e.event_id, e.event_type, e.value,
       round(CASE WHEN sd > 0 THEN (e.value - mean) / sd ELSE 0.0 END, 6)
         AS zscore
FROM events e JOIN b USING (event_type)
"""


# --------------------------------------------------------------------------
# Binned value histogram: fixed-width bins from identical floor
# arithmetic on both engines (bin edges are exact in doubles). Fixed
# literal bounds keep the oracle static; a data-driven range would be a
# scalar high-water-mark first.
# --------------------------------------------------------------------------

_BIN_WIDTH = 50.0


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    bin_id = F.floor(F.col("value") / F.lit(_BIN_WIDTH)).cast("long")
    return (
        ev.groupBy("event_type", bin_id.alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin_id",
            (F.col("bin_id") * _BIN_WIDTH).alias("bin_lo"),
            "n",
        )
    )


HISTOGRAM_ORACLE = f"""
SELECT event_type,
       CAST(floor(value / {_BIN_WIDTH}) AS BIGINT) AS bin_id,
       CAST(floor(value / {_BIN_WIDTH}) AS BIGINT) * {_BIN_WIDTH} AS bin_lo,
       count(*) AS n
FROM events
GROUP BY 1, 2, 3
"""


def events_hourly_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly regridding with linear interpolation
    (ops/timeseries.resample_linear): irregular event values resampled
    to the top-of-hour grid between each user's first and last event.
    Exact integer micros end-to-end; the interpolation is three IEEE
    ops — hash-checkable without rounding."""
    from dynamic_etl_spark.ops.timeseries import resample_linear

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return resample_linear(
        ev, ["user_id"], "ts", "value", step_seconds=3600, tiebreak_col="event_id"
    ).orderBy("user_id", "grid_ts")


RESAMPLE_ORACLE = """
WITH obs AS (
  SELECT user_id, epoch_us(ts) AS us, value AS v, 0 AS is_grid,
         event_id AS tb
  FROM events
),
span AS (
  SELECT user_id, min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, g AS us, CAST(NULL AS DOUBLE) AS v, 1 AS is_grid,
         CAST(NULL AS BIGINT) AS tb
  FROM span,
       unnest(generate_series(
         CAST(-floor(-lo / 3600000000.0) * 3600000000 AS BIGINT), hi,
         3600000000)) AS u(g)
),
unioned AS (SELECT * FROM obs UNION ALL SELECT * FROM grid),
win AS (
  SELECT user_id, us, is_grid,
         last_value(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_grid, tb
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pus,
         last_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_grid, tb
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         first_value(CASE WHEN is_grid = 0 THEN us END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_grid, tb
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nus,
         first_value(CASE WHEN is_grid = 0 THEN v END IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, is_grid, tb
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
  FROM unioned
)
SELECT user_id, make_timestamp(us) AS grid_ts,
       CASE WHEN pus IS NOT NULL AND pus = us THEN pv
            WHEN pus IS NOT NULL AND nus IS NOT NULL THEN
              pv + (nv - pv) * (CAST(us - pus AS DOUBLE) / CAST(nus - pus AS DOUBLE))
       END AS value
FROM win
WHERE is_grid = 1
ORDER BY user_id, grid_ts
"""


def events_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap repair (ops/clean.fill_forward): every 7th event's value
    is knocked out, then carried forward per user in (ts, event_id)
    total order; leading nulls (a user's first events knocked out) stay
    null and are visible via was_null + a still-null filled value."""
    from dynamic_etl_spark.ops.clean import fill_forward

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    dirty = ev.withColumn(
        "value", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    ).withColumn("was_null", F.col("event_id") % 7 == 0)
    return (
        fill_forward(dirty, ["user_id"], ["ts", "event_id"], ["value"])
        .select("event_id", "user_id", "ts", "value", "was_null")
        .orderBy("event_id")
    )


FILL_FORWARD_ORACLE = """
WITH dirty AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value,
         event_id % 7 = 0 AS was_null
  FROM events
)
SELECT event_id, user_id, ts,
       last_value(value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value,
       was_null
FROM dirty
ORDER BY event_id
"""


def events_equidepth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram: ntile(10) over (value, event_id) — the
    total-order tie-break makes bucket membership deterministic at any
    parallelism (a bare ORDER BY value splits equal values across the
    decile boundary in partition order). Complements the fixed-width
    events_value_histogram: equi-depth adapts bucket edges to the
    distribution, the fixed grid does not.

    Scale note: ntile is a single-total-order window — the global sort is
    inherent to exact equi-depth. At 100 TB use pct_approx sketch
    boundaries instead; this exact form is the validator-scale tool and
    the oracle for the sketch."""
    ev = t(spark, sf_dir, "events").select("event_id", "value")
    w = Window.orderBy("value", "event_id")
    return (
        ev.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo_value"),
            F.max("value").alias("hi_value"),
        )
        .orderBy("decile")
    )


EQUIDEPTH_ORACLE = """
SELECT decile, count(*) AS n, min(value) AS lo_value, max(value) AS hi_value
FROM (
  SELECT value, ntile(10) OVER (ORDER BY value, event_id) AS decile
  FROM events
)
GROUP BY decile
ORDER BY decile
"""


# --------------------------------------------------------------------------
# Inter-arrival profile: per-user gap statistics from a total-ordered lag
# (ties broken by event_id per the repo window rule).
# --------------------------------------------------------------------------

def events_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    # timestampdiff handles TIMESTAMP_NTZ directly; the lag rides inside
    # the same SQL expression (a Column-API lag would need an epoch cast).
    # Gaps stay in INTEGER microseconds through the aggregate: a per-row
    # micros/1e6 double lands exactly ON a 6dp tie for every value (the
    # true quotient has exactly 6 decimals), so engines round it apart —
    # integer sums keep both sides bit-identical until one final division.
    gap_us = F.expr(
        "timestampdiff(MICROSECOND, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id), ts)"
    )
    gapped = ev.withColumn("__gap_us", gap_us)
    return gapped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__gap_us").alias("n_gaps"),
        F.round(
            F.sum("__gap_us").cast("double") / F.count("__gap_us") / 1_000_000.0, 6
        ).alias("avg_gap_s"),
        F.round(F.max("__gap_us").cast("double") / 1_000_000.0, 6).alias(
            "max_gap_s"
        ),
    )


INTERARRIVAL_ORACLE = """
WITH g AS (
  SELECT user_id,
         date_diff('microsecond',
              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
              ts) AS gap_us
  FROM events
)
SELECT user_id,
       count(*) AS n_events,
       count(gap_us) AS n_gaps,
       round(CAST(SUM(gap_us) AS DOUBLE) / COUNT(gap_us) / 1000000.0, 6)
         AS avg_gap_s,
       round(CAST(max(gap_us) AS DOUBLE) / 1000000.0, 6) AS max_gap_s
FROM g
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Retention cohorts: users grouped by first-seen week, activity counted
# per week offset — the standard growth-analytics triangle. The cohort
# timestamp is a whole-partition window MIN (commutative — no ORDER BY
# needed, same pattern as the funnel), so the plan is one user_id
# shuffle + one (cohort, offset) aggregation, no self-join.
# --------------------------------------------------------------------------

def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id")
    staged = ev.select(
        "user_id",
        F.date_trunc("week", F.min("ts").over(w)).alias("cohort_week"),
        F.date_trunc("week", F.col("ts")).alias("active_week"),
    )
    return (
        staged.select(
            "user_id",
            "cohort_week",
            (
                F.expr("timestampdiff(DAY, cohort_week, active_week)") / 7
            ).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


COHORT_ORACLE = """
WITH staged AS (
  SELECT user_id,
         date_trunc('week', min(ts) OVER (PARTITION BY user_id)) AS cohort_week,
         date_trunc('week', ts) AS active_week
  FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, active_week) // 7 AS BIGINT)
         AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM staged
GROUP BY cohort_week, week_offset
"""


# --------------------------------------------------------------------------
# Pivot: long->wide per-user event-type counts. The type list is pinned
# (passing values to pivot() skips Spark's distinct-discovery job AND
# keeps the output schema deterministic — required for both the oracle
# and any production sink). Compiles to one conditional aggregation:
# a single user_id shuffle with map-side partials, no joins.
# --------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("user_id", "event_type")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(t_), F.lit(0)).cast("long").alias(f"n_{t_}")
            for t_ in _EVENT_TYPES
        ],
    )


PIVOT_ORACLE = f"""
SELECT user_id,
       {", ".join(
           f"CAST(sum(CASE WHEN event_type = '{t_}' THEN 1 ELSE 0 END) AS BIGINT)"
           f" AS n_{t_}" for t_ in _EVENT_TYPES
       )}
FROM events
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Unpivot (melt): the wide per-user matrix back to long form — one row
# per (user, type) INCLUDING zero cells (unpivot emits every listed
# column, unlike the original groupBy, which has no row for a user/type
# the data never paired). Narrow transform, no extra shuffle beyond the
# pivot it consumes.
# --------------------------------------------------------------------------

def events_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = events_type_pivot(spark, sf_dir)
    long = wide.unpivot(
        ["user_id"],
        [f"n_{t_}" for t_ in _EVENT_TYPES],
        "event_type",
        "n_events",
    )
    return long.select(
        "user_id",
        F.expr("substring(event_type, 3)").alias("event_type"),
        "n_events",
    )


UNPIVOT_ORACLE = f"""
WITH counts AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type
),
types(event_type) AS (
  VALUES {", ".join(f"('{t_}')" for t_ in _EVENT_TYPES)}
),
users AS (SELECT DISTINCT user_id FROM events)
SELECT u.user_id, ty.event_type, COALESCE(c.n, 0) AS n_events
FROM users u
CROSS JOIN types ty
LEFT JOIN counts c ON c.user_id IS NOT DISTINCT FROM u.user_id
                  AND c.event_type = ty.event_type
"""


# --------------------------------------------------------------------------
# Percentile profile: exact interpolated quartiles/tails of value per
# event_type (PERCENTILE_CONT semantics — Spark `percentile` and DuckDB
# `quantile_cont` share the (n-1)*p linear-interpolation definition, so
# 6dp rounding is oracle-stable). Exact percentiles sort each group; the
# 100 TB path is ops/agg.pct_approx (mergeable sketch), tolerance-tested
# against this in tests/test_ops_units.py.
# --------------------------------------------------------------------------

def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    return ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        A.pct_exact("value", 0.25, "p25"),
        A.pct_exact("value", 0.50, "p50"),
        A.pct_exact("value", 0.90, "p90"),
        A.pct_exact("value", 0.99, "p99"),
    )


PERCENTILES_ORACLE = """
SELECT event_type,
       count(value) AS n,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.50), 6) AS p50,
       round(quantile_cont(value, 0.90), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences: lag in (ts, event_id) total order pairs consecutive
    events, counts aggregate per (prev, next), and the row-normalized
    probability is one IEEE division of exact integer counts (the
    per-prev total rides a keyed window over the type-cardinality²
    counts frame — bounded). The behavioral-sequence profile funnels
    and sessionization don't give."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select("prev_type", F.col("event_type").alias("next_type"))
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    tot = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double") / F.sum("n_transitions").over(tot)
        ).alias("p_transition"),
    ).orderBy("prev_type", "next_type")


TRANSITION_ORACLE = """
WITH pairs AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
),
c AS (
  SELECT prev_type, next_type, count(*) AS n_transitions
  FROM pairs WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / SUM(n_transitions) OVER (PARTITION BY prev_type) AS p_transition
FROM c
ORDER BY prev_type, next_type
"""


def events_hourly_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x event-type load heatmap: counts plus each cell's
    share of its hour (exact ints, one IEEE division via a keyed window
    over the 24 x |types| cells — bounded). The capacity-planning view of
    the event stream: which hours peak, and what they're made of."""
    ev = t(spark, sf_dir, "events").select("ts", "event_type")
    cells = ev.groupBy(
        F.hour("ts").cast("long").alias("hour_of_day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    hw = Window.partitionBy("hour_of_day")
    return cells.select(
        "hour_of_day",
        "event_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(hw)).alias("share_of_hour"),
    ).orderBy("hour_of_day", "event_type")


HEATMAP_ORACLE = """
WITH cells AS (
  SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day, event_type, count(*) AS n
  FROM events GROUP BY hour(ts), event_type
)
SELECT hour_of_day, event_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY hour_of_day)
         AS share_of_hour
FROM cells
ORDER BY hour_of_day, event_type
"""


def _three_slice(ev: DataFrame, build, merge) -> DataFrame:
    """Shared maintenance fixture for the *_maintenance family: the
    events feed cut into three date slices at Jan 11 / Jan 21, each
    summarized independently by ``build``, the summaries folded pairwise
    by ``merge`` — the merge tree every maintained-summary query proves
    equal (or bounded-equal) to the one-shot aggregate. One definition
    so a boundary or null-ts policy change happens in exactly one
    place.

    NULL-ts rows land in the LAST slice: every comparison against a
    NULL timestamp evaluates NULL, so without the isNull arm the three
    filters would silently drop the row from EVERY slice while the
    one-shot aggregates (and their DuckDB twins, which never filter on
    ts) still count it — the maintained summary would diverge from its
    own oracle on the first late row that arrives without a timestamp
    (r7 self-review, confirmed by execution on the KS state). The
    'last slice' choice matches the engine's NULL-ts-lands-after
    convention (_ks_side_counts, the events_ks_drift CASE)."""
    cut1 = F.lit("2024-01-11 00:00:00").cast("timestamp_ntz")
    cut2 = F.lit("2024-01-21 00:00:00").cast("timestamp_ntz")
    s1 = build(ev.filter(F.col("ts") < cut1))
    s2 = build(ev.filter((F.col("ts") >= cut1) & (F.col("ts") < cut2)))
    s3 = build(ev.filter((F.col("ts") >= cut2) | F.col("ts").isNull()))
    return merge(merge(s1, s2), s3)


def distinct_sketch_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained approximate distinct-users per event type
    (ops/agg.build/merge/finalize_distinct_sketch_state): three date
    slices sketched independently, states folded, estimates emitted.
    Rows-only — sketch bytes are engine-specific; the tolerance pytest
    (test_ops_units) checks estimates against exact distincts."""
    from dynamic_etl_spark.ops.agg import (
        build_distinct_sketch_state,
        finalize_distinct_sketch_state,
        merge_distinct_sketch_state,
    )

    ev = t(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    merged = _three_slice(
        ev,
        lambda df: build_distinct_sketch_state(df, ["event_type"], "user_id"),
        merge_distinct_sketch_state,
    )
    return finalize_distinct_sketch_state(merged).orderBy("event_type")


def distinct_sketch_maintenance_exacthash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct_sketch_maintenance in md5-register HLL form (ops/agg.
    build/merge/finalize_hll_md5_state): the same three date slices,
    each sketched into (event_type, bucket, max_rho) register rows,
    folded by the MAX monoid, finalized to the one-division raw
    estimate. Unlike the DataSketches twin this IS oracle-checkable —
    registers are integers both engines derive identically and MAX-merge
    is associative/commutative/idempotent, so the DuckDB twin sketches
    ONE-SHOT (the count_min_maintenance convention) and hash equality
    proves the maintenance tree lossless."""
    from dynamic_etl_spark.ops.agg import (
        build_hll_md5_state,
        finalize_hll_md5_state,
        merge_hll_md5_state,
    )

    ev = t(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    merged = _three_slice(
        ev,
        lambda df: build_hll_md5_state(df, ["event_type"], "user_id"),
        merge_hll_md5_state,
    )
    return finalize_hll_md5_state(merged).orderBy("event_type")


def _distinct_sketch_exacthash_oracle() -> str:
    from dynamic_etl_spark.registry.relational import (
        sql_hll_finalize,
        sql_hll_registers,
    )

    return f"""
WITH regs AS {sql_hll_registers("events", "event_type", "user_id")},
final AS ({sql_hll_finalize("regs", "event_type")})
SELECT * FROM final ORDER BY event_type
"""


DISTINCT_SKETCH_EXACTHASH_ORACLE = _distinct_sketch_exacthash_oracle()


def heavy_hitter_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained per-event-type heavy hitters (ops/agg.build/merge/
    finalize_heavy_hitter_state — Misra-Gries mergeable summaries,
    PODS'12): three date slices summarized independently, summaries
    folded, k=8 counters emitted per type. Unlike the HLL sketch twin
    (distinct_sketch_maintenance) this IS oracle-checkable: counts are
    exact integers and the compression offset is tie-robust, so DuckDB
    replays the identical build/merge tree."""
    from dynamic_etl_spark.ops.agg import (
        build_heavy_hitter_state,
        finalize_heavy_hitter_state,
        merge_heavy_hitter_state,
    )

    ev = t(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    merged = _three_slice(
        ev,
        lambda df: build_heavy_hitter_state(df, ["event_type"], "user_id", k=8),
        lambda a, b: merge_heavy_hitter_state(a, b, k=8),
    )
    return finalize_heavy_hitter_state(merged, item_alias="user_id").orderBy(
        "event_type", F.desc("count_lower_bound"), "user_id"
    )


def quantile_hist_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained per-event-type P50/P90/P99 (ops/agg.build/merge/
    finalize_quantile_hist_state): three date slices histogrammed
    independently on the [0, 500)x100-bin grid, integer bin counts
    folded, quantiles interpolated from the merged histogram. Bin counts
    are exact integers and the bin map / interpolation are identical
    IEEE chains, so the DuckDB twin bins ONE-SHOT — hash equality proves
    the maintained histogram lossless (the reservoir/rollup pattern)."""
    from dynamic_etl_spark.ops.agg import (
        build_quantile_hist_state,
        finalize_quantile_hist_state,
        merge_quantile_hist_state,
    )

    ev = t(spark, sf_dir, "events").select("event_type", "value", "ts")
    lo, hi, nb = 0.0, 500.0, 100
    merged = _three_slice(
        ev,
        lambda df: build_quantile_hist_state(df, ["event_type"], "value", lo, hi, nb),
        merge_quantile_hist_state,
    )
    return finalize_quantile_hist_state(
        merged, lo, hi, nb, qs=(0.5, 0.9, 0.99)
    ).orderBy("event_type", "q")


def rank_sketch_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained per-event-type P50/P90/P99 with NO configured value
    range (ops/kll.build/merge/finalize_kll_state — KLL compactor
    hierarchy, Karnin-Lang-Liberty FOCS'16): the unknown-range sibling
    of quantile_hist_maintenance, which needs lo/hi/n_bins a priori.
    Three date slices sketched independently and folded; rank error
    bounded by kll_rank_error_bound at any merge tree. Rows-only (the
    sketch content is merge-tree-dependent within the bound — the HLL
    precedent); tests/test_kll.py ground-truths the bound, merge
    associativity, and state size against exact percentiles at
    sf0.001 AND sf0.01."""
    from dynamic_etl_spark.ops.kll import (
        build_kll_state,
        finalize_kll_state,
        merge_kll_state,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("value").cast("double").alias("value"), "ts"
    )
    merged = _three_slice(
        ev,
        lambda df: build_kll_state(df, ["event_type"], "value"),
        merge_kll_state,
    )
    return finalize_kll_state(merged, qs=(0.5, 0.9, 0.99)).orderBy("event_type", "q")


def rank_sketch_finalize_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable twin of the KLL FINALIZE arithmetic (VERDICT r5
    #5): the sketch build/merge is rightly rows-only (crc32 compaction
    coins are engine hashing), but finalize_kll_state's weighted
    cumulative-rank selection over a FIXED state table is engine-exact.
    Synthesize a deterministic compactor state from the events table —
    state_level = event_id % 3, the key-modulo dirty-fixture convention,
    reproducible in SQL — and run the REAL ops/kll.finalize_kll_state
    over it, so the window cumsum + pow-of-two weights + ceil selection
    carry the driver's hash signal while the rank-error bound stays
    pytest territory (tests/test_kll.py)."""
    from dynamic_etl_spark.ops.kll import finalize_kll_state

    state = (
        t(spark, sf_dir, "events")
        # state_value feeds a window ORDER BY: a NULL there would sit
        # NULLS FIRST in Spark but NULLS LAST in DuckDB's cumsum
        # (SCALE.md null-placement trap) — filter before it can order
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.col("event_id") % 3).cast("int").alias("state_level"),
            F.col("value").cast("double").alias("state_value"),
        )
    )
    return finalize_kll_state(state, qs=(0.5, 0.9, 0.99)).orderBy("event_type", "q")


RANK_SKETCH_FINALIZE_ORACLE = """
WITH weighted AS (
  SELECT event_type,
         CAST(event_id % 3 AS INTEGER) AS state_level,
         value AS state_value,
         CAST(POW(2.0, event_id % 3) AS BIGINT) AS w
  FROM events WHERE value IS NOT NULL
),
cum AS (
  SELECT event_type, state_value,
         SUM(w) OVER (PARTITION BY event_type
                      ORDER BY state_value, state_level
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(w) OVER (PARTITION BY event_type) AS tot
  FROM weighted
),
sel AS (
  SELECT event_type,
         MIN(CASE WHEN c >= CEIL(0.5 * tot) THEN state_value END) AS q50,
         MIN(CASE WHEN c >= CEIL(0.9 * tot) THEN state_value END) AS q90,
         MIN(CASE WHEN c >= CEIL(0.99 * tot) THEN state_value END) AS q99
  FROM cum GROUP BY event_type
)
SELECT event_type, CAST(0.5 AS DOUBLE) AS q, ROUND(q50, 6) + 0.0 AS quantile_est FROM sel
UNION ALL
SELECT event_type, CAST(0.9 AS DOUBLE) AS q, ROUND(q90, 6) + 0.0 AS quantile_est FROM sel
UNION ALL
SELECT event_type, CAST(0.99 AS DOUBLE) AS q, ROUND(q99, 6) + 0.0 AS quantile_est FROM sel
ORDER BY event_type, q
"""


QUANTILE_HIST_ORACLE = """
WITH hist AS (
  SELECT event_type,
         CAST(CASE WHEN value < 0 THEN -1
                   WHEN value >= 500 THEN 100
                   ELSE least(CAST(floor((value - 0) / 5.0) AS BIGINT), 99)
              END AS BIGINT) AS state_bin,
         count(*) AS state_n
  FROM events
  GROUP BY 1, 2
),
cum AS (
  SELECT *,
         SUM(state_n) OVER (PARTITION BY event_type ORDER BY state_bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(state_n) OVER (PARTITION BY event_type) AS tot
  FROM hist
),
c2 AS (SELECT *, cum - state_n AS prev FROM cum),
tq AS (
  SELECT c2.*, q, greatest(CAST(ceil(q * tot) AS BIGINT), 1) AS t
  FROM c2 CROSS JOIN (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                             (CAST(0.99 AS DOUBLE))) AS qs(q)
)
SELECT event_type, q,
       round(CASE WHEN state_bin = -1 THEN 0.0
                  WHEN state_bin = 100 THEN 500.0
                  ELSE 0.0 + state_bin * 5.0
                       + CAST(t - prev AS DOUBLE) / CAST(state_n AS DOUBLE) * 5.0
             END, 6) AS quantile_est
FROM tq
WHERE cum >= t AND prev < t
ORDER BY event_type, q
"""


def events_zorder_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit (ops/layout): events map onto a 2-D
    (hour-of-day x value) grid, bits interleave into a Morton key, and
    the key's top byte tiles the space. Per tile: row count plus the
    hour/value spans — the numbers that show why a Morton-clustered
    write prunes 2-D box predicates (each tile is a bounded rectangle,
    not a full-table stripe). Pure integer bit algebra — bit-exact in
    DuckDB with the same shift/mask operators (sql_zorder_key)."""
    from dynamic_etl_spark.ops.layout import normalize_to_grid, zorder_key

    ev = t(spark, sf_dir, "events").select(
        F.hour("ts").cast("long").alias("hod"),
        F.floor("value").cast("long").alias("val"),
    )
    gx = normalize_to_grid(F.col("hod"), 0, 23, 16)
    gy = normalize_to_grid(F.col("val"), 0, 500, 16)
    z = zorder_key([gx, gy], 16)
    return (
        ev.withColumn("tile", F.shiftright(z, 24))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("hod").alias("hod_min"),
            F.max("hod").alias("hod_max"),
            F.min("val").alias("val_min"),
            F.max("val").alias("val_max"),
        )
        .orderBy("tile")
    )


def _zorder_tiles_oracle() -> str:
    from dynamic_etl_spark.ops.layout import sql_zorder_key

    gx = "CAST(floor((least(greatest(hod, 0), 23) * 65535) / 23) AS BIGINT)"
    gy = "CAST(floor((least(greatest(val, 0), 500) * 65535) / 500) AS BIGINT)"
    return f"""
WITH g AS (
  SELECT CAST(hour(ts) AS BIGINT) AS hod,
         CAST(floor(value) AS BIGINT) AS val
  FROM events
),
keyed AS (
  SELECT hod, val, ({sql_zorder_key([gx, gy], 16)}) >> 24 AS tile FROM g
)
SELECT tile, count(*) AS n_events,
       min(hod) AS hod_min, max(hod) AS hod_max,
       min(val) AS val_min, max(val) AS val_max
FROM keyed
GROUP BY tile
ORDER BY tile
"""


ZORDER_TILES_ORACLE = _zorder_tiles_oracle()


def events_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary importance of event types (ops/graph.pagerank): the
    user-journey transition graph — consecutive events per user, the
    same total-ordered lag as events_transition_matrix — weighted by
    transition count, power-iterated to the damped stationary
    distribution. The graph-centrality read of the event stream: which
    states do journeys keep returning to. Rows-only (IEEE rank sums are
    partition-order-sensitive at the ulp; numpy-checked in
    tests/test_graph.py), rounded to 6dp at the boundary."""
    from dynamic_etl_spark.ops.graph import pagerank

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("__next", F.lead("event_type").over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("__next").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(
        pairs, "src", "dst", weight="w", max_iter=12, tol=1e-9, tol_check_every=4
    )
    return ranks.select(
        F.col("v").alias("event_type"), F.round("rank", 6).alias("rank")
    ).orderBy(F.desc("rank"), "event_type")


_PR_ITERS = 12
_PR_UNIT = 10**12


def events_type_pagerank_exacthash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events_type_pagerank in integer fixed-point form (ops/graph.
    pagerank_fixed_point): ranks live in BIGINT units of 1e-12, every
    division floors, damping is exact 85/100 arithmetic, and the
    iteration count is fixed — so the full 12-round power iteration is
    bit-exactly reproducible by a DuckDB recursive CTE: the sixth
    never-oracle-backed family converted this round (VERDICT r7 called
    the PageRank IEEE sums out by name; the integer recurrence sidesteps
    them). Surface: rank_fp (the exact integer) plus rank = rank_fp/1e12
    — one IEEE division of exactly-representable values, bit-identical
    across engines. The xxhash/double twin stays the big-vertex-set
    production path; this one targets small state domains (event types),
    where its single-partition vertex windows are free."""
    from dynamic_etl_spark.ops.graph import pagerank_fixed_point

    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("__next", F.lead("event_type").over(w))
        .filter(F.col("__next").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("__next").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank_fixed_point(
        pairs, "src", "dst", weight="w", iters=_PR_ITERS, unit=_PR_UNIT
    )
    return ranks.select(
        F.col("v").alias("event_type"),
        "rank_fp",
        (F.col("rank_fp").cast("double") / F.lit(float(_PR_UNIT))).alias("rank"),
    ).orderBy(F.desc("rank_fp"), "event_type")


PAGERANK_EXACTHASH_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS src,
         event_type AS dst
  FROM events
),
e AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
  FROM pairs WHERE src IS NOT NULL
  GROUP BY src, dst
),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS W FROM e GROUP BY src),
-- the union hides in a subquery: a TOP-LEVEL union in any CTE of a
-- WITH RECURSIVE gets DuckDB's recursive-union treatment (observed:
-- 'a UNION b' stops deduplicating across the two arms there)
verts AS (
  SELECT DISTINCT v
  FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
),
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM verts),
it(i, v, rank) AS (
  SELECT 0, v, {_PR_UNIT} // (SELECT n FROM nv) FROM verts
  UNION ALL
  SELECT r.i + 1, r.v,
         ({_PR_UNIT} * 15) // ((SELECT n FROM nv) * 100)
         + ((COALESCE(c.contrib, 0)
             + (s.dang // (SELECT n FROM nv))) * 85) // 100
  FROM it r
  JOIN (SELECT r2.i,
               CAST(SUM(CASE WHEN o.src IS NULL THEN r2.rank ELSE 0 END)
                    AS BIGINT) AS dang
        FROM it r2 LEFT JOIN outw o ON r2.v = o.src
        GROUP BY r2.i) s ON s.i = r.i
  LEFT JOIN (SELECT r3.i AS ci, e.dst AS cv,
                    CAST(SUM((r3.rank * e.w) // o2.W) AS BIGINT) AS contrib
             FROM it r3
             JOIN e ON r3.v = e.src
             JOIN outw o2 ON r3.v = o2.src
             GROUP BY r3.i, e.dst) c ON c.ci = r.i AND c.cv = r.v
  WHERE r.i < {_PR_ITERS}
)
SELECT v AS event_type,
       CAST(rank AS BIGINT) AS rank_fp,
       CAST(rank AS BIGINT) / {float(_PR_UNIT)!r} AS rank
FROM it WHERE i = {_PR_ITERS}
ORDER BY rank_fp DESC, event_type
"""


def reservoir_sample_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained per-event-type uniform reservoir (ops/sample.build/
    merge/finalize_reservoir_state): three date slices sampled
    independently, reservoirs folded, n=5 rows per type emitted. The
    deterministic priority makes bottom-n selection merge-invariant, so
    the DuckDB twin ranks ONE-SHOT over all events — hash equality IS
    the proof that the maintained reservoir loses nothing."""
    from dynamic_etl_spark.ops.sample import (
        build_reservoir_state,
        finalize_reservoir_state,
        merge_reservoir_state,
    )

    ev = t(spark, sf_dir, "events").select("event_type", "event_id", "ts")
    merged = _three_slice(
        ev,
        lambda df: build_reservoir_state(df, ["event_type"], "event_id", n=5),
        lambda a, b: merge_reservoir_state(a, b, n=5),
    )
    return finalize_reservoir_state(merged, item_alias="event_id").orderBy(
        "event_type", "priority", "event_id"
    )


from dynamic_etl_spark.ops.sample import sql_uniform_affine as _sql_u

RESERVOIR_ORACLE = f"""
WITH pri AS (
  SELECT event_type, event_id,
         {_sql_u('event_id')} AS state_pri
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
            ORDER BY state_pri, event_id) AS rn
  FROM pri
)
SELECT event_type, event_id, round(state_pri, 10) AS priority
FROM ranked WHERE rn <= 5
ORDER BY event_type, priority, event_id
"""


def _mg_sql(src: str, out: str, k: int = 8) -> str:
    """One Misra-Gries compression round as a CTE pair (ranked + output):
    subtract the (k+1)-th largest counter per key, drop non-positive."""
    return f"""{out}_r AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
             ORDER BY state_cnt DESC, state_item) AS rn
  FROM {src}
),
{out} AS (
  SELECT event_type, state_item, state_cnt - off AS state_cnt
  FROM (
    SELECT *, COALESCE(MAX(CASE WHEN rn = {k + 1} THEN state_cnt END)
                 OVER (PARTITION BY event_type), 0) AS off
    FROM {out}_r
  )
  WHERE state_cnt - off > 0
)"""


HEAVY_HITTER_ORACLE = f"""
WITH s1 AS (
  SELECT event_type, user_id AS state_item, count(*) AS state_cnt
  FROM events WHERE ts < TIMESTAMP '2024-01-11 00:00:00'
  GROUP BY event_type, user_id
),
{_mg_sql('s1', 'c1')},
s2 AS (
  SELECT event_type, user_id AS state_item, count(*) AS state_cnt
  FROM events WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'
             AND ts < TIMESTAMP '2024-01-21 00:00:00'
  GROUP BY event_type, user_id
),
{_mg_sql('s2', 'c2')},
s3 AS (
  SELECT event_type, user_id AS state_item, count(*) AS state_cnt
  FROM events WHERE ts >= TIMESTAMP '2024-01-21 00:00:00'
  GROUP BY event_type, user_id
),
{_mg_sql('s3', 'c3')},
m12 AS (
  SELECT event_type, state_item, SUM(state_cnt) AS state_cnt
  FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
  GROUP BY event_type, state_item
),
{_mg_sql('m12', 'cm12')},
m123 AS (
  SELECT event_type, state_item, SUM(state_cnt) AS state_cnt
  FROM (SELECT * FROM cm12 UNION ALL SELECT * FROM c3)
  GROUP BY event_type, state_item
),
{_mg_sql('m123', 'cm123')}
SELECT event_type, state_item AS user_id,
       CAST(state_cnt AS BIGINT) AS count_lower_bound
FROM cm123
ORDER BY event_type, count_lower_bound DESC, user_id
"""


def count_min_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained Count-Min point-frequency sketch (ops/agg.build/merge/
    cm_estimate — Cormode-Muthukrishnan 2005): three date slices
    sketched independently into depth-4 x width-256 counter grids,
    merged by elementwise addition (an exact monoid — merge tree ==
    one-shot bit-for-bit), then probed for every 10th user's event
    count. Completes the maintained-summary suite's frequency axis:
    Misra-Gries says WHO is heavy; CM answers "how often is THIS key"
    for ANY key from O(depth*width) state with no item list at all.

    Unlike the HLL twin this IS oracle-checkable: the row hashes are
    md5-hex slices both engines evaluate identically and every counter
    is an exact integer, so the DuckDB twin sketches ONE-SHOT and hash
    equality proves the maintenance lossless AND the estimates
    overestimate-only (cm_estimate - exact_cnt >= 0 surfaces per
    probe)."""
    from dynamic_etl_spark.ops.agg import (
        build_cm_state,
        cm_estimate,
        merge_cm_state,
    )

    ev = t(spark, sf_dir, "events").select("user_id", "ts")
    # width 32 is deliberately UNDERSIZED for the fixture's ~150 users
    # so bucket collisions actually occur and the overestimate column
    # carries nonzero values (real deployments size width ~ 2/epsilon);
    # the estimates stay overestimate-only either way
    merged = _three_slice(
        ev,
        lambda df: build_cm_state(df, [], "user_id", width=32),
        merge_cm_state,
    )
    hot = ev.filter(F.col("user_id") % 10 == 0)
    probes = hot.select("user_id").distinct()
    est = cm_estimate(merged, probes, "user_id")
    exact = hot.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            "cm_estimate",
            "exact_cnt",
            (F.col("cm_estimate") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy("user_id")
    )


COUNT_MIN_ORACLE = """
WITH depths(d) AS (VALUES (0), (1), (2), (3)),
buckets AS (
  SELECT user_id, d AS state_depth,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1 + 8 * d, 8))::BIGINT
           % 32 AS state_bucket
  FROM events CROSS JOIN depths
),
state AS (
  SELECT state_depth, state_bucket, count(*) AS state_cnt
  FROM buckets GROUP BY 1, 2
),
probes AS (SELECT DISTINCT user_id FROM events WHERE user_id % 10 = 0),
pb AS (
  SELECT user_id, d AS state_depth,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1 + 8 * d, 8))::BIGINT
           % 32 AS state_bucket
  FROM probes CROSS JOIN depths
),
est AS (
  SELECT user_id, MIN(COALESCE(state_cnt, 0)) AS cm_estimate
  FROM pb LEFT JOIN state USING (state_depth, state_bucket)
  GROUP BY user_id
),
exact AS (
  SELECT user_id, count(*) AS exact_cnt
  FROM events WHERE user_id % 10 = 0 GROUP BY user_id
)
SELECT est.user_id, est.cm_estimate, exact.exact_cnt,
       est.cm_estimate - exact.exact_cnt AS overestimate
FROM est JOIN exact USING (user_id)
ORDER BY user_id
"""


def events_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner: bin-pack hour-partitions into
    ~500-row output files by contiguous prefix-sum assignment — the
    table-maintenance pass every petabyte lakehouse runs (a 100 TB
    events table written hourly accumulates millions of KB-sized files;
    scans then pay per-file open/seek instead of streaming). The fixture
    is honest about the pathology: 10k rows shredded across 720
    hour-partitions (~14 rows each).

    Plan shape: the planner NEVER touches row-level data after the
    per-partition stats aggregate (one row per partition — at a real
    deployment these come free from the table manifest); assignment is
    ops/pack.prefix_sum's two-level scan (bucketed windows + one
    bucket-totals broadcast), so there is no single-task global window
    anywhere. file_id = start-offset div target, the same
    concat-and-chunk arithmetic as sequence_packing, so files fill to
    the target and only the last runs short."""
    from dynamic_etl_spark.ops.pack import prefix_sum

    ev = t(spark, sf_dir, "events")
    hour_key = F.expr(
        "(unix_micros(CAST(ts AS TIMESTAMP)) - 1704067200000000)"
        " div 3600000000"
    ).cast("long")
    parts = ev.groupBy(hour_key.alias("part_key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    cum = prefix_sum(parts, "part_key", "n_rows", out_col="cum_rows")
    target = 500
    plan = cum.select(
        F.expr(f"(cum_rows - n_rows) div {target}").alias("file_id"),
        "part_key",
        "n_rows",
    )
    return (
        plan.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_partitions"),
            F.sum("n_rows").alias("n_rows_total"),
            F.min("part_key").alias("first_hour"),
            F.max("part_key").alias("last_hour"),
        )
        .orderBy("file_id")
    )


COMPACTION_PLAN_ORACLE = """
WITH parts AS (
  SELECT (epoch_us(ts) - 1704067200000000) // 3600000000 AS part_key,
         count(*) AS n_rows
  FROM events GROUP BY 1
),
cum AS (
  SELECT part_key, n_rows,
         SUM(n_rows) OVER (ORDER BY part_key
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rows
  FROM parts
)
SELECT CAST((cum_rows - n_rows) // 500 AS BIGINT) AS file_id,
       count(*) AS n_partitions,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows_total,
       min(part_key) AS first_hour,
       max(part_key) AS last_hour
FROM cum
GROUP BY 1
ORDER BY file_id
"""


QUERIES: QueryRegistry = {
    "events_tumbling_window": Query(
        events_tumbling_window, TUMBLING_ORACLE, "1-hour tumbling window counts/sums"
    ),
    "events_sliding_window": Query(
        events_sliding_window, SLIDING_ORACLE, "1h/30m sliding window"
    ),
    "events_sessionization": Query(
        events_sessionization, SESSION_ORACLE, "5-minute-gap session windows per user"
    ),
    "events_json_extract": Query(
        events_json_extract, JSON_ORACLE, "JSON property extraction + filter"
    ),
    "events_rate_profile": Query(
        events_rate_profile, RATE_ORACLE, "per-type conditional counts + global share"
    ),
    "count_min_maintenance": Query(
        count_min_maintenance, COUNT_MIN_ORACLE,
        "maintained Count-Min point-frequency sketch: md5-slice hash "
        "rows, exact-monoid merge, overestimate-only probe estimates",
    ),
    "events_compaction_plan": Query(
        events_compaction_plan, COMPACTION_PLAN_ORACLE,
        "small-files compaction planner: hour-partition stats bin-packed "
        "into ~500-row files via the two-level prefix sum (no single-task "
        "window)",
    ),
    "events_asof_last_purchase": Query(
        events_asof_last_purchase,
        ASOF_ORACLE,
        "as-of join via union + running last-non-null vs DuckDB native ASOF",
    ),
    "events_range_interval_join": Query(
        events_range_interval_join,
        RANGE_ORACLE,
        "bucketized point-in-interval equi-join vs DuckDB inequality join",
    ),
    "events_funnel_conversion": Query(
        events_funnel_conversion,
        FUNNEL_ORACLE,
        "view->click->purchase funnel stage counts + conversion rates",
    ),
    "events_value_percentiles": Query(
        events_value_percentiles,
        PERCENTILES_ORACLE,
        "exact PERCENTILE_CONT quartiles/tails per event_type",
    ),
    "events_rolling_user_value": Query(
        events_rolling_user_value,
        ROLLING_ORACLE,
        "trailing 1-hour RANGE-frame count/exact-sum per user",
    ),
    "events_interarrival_profile": Query(
        events_interarrival_profile,
        INTERARRIVAL_ORACLE,
        "per-user inter-arrival gap stats from a total-ordered lag",
    ),
    "events_type_pivot": Query(
        events_type_pivot,
        PIVOT_ORACLE,
        "long->wide pivot: per-user counts, pinned value list, one shuffle",
    ),
    "events_type_unpivot": Query(
        events_type_unpivot,
        UNPIVOT_ORACLE,
        "wide->long unpivot/melt including zero cells",
    ),
    "events_retention_cohorts": Query(
        events_retention_cohorts,
        COHORT_ORACLE,
        "first-seen-week cohorts x week-offset distinct-user retention",
    ),
    "events_rolling_distinct_users": Query(
        events_rolling_distinct_users,
        ROLLING_DISTINCT_ORACLE,
        "windowed distinct count via size(collect_set) over a RANGE frame",
    ),
    "events_value_histogram": Query(
        events_value_histogram,
        HISTOGRAM_ORACLE,
        "fixed-width binned histogram from identical floor arithmetic",
    ),
    "events_equidepth_deciles": Query(
        events_equidepth_deciles,
        EQUIDEPTH_ORACLE,
        "equi-depth ntile(10) histogram, total-order tie-break",
    ),
    "events_fill_forward": Query(
        events_fill_forward,
        FILL_FORWARD_ORACLE,
        "LOCF imputation per user in total order; leading nulls preserved",
    ),
    "events_hourly_resample": Query(
        events_hourly_resample,
        RESAMPLE_ORACLE,
        "hourly regridding with linear interpolation, exact-micros "
        "arithmetic, no as-of/range join",
    ),
    "events_hourly_heatmap": Query(
        events_hourly_heatmap,
        HEATMAP_ORACLE,
        "hour-of-day x event-type load heatmap with per-hour shares",
    ),
    "events_transition_matrix": Query(
        events_transition_matrix,
        TRANSITION_ORACLE,
        "first-order Markov transitions over per-user sequences, "
        "row-normalized from exact counts",
    ),
    "heavy_hitter_maintenance": Query(
        heavy_hitter_maintenance,
        HEAVY_HITTER_ORACLE,
        "maintained Misra-Gries heavy hitters: mergeable k=8 summaries over date slices",
    ),
    "reservoir_sample_maintenance": Query(
        reservoir_sample_maintenance,
        RESERVOIR_ORACLE,
        "maintained per-key uniform reservoir: merge-invariant bottom-n priorities",
    ),
    "quantile_hist_maintenance": Query(
        quantile_hist_maintenance,
        QUANTILE_HIST_ORACLE,
        "maintained P50/P90/P99 from mergeable integer histograms over date slices",
    ),
    "events_zorder_tiles": Query(
        events_zorder_tiles,
        ZORDER_TILES_ORACLE,
        "Morton-tile locality audit of the (hour x value) grid — bit-exact Z keys",
    ),
    "events_type_pagerank": Query(
        events_type_pagerank, None,
        "damped stationary distribution of the event-type transition graph "
        "(rows-only; numpy-checked in pytest)",
    ),
    "distinct_sketch_maintenance": Query(
        distinct_sketch_maintenance,
        None,
        "maintained HLL distinct state: slices sketched independently "
        "and folded (rows-only; tolerance pytest)",
    ),
    "events_type_pagerank_exacthash": Query(
        events_type_pagerank_exacthash,
        PAGERANK_EXACTHASH_ORACLE,
        "PageRank in integer fixed-point: BIGINT 1e-12 rank units, "
        "floor divisions, exact 85/100 damping, fixed 12 rounds — the "
        "full power iteration replayed by a DuckDB recursive CTE",
    ),
    "distinct_sketch_maintenance_exacthash": Query(
        distinct_sketch_maintenance_exacthash,
        DISTINCT_SKETCH_EXACTHASH_ORACLE,
        "the maintained distinct sketch in md5-register form: slice "
        "registers MAX-folded, one-shot DuckDB twin proves the merge "
        "tree lossless (the count_min_maintenance convention)",
    ),
    "rank_sketch_maintenance": Query(
        rank_sketch_maintenance,
        None,
        "maintained unknown-range P50/P90/P99 from mergeable KLL rank "
        "sketches over date slices (rows-only; rank-error-bound pytest)",
    ),
    "rank_sketch_finalize_exact": Query(
        rank_sketch_finalize_exact,
        RANK_SKETCH_FINALIZE_ORACLE,
        "KLL finalize arithmetic over a deterministic synthetic state: "
        "weighted cumulative-rank selection, hash-checked",
    ),
    "events_minmax_scaled": Query(
        events_minmax_scaled,
        MINMAX_ORACLE,
        "per-group min-max feature scaling, extrema broadcast back",
    ),
    "events_value_zscore": Query(
        events_value_zscore,
        ZSCORE_ORACLE,
        "z-score standardization from exact-decimal moment sums",
    ),
    "events_value_trend": Query(
        events_value_trend,
        VALUE_TREND_ORACLE,
        "per-type OLS time-trend + Pearson r from one-pass integer/"
        "decimal moment sums (drift detector)",
    ),
}
