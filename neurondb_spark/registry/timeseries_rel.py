"""Time-series queries over events + relational-breadth queries
(grouping sets / set ops / semi-anti joins — SURVEY §2.0 surface proof)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark import oracle as O
from neurondb_spark.ml.timeseries import (
    ARIMA2_A1,
    ARIMA2_A2,
    ARIMA2_C0,
    ar1_fit,
    arima2_fit,
    arima2_forecast_exprs,
    moving_stats,
    rolling_anomalies,
)
from neurondb_spark.registry.common import events as load_events
from neurondb_spark.registry.common import t


def _q_moving_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).where(F.col("user_id") <= 20)
    out = moving_stats(ev, "ts", "value", ["user_id"], window_rows=10,
                       order_extra=["event_id"])
    return out.select("event_id", "user_id", "moving_min", "moving_max")


_SQL_MOVING_STATS = """SELECT event_id, user_id,
  MIN(value) OVER w AS moving_min,
  MAX(value) OVER w AS moving_max
FROM events WHERE user_id <= 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)"""


def _q_rolling_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomalies. avg() over a window is order-dependent
    only in the last bits; the anomaly PREDICATE uses a 3σ margin so a
    1-ulp wobble cannot flip membership in practice; values are rounded
    for the hash."""
    ev = load_events(spark, sf_dir)
    out = rolling_anomalies(ev, "ts", "value", ["event_type"], window_rows=50,
                            threshold=3.0, order_extra=["event_id"])
    return out.select(
        "event_id", "event_type",
        F.round("roll_mean", 6).alias("roll_mean"),
        F.round("roll_std", 6).alias("roll_std"),
    )


_SQL_ROLLING_ANOMALIES = """WITH r AS (
  SELECT event_id, event_type, value,
    AVG(value) OVER w AS mu,
    sqrt(AVG(value * value) OVER w - (AVG(value) OVER w) * (AVG(value) OVER w)) AS sigma
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))
SELECT event_id, event_type, round(mu, 6) AS roll_mean, round(sigma, 6) AS roll_std
FROM r WHERE sigma > 0 AND abs(value - mu) > 3.0 * sigma"""


def _q_ar1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    return ar1_fit(ev, "ts", "value", ["event_type"], order_extra=["event_id"])


_SQL_AR1 = f"""WITH lagged AS (
  SELECT event_type, ts, event_id, value,
         lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev
  FROM events),
l AS (SELECT * FROM lagged WHERE prev IS NOT NULL),
s AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
    {O.dsum('prev')} AS sx, {O.dsum('value')} AS sy,
    {O.dsum('prev * value')} AS sxy, {O.dsum('prev * prev')} AS sxx,
    max_by(value, CAST(epoch_us(ts) AS HUGEINT) * 100000000 + event_id) AS last_v
  FROM l GROUP BY event_type)
SELECT event_type,
  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS phi,
  (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
  ((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
   + ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * last_v) AS forecast_next
FROM s"""


def _q_arima(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir)
    # The oracle's order key epoch_us(ts)·10^8 + event_id equals the
    # lexicographic (ts, event_id) struct order only while event_id < 10^8
    # — assert it instead of silently diverging on bigger ids (shared
    # assumption with the AR(1) oracle's max_by key).
    ev = ev.withColumn(
        "event_id",
        F.when(
            F.col("event_id") >= 100_000_000,
            F.raise_error("neurondb: arima oracle assumes event_id < 1e8"),
        ).otherwise(F.col("event_id")),
    )
    return arima2_fit(ev, "ts", "value", ["event_type"], d=1, horizon=3,
                      order_extra=["event_id"])


def _sql_arima() -> str:
    """Oracle replays the identical closed-form recursion: same exact-sum
    normal equations, same Cramer strings, same forecast layers (the
    formula strings are shared with ml/timeseries.py)."""
    ok = "CAST(epoch_us(ts) AS HUGEINT) * 100000000 + event_id"
    sql = f"""WITH x0 AS (
  SELECT event_type, ts, event_id, CAST(value AS DOUBLE) AS x,
         CAST(value AS DOUBLE) - lag(CAST(value AS DOUBLE))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS z
  FROM events),
x1 AS (
  SELECT event_type, ts, event_id, x, z,
         lag(z, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS z1,
         lag(z, 2) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS z2
  FROM x0 WHERE z IS NOT NULL),
l AS (SELECT * FROM x1 WHERE z2 IS NOT NULL),
s AS (
  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
    {O.dsum('z1')} AS s1, {O.dsum('z2')} AS s2, {O.dsum('z')} AS sy,
    {O.dsum('z1 * z1')} AS s11, {O.dsum('z1 * z2')} AS s12,
    {O.dsum('z2 * z2')} AS s22,
    {O.dsum('z1 * z')} AS s1y, {O.dsum('z2 * z')} AS s2y,
    max_by(z, {ok}) AS lz1, max_by(z1, {ok}) AS lz2, max_by(x, {ok}) AS lx
  FROM l GROUP BY event_type),
p0 AS (
  SELECT event_type, {ARIMA2_C0} AS c0, {ARIMA2_A1} AS a1, {ARIMA2_A2} AS a2,
         lz1, lz2, lx
  FROM s)"""
    prev = "p0"
    for i, (name, expr) in enumerate(arima2_forecast_exprs(d=1, horizon=3)):
        sql += f",\np{i + 1} AS (SELECT *, {expr} AS {name} FROM {prev})"
        prev = f"p{i + 1}"
    sql += (
        f"\nSELECT event_type, c0, a1, a2, forecast_1, forecast_2, forecast_3"
        f" FROM {prev}"
    )
    return sql


# --------------------------------------------------- relational breadth

def _q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_SQL_ROLLUP_REVENUE = f"""SELECT l_returnflag, l_linestatus,
  {O.dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""


def _q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers WITH orders above 100k but WITHOUT any F-status order —
    semi + anti join composition."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    big = orders.where(F.col("o_totalprice") > 100000).select("o_custkey")
    fstat = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .join(fstat, cust.c_custkey == fstat.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


_SQL_SEMI_ANTI = """SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 100000)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F')"""


def _q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT surface: users who clicked AND purchased, minus
    users who errored."""
    ev = load_events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select("user_id")
    buys = ev.where(F.col("event_type") == "purchase").select("user_id")
    errs = ev.where(F.col("event_type") == "error").select("user_id")
    return clicks.intersect(buys).exceptAll(errs.distinct())


_SQL_SETOPS = """SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error'"""


def _q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decompose: centered 5-row trend + per-phase (period=4)
    seasonal means; window avgs rounded on both sides (windowed AVG
    association differs across engines)."""
    from neurondb_spark.ml.timeseries import seasonal_decompose

    ev = load_events(spark, sf_dir).where(F.col("user_id") <= 5)
    out = seasonal_decompose(ev, "ts", "value", ["user_id"], period=4,
                             order_extra=["event_id"])
    return out.select(
        "event_id", "user_id",
        F.round("trend", 6).alias("trend"),
        F.col("phase").cast("int").alias("phase"),
        F.round("seasonal", 6).alias("seasonal"),
    )


_SQL_SEASONAL = """WITH tr AS (
  SELECT event_id, user_id, ts, value,
         AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS trend,
         CAST((ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) % 4 AS INTEGER) AS phase
  FROM events WHERE user_id <= 5)
SELECT event_id, user_id, round(trend, 6) AS trend, phase,
       round(AVG(value - trend) OVER (PARTITION BY user_id, phase), 6) AS seasonal
FROM tr"""


QUERIES = {
    "ts_seasonal_decompose": (_q_seasonal, _SQL_SEASONAL),
    "ts_moving_stats": (_q_moving_stats, _SQL_MOVING_STATS),
    "ts_rolling_anomalies": (_q_rolling_anomalies, _SQL_ROLLING_ANOMALIES),
    "ts_ar1_forecast": (_q_ar1, _SQL_AR1),
    "ts_arima_forecast": (_q_arima, _sql_arima()),
    "rollup_lineitem": (_q_rollup_revenue, _SQL_ROLLUP_REVENUE),
    "semi_anti_join": (_q_semi_anti, _SQL_SEMI_ANTI),
    "set_ops_users": (_q_setops, _SQL_SETOPS),
}
