"""Time-series operators (SURVEY §2.8 ARIMA family) as window expressions.

Reference: train_arima / forecast_arima / detect_anomalies /
seasonal_decompose / monitor_drift_timeseries
(NeuronDB/src/ml/ml_timeseries.c:443,702,1144,1275,2128; ml_drift_time.c).

The reference fits ARIMA in C on a single backend's series. Here:
- AR(1) fit is CLOSED-FORM (lag-1 OLS through exact sums) — distributed,
  oracle-checkable, no sample cap; higher-order ARIMA would sample the
  (small) per-series data to the driver exactly like the reference does.
- moving average / rolling z-score anomaly / seasonal decompose are pure
  window expressions — shuffle once per series key, then sorted within
  partition; at 100 TB each series lives in one partition (series_id is
  the natural partition key) and the window never crosses partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from neurondb_spark.functions.aggregates import dsum


def moving_stats(
    df: DataFrame, ts_col: str, value_col: str, partition_cols: list[str],
    window_rows: int = 24, order_extra: list[str] | None = None,
) -> DataFrame:
    """Trailing moving average/min/max over the previous ``window_rows``
    rows (inclusive)."""
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(ts_col, *(order_extra or []))
        .rowsBetween(-(window_rows - 1), 0)
    )
    return (
        df.withColumn("moving_avg", F.avg(value_col).over(w))
        .withColumn("moving_min", F.min(value_col).over(w))
        .withColumn("moving_max", F.max(value_col).over(w))
    )


def rolling_anomalies(
    df: DataFrame, ts_col: str, value_col: str, partition_cols: list[str],
    window_rows: int = 48, threshold: float = 3.0,
    order_extra: list[str] | None = None,
) -> DataFrame:
    """detect_anomalies (ml_timeseries.c:1144): |x − rolling μ| > t·rolling σ
    (population σ over the trailing window, current row excluded from
    neither — matches a simple online monitor)."""
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(ts_col, *(order_extra or []))
        .rowsBetween(-(window_rows - 1), 0)
    )
    mu = F.avg(value_col).over(w)
    sq = F.avg(F.col(value_col) * F.col(value_col)).over(w)
    sigma = F.sqrt(sq - mu * mu)
    return (
        df.withColumn("roll_mean", mu)
        .withColumn("roll_std", sigma)
        .where(
            (F.col("roll_std") > 0)
            & (F.abs(F.col(value_col) - F.col("roll_mean")) > threshold * F.col("roll_std"))
        )
    )


def seasonal_decompose(
    df: DataFrame, ts_col: str, value_col: str, partition_cols: list[str],
    period: int = 24, order_extra: list[str] | None = None,
) -> DataFrame:
    """seasonal_decompose (ml_timeseries.c:1275): trend = centered moving
    average over one period; seasonal = per-phase mean of (x − trend);
    residual = x − trend − seasonal."""
    half = period // 2
    wt = (
        W.partitionBy(*partition_cols)
        .orderBy(ts_col, *(order_extra or []))
        .rowsBetween(-half, half)
    )
    wn = W.partitionBy(*partition_cols).orderBy(ts_col, *(order_extra or []))
    out = df.withColumn("trend", F.avg(value_col).over(wt))
    out = out.withColumn("phase", (F.row_number().over(wn) - 1) % period)
    ws = W.partitionBy(*partition_cols, "phase")
    out = out.withColumn(
        "seasonal", F.avg(F.col(value_col) - F.col("trend")).over(ws)
    )
    return out.withColumn(
        "residual", F.col(value_col) - F.col("trend") - F.col("seasonal")
    )


def ar1_fit(
    df: DataFrame, ts_col: str, value_col: str, partition_cols: list[str],
    order_extra: list[str] | None = None,
) -> DataFrame:
    """AR(1) per series: x_t = c + φ·x_{t−1} + ε, φ/c by exact-sum OLS on
    (x_{t−1}, x_t) pairs; also returns the 1-step forecast from the last
    observation (forecast_arima analog for p=1,d=0,q=0)."""
    wn = W.partitionBy(*partition_cols).orderBy(ts_col, *(order_extra or []))
    lagged = df.withColumn("_prev", F.lag(value_col).over(wn)).where(
        F.col("_prev").isNotNull()
    )
    x, y = F.col("_prev"), F.col(value_col)
    order_struct = F.struct(
        F.col(ts_col).alias("_t"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_extra or [])],
        y.alias("_last"),
    )
    agg = lagged.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x).alias("sx"), dsum(y).alias("sy"),
        dsum(x * y).alias("sxy"), dsum(x * x).alias("sxx"),
        F.max(order_struct).alias("_lastrow"),
    )
    phi = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    c = (F.col("sy") - phi * F.col("sx")) / F.col("n")
    last = F.col("_lastrow")["_last"]
    return agg.select(
        *partition_cols,
        phi.alias("phi"),
        c.alias("intercept"),
        (c + phi * last).alias("forecast_next"),
    )
