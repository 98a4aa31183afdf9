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

import pandas as pd
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


# --------------------------------------------------------------- ARIMA
# Reference: train_arima / forecast_arima (ml_timeseries.c:443,702;
# catalog neurondb--1.0.sql:1766-1779). Two paths:
#
# 1. arima2_fit — ARIMA(2,d,0), d∈{0,1}: fully distributed closed-form.
#    Differencing + lag features are window expressions; the per-series
#    normal equations aggregate through exact decimal sums; the 3×3 system
#    solves by Cramer's rule. The Cramer/forecast FORMULA STRINGS below are
#    evaluated verbatim by both Spark (F.expr) and the DuckDB oracle, so
#    float association order — hence every bit — is identical by
#    construction.
# 2. arima_fit — general ARIMA(p,d,q) via groupBy().applyInPandas
#    (Hannan–Rissanen two-stage least squares per series). The reference
#    fits each series single-node too; here every series fits in parallel
#    across executors, which is the right 100 TB shape for many-series
#    corpora (one series never exceeds a partition).

# Cramer's rule for [c0, a1, a2] in:  [n s1 s2; s1 s11 s12; s2 s12 s22]
# · [c0 a1 a2]' = [sy s1y s2y]  (AR(2)+intercept normal equations; s_i are
# exact-decimal sums so any row order yields the same doubles).
ARIMA2_DET = (
    "(n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)"
    " + s2 * (s1 * s12 - s11 * s2))"
)
ARIMA2_C0 = (
    "((sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)"
    f" + s2 * (s1y * s12 - s11 * s2y)) / {ARIMA2_DET})"
)
ARIMA2_A1 = (
    "((n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)"
    f" + s2 * (s1 * s2y - s1y * s2)) / {ARIMA2_DET})"
)
ARIMA2_A2 = (
    "((n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)"
    f" + sy * (s1 * s12 - s11 * s2)) / {ARIMA2_DET})"
)


def arima2_forecast_exprs(d: int, horizon: int) -> list[tuple[str, str]]:
    """(name, expression) layers for the h-step forecast recursion; each
    layer may reference previous names. Shared by Spark and the oracle."""
    out = []
    for h in range(1, horizon + 1):
        prev1 = f"fz{h - 1}" if h >= 2 else "lz1"
        prev2 = f"fz{h - 2}" if h >= 3 else ("lz1" if h == 2 else "lz2")
        out.append((f"fz{h}", f"(c0 + a1 * {prev1} + a2 * {prev2})"))
    for h in range(1, horizon + 1):
        if d == 0:
            out.append((f"forecast_{h}", f"fz{h}"))
        else:  # integrate once: x*_{T+h} = x_T + Σ z*
            base = f"forecast_{h - 1}" if h >= 2 else "lx"
            out.append((f"forecast_{h}", f"({base} + fz{h})"))
    return out


def arima2_fit(
    df: DataFrame, ts_col: str, value_col: str, partition_cols: list[str],
    d: int = 1, horizon: int = 3, order_extra: list[str] | None = None,
) -> DataFrame:
    """Closed-form distributed ARIMA(2,d,0) fit + h-step forecast per
    series (see module comment). Returns one row per series with c0/a1/a2
    and forecast_1..forecast_h columns.

    Last-observation selection: ``F.max`` over a struct ordered by
    (ts, *order_extra, …). When timestamps can collide within a series,
    PASS ``order_extra`` (e.g. an event id) — without it the tie breaks on
    the z/x payload values themselves, which is value-dependent and
    engine-divergent. The registry oracle encodes this order as
    epoch_us(ts)·10^8 + event_id, which agrees with the lexicographic
    (ts, event_id) struct order only while event_id < 10^8 (asserted
    there; same assumption as the pre-existing AR(1) oracle)."""
    if d not in (0, 1):
        raise ValueError("neurondb: arima2_fit supports d in {0, 1}; "
                         "use arima_fit for general (p,d,q)")
    wn = W.partitionBy(*partition_cols).orderBy(ts_col, *(order_extra or []))
    out = df.withColumn("_x", F.col(value_col).cast("double")).withColumn(
        "_z", F.col("_x")
    )
    for _ in range(d):
        out = (
            out.withColumn("_zl", F.lag("_z").over(wn))
            .where(F.col("_zl").isNotNull())
            .withColumn("_z", F.col("_z") - F.col("_zl"))
            .drop("_zl")
        )
    out = (
        out.withColumn("_z1", F.lag("_z", 1).over(wn))
        .withColumn("_z2", F.lag("_z", 2).over(wn))
        .where(F.col("_z2").isNotNull())
    )
    z, z1, z2 = F.col("_z"), F.col("_z1"), F.col("_z2")
    order_struct = F.struct(
        F.col(ts_col).alias("_t"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_extra or [])],
        z.alias("_lz1"), z1.alias("_lz2"), F.col("_x").alias("_lx"),
    )
    agg = out.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(z1).alias("s1"), dsum(z2).alias("s2"), dsum(z).alias("sy"),
        dsum(z1 * z1).alias("s11"), dsum(z1 * z2).alias("s12"),
        dsum(z2 * z2).alias("s22"),
        dsum(z1 * z).alias("s1y"), dsum(z2 * z).alias("s2y"),
        F.max(order_struct).alias("_last"),
    )
    params = agg.select(
        *partition_cols, "n", "s1", "s2", "sy", "s11", "s12", "s22",
        "s1y", "s2y",
        F.col("_last._lz1").alias("lz1"), F.col("_last._lz2").alias("lz2"),
        F.col("_last._lx").alias("lx"),
    ).select(
        *partition_cols,
        F.expr(ARIMA2_C0).alias("c0"),
        F.expr(ARIMA2_A1).alias("a1"),
        F.expr(ARIMA2_A2).alias("a2"),
        "lz1", "lz2", "lx",
    )
    for name, expr in arima2_forecast_exprs(d, horizon):
        params = params.withColumn(name, F.expr(expr))
    return params.select(
        *partition_cols, "c0", "a1", "a2",
        *[f"forecast_{h}" for h in range(1, horizon + 1)],
    )


def _hannan_rissanen(z, p: int, q: int):
    """Two-stage least-squares ARMA fit (deterministic, numpy-only).
    Returns (phi[p], theta[q], intercept, residuals)."""
    import numpy as np

    z = np.asarray(z, dtype=float)
    m = max(p + q + 5, 2 * max(p, q, 1))
    if len(z) < m + max(p, q) + 5:
        mu = float(np.mean(z)) if len(z) else 0.0
        return [0.0] * p, [0.0] * q, mu, z - mu if len(z) else z
    if q == 0:
        cols = [np.ones(len(z) - p)] + [z[p - 1 - i : len(z) - 1 - i] for i in range(p)]
        X = np.stack(cols, axis=1)
        y = z[p:]
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        resid = y - X @ beta
        return list(map(float, beta[1 : 1 + p])), [], float(beta[0]), resid
    # stage 1: long-AR(m) residuals
    Xm = np.stack(
        [np.ones(len(z) - m)] + [z[m - 1 - i : len(z) - 1 - i] for i in range(m)],
        axis=1,
    )
    ym = z[m:]
    bm, *_ = np.linalg.lstsq(Xm, ym, rcond=None)
    e = np.concatenate([np.zeros(m), ym - Xm @ bm])  # aligned with z
    # stage 2: regress z_t on p z-lags + q e-lags
    k = max(p, q)
    start = m + k
    rows = len(z) - start
    cols = [np.ones(rows)]
    cols += [z[start - 1 - i : len(z) - 1 - i] for i in range(p)]
    cols += [e[start - 1 - i : len(e) - 1 - i] for i in range(q)]
    X = np.stack(cols, axis=1)
    y = z[start:]
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    return (
        list(map(float, beta[1 : 1 + p])),
        list(map(float, beta[1 + p : 1 + p + q])),
        float(beta[0]),
        resid,
    )


def arima_fit(
    df: DataFrame, ts_col: str, value_col: str, partition_cols: list[str],
    p: int = 1, d: int = 0, q: int = 0, horizon: int = 1,
    order_extra: list[str] | None = None,
) -> DataFrame:
    """General ARIMA(p,d,q) fit + forecast, one series per group via
    applyInPandas (Arrow-batched; series-parallel across executors).
    Output: partition cols + phi array, theta array, intercept, sigma2,
    forecast array (h values on the ORIGINAL scale)."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType, DoubleType, StructField, StructType,
    )

    key_fields = [df.schema[c] for c in partition_cols]
    schema = StructType(
        list(key_fields)
        + [
            StructField("phi", ArrayType(DoubleType())),
            StructField("theta", ArrayType(DoubleType())),
            StructField("intercept", DoubleType()),
            StructField("sigma2", DoubleType()),
            StructField("forecast", ArrayType(DoubleType())),
        ]
    )
    sort_cols = [ts_col] + list(order_extra or [])

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        z = x.copy()
        tails = []
        for _ in range(d):
            tails.append(z[-1] if len(z) else 0.0)
            z = np.diff(z)
        phi, theta, c0, resid = _hannan_rissanen(z, p, q)
        sigma2 = float(np.mean(resid ** 2)) if len(resid) else 0.0
        zh, eh = list(z), list(resid)
        fz: list[float] = []
        for h in range(horizon):
            val = c0
            for i in range(p):
                idx = h - 1 - i
                if idx >= 0:
                    val += phi[i] * fz[idx]
                elif len(zh) >= -idx:
                    val += phi[i] * zh[idx]
            for i in range(q):
                idx = h - 1 - i
                if idx < 0 and len(eh) >= -idx:  # future shocks are 0
                    val += theta[i] * eh[idx]
            fz.append(float(val))
        preds = np.asarray(fz)
        for tail in reversed(tails):
            preds = tail + np.cumsum(preds)
        row = {c: pdf[c].iloc[0] for c in partition_cols}
        row.update(
            phi=phi, theta=theta, intercept=c0, sigma2=sigma2,
            forecast=[float(v) for v in preds],
        )
        return pd.DataFrame([row])

    return df.groupBy(*partition_cols).applyInPandas(_fit, schema)


def monitor_drift_timeseries(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    baseline_lo,
    baseline_hi,
    bucket: str = "day",
    lo: float = 0.0,
    hi: float = 1.0,
    bins: int = 20,
) -> DataFrame:
    """monitor_drift_timeseries (ml_drift_time.c; SQL surface
    neurondb--1.0.sql:1663-1675): per-time-bucket Jensen-Shannon
    divergence of ``value_col``'s histogram against a fixed baseline
    period [baseline_lo, baseline_hi).

    Fully distributed: one groupBy(bucket, bin) histogram pass for the
    current stream, one for the baseline, a bin-keyed join, and a
    per-bucket bsum of the JS terms — no driver loop over windows, so
    the number of windows is unbounded. Deterministic binning
    (clamp(floor((x−lo)/w), 0, bins−1)) and exact integer counts make
    every emitted double SQL-oracle hash-matchable.
    """
    from neurondb_spark.functions.aggregates import bsum

    def _ts_lit(x):
        # A naive-datetime literal is converted through the PYTHON
        # process timezone (TZ env), which silently shifts the baseline
        # boundary on non-UTC hosts; a string cast parses in the SESSION
        # timezone, which the engine pins to UTC (session.py).
        if hasattr(x, "isoformat"):
            x = x.isoformat(sep=" ")
        return F.lit(x).cast("timestamp")

    baseline_lo, baseline_hi = _ts_lit(baseline_lo), _ts_lit(baseline_hi)
    w = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((F.col(value_col) - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    ts = F.col(ts_col)
    base = df.where((ts >= baseline_lo) & (ts < baseline_hi))
    bl = base.groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias("nq"))
    bl_tot = base.count()
    cur = df.where(ts >= baseline_hi)
    ch = cur.groupBy(
        F.date_trunc(bucket, ts).alias("bucket"), b.alias("bin")
    ).agg(F.count(F.lit(1)).alias("np_"))
    ctot = cur.groupBy(F.date_trunc(bucket, ts).alias("bucket")).agg(
        F.count(F.lit(1)).alias("nt")
    )
    j = (
        ch.join(ctot, "bucket")
        .join(F.broadcast(bl), "bin", "left")
        .select(
            "bucket",
            (F.col("np_").cast("double") / F.col("nt")).alias("p"),
            (F.coalesce(F.col("nq"), F.lit(0)).cast("double") / bl_tot).alias("q"),
        )
    )
    # bins present in the baseline but absent from a bucket contribute
    # 0.5·q·log(q/(q/2)) — fold them in by unioning q-only rows per bucket
    qonly = (
        ctot.select("bucket").crossJoin(F.broadcast(bl))
        .join(ch.select("bucket", "bin").withColumn("_has", F.lit(1)),
              ["bucket", "bin"], "left")
        .where(F.col("_has").isNull())
        .select(
            "bucket", F.lit(0.0).alias("p"),
            (F.col("nq").cast("double") / bl_tot).alias("q"),
        )
    )
    allrows = j.unionByName(qonly)
    m = (F.col("p") + F.col("q")) / 2.0
    term = (
        F.when(F.col("p") > 0.0, 0.5 * F.col("p") * F.log(F.col("p") / m))
        .otherwise(F.lit(0.0))
        + F.when(F.col("q") > 0.0, 0.5 * F.col("q") * F.log(F.col("q") / m))
        .otherwise(F.lit(0.0))
    )
    return (
        allrows.groupBy("bucket")
        .agg(bsum(term).alias("js_divergence"))
    )
