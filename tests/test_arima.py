"""ARIMA family: closed-form distributed ARIMA(2,d,0) and the general
applyInPandas ARIMA(p,d,q) (Hannan-Rissanen)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from neurondb_spark.ml.timeseries import arima2_fit, arima_fit


def _arma_series(n, phi, theta, c0=0.3, seed=5, sigma=1.0):
    rng = random.Random(seed)
    p, q = len(phi), len(theta)
    z, e = [], []
    for t in range(n):
        eps = rng.gauss(0.0, sigma)
        val = c0 + eps
        for i in range(p):
            if t - 1 - i >= 0:
                val += phi[i] * z[t - 1 - i]
        for i in range(q):
            if t - 1 - i >= 0:
                val += theta[i] * e[t - 1 - i]
        z.append(val)
        e.append(eps)
    return z


def _series_df(spark, series: dict[str, list[float]]):
    rows = [
        (sid, t, float(v))
        for sid, vals in series.items()
        for t, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "series_id string, t int, value double")


def test_arima_fit_recovers_ar2(spark):
    z = _arma_series(3000, phi=[0.55, -0.25], theta=[])
    df = _series_df(spark, {"a": z})
    row = arima_fit(df, "t", "value", ["series_id"], p=2, d=0, q=0,
                    horizon=2).collect()[0]
    assert abs(row.phi[0] - 0.55) < 0.08
    assert abs(row.phi[1] + 0.25) < 0.08
    assert row.theta == []
    assert len(row.forecast) == 2
    assert all(math.isfinite(v) for v in row.forecast)


def test_arima_fit_recovers_ma1(spark):
    z = _arma_series(4000, phi=[0.4], theta=[0.5])
    df = _series_df(spark, {"a": z})
    row = arima_fit(df, "t", "value", ["series_id"], p=1, d=0, q=1,
                    horizon=1).collect()[0]
    assert abs(row.phi[0] - 0.4) < 0.12
    assert abs(row.theta[0] - 0.5) < 0.15
    assert row.sigma2 == pytest.approx(1.0, abs=0.25)


def test_arima_fit_d1_integrates_back_to_level(spark):
    # random walk with AR(1) increments: forecasts must stay near the
    # last level, not near the increment scale
    z = _arma_series(800, phi=[0.3], theta=[])
    level = []
    acc = 100.0
    for v in z:
        acc += v
        level.append(acc)
    df = _series_df(spark, {"a": level})
    row = arima_fit(df, "t", "value", ["series_id"], p=1, d=1, q=0,
                    horizon=3).collect()[0]
    assert len(row.forecast) == 3
    assert abs(row.forecast[0] - level[-1]) < 30.0


def test_arima_fit_multiple_series_parallel(spark):
    series = {f"s{i}": _arma_series(400, phi=[0.5], theta=[], seed=i)
              for i in range(6)}
    df = _series_df(spark, series).repartition(4)
    out = arima_fit(df, "t", "value", ["series_id"], p=1, d=0, q=0,
                    horizon=1)
    rows = {r.series_id: r for r in out.collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert abs(r.phi[0] - 0.5) < 0.2


def test_arima_fit_short_series_fallback(spark):
    df = _series_df(spark, {"tiny": [1.0, 2.0, 1.5]})
    row = arima_fit(df, "t", "value", ["series_id"], p=2, d=0, q=1,
                    horizon=2).collect()[0]
    assert row.phi == [0.0, 0.0]
    assert row.intercept == pytest.approx(1.5)


def test_arima2_closed_form_matches_lstsq(spark):
    import numpy as np

    z = _arma_series(500, phi=[0.5, -0.2], theta=[])
    df = _series_df(spark, {"a": z})
    row = arima2_fit(df, "t", "value", ["series_id"], d=0,
                     horizon=1).collect()[0]
    arr = np.asarray(z)
    X = np.stack([np.ones(len(arr) - 2), arr[1:-1], arr[:-2]], axis=1)
    beta, *_ = np.linalg.lstsq(X, arr[2:], rcond=None)
    # dsum quantizes each addend to DECIMAL(38,6) for cross-engine
    # order-independence, so agreement with raw lstsq is ~1e-4, not ulp
    assert row.c0 == pytest.approx(beta[0], abs=1e-3)
    assert row.a1 == pytest.approx(beta[1], abs=1e-4)
    assert row.a2 == pytest.approx(beta[2], abs=1e-4)
    # 1-step forecast = c0 + a1*z_T + a2*z_{T-1}
    expect = row.c0 + row.a1 * z[-1] + row.a2 * z[-2]
    assert row.forecast_1 == pytest.approx(expect, rel=1e-12)


def test_arima2_rejects_high_d(spark):
    df = _series_df(spark, {"a": [1.0, 2.0]})
    with pytest.raises(ValueError):
        arima2_fit(df, "t", "value", ["series_id"], d=2)
