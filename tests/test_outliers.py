"""Isolation forest (ml_anomaly_detection.c:60-365 semantics)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def test_isolation_forest_finds_planted_anomalies(spark):
    from neurondb_spark.ml.outliers import isolation_forest

    rng = random.Random(7)
    # 200 inliers near the origin + 8 far-away planted anomalies
    rows = [
        (i, [rng.gauss(0.0, 0.5), rng.gauss(0.0, 0.5), rng.gauss(0.0, 0.5)])
        for i in range(200)
    ] + [
        (1000 + i, [10.0 + rng.random(), -9.0 - rng.random(), 8.0 + rng.random()])
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = isolation_forest(
        df, "v", n_trees=50, sample_size=64, contamination=0.05, seed=11,
        keep_cols=["id"],
    )
    flagged = {r["id"] for r in out.where(F.col("is_anomaly")).collect()}
    planted = {1000 + i for i in range(8)}
    assert planted <= flagged  # every planted anomaly caught
    # contamination=0.05 over 208 rows → ~10 flags; no mass false alarm
    assert len(flagged) <= 14
    # planted rows score strictly higher than the inlier median
    scores = {r["id"]: r["anomaly_score"] for r in out.collect()}
    inlier_scores = sorted(s for i, s in scores.items() if i < 1000)
    med = inlier_scores[len(inlier_scores) // 2]
    assert all(scores[i] > med for i in planted)


def test_ocsvm_flags_low_density_points(spark):
    """Planted far-away points get the lowest mean-RBF scores and land in
    the nu-quantile anomaly set (detect_anomalies_ocsvm semantics)."""
    from neurondb_spark.ml.outliers import ocsvm

    rng = random.Random(5)
    rows = [
        (i, [rng.gauss(0.0, 0.4), rng.gauss(0.0, 0.4)]) for i in range(95)
    ] + [(1000 + i, [8.0 + rng.random(), -8.0 - rng.random()]) for i in range(5)]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    out = ocsvm(df, "v", "id", nu=0.08, gamma=0.5, max_sv=32)
    flagged = {r["id"] for r in out.collect() if r["is_anomaly"]}
    assert {1000 + i for i in range(5)} <= flagged
    assert len(flagged) <= 10
    import pytest as _pt

    with _pt.raises(ValueError, match="nu"):
        ocsvm(df, "v", "id", nu=0.0)


def test_isolation_forest_deterministic_given_seed(spark):
    from neurondb_spark.ml.outliers import isolation_forest

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3)]) for i in range(60)],
        "id long, v array<double>",
    )
    a = isolation_forest(df, "v", n_trees=20, sample_size=32, seed=5,
                         keep_cols=["id"]).orderBy("id").collect()
    b = isolation_forest(df, "v", n_trees=20, sample_size=32, seed=5,
                         keep_cols=["id"]).orderBy("id").collect()
    assert [r["anomaly_score"] for r in a] == [r["anomaly_score"] for r in b]
