"""ML API tests: train/predict/evaluate contracts with metric thresholds —
the reference's self-checking test style (tests/sql/basic/001_linreg_basic.sql:41-70)."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.catalog import Catalog  # noqa: E402
from neurondb_spark.ml.api import MLEngine, list_algorithms  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def engine():
    return MLEngine(Catalog(tempfile.mkdtemp(prefix="neurondb_ml_test_")))


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "y", (F.col("label") < 5).cast("double")
    )


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_list_algorithms():
    algos = list_algorithms()
    names = {a["algorithm"] for a in algos}
    assert {"linear_regression", "logistic_regression", "random_forest",
            "kmeans", "gmm", "pca", "svm", "naive_bayes"} <= names


def test_linear_regression_recovers_relationship(engine, lineitem):
    # synthetic target with a known linear law: y = 3x + 5 + small noise
    df = lineitem.withColumn(
        "y", 3.0 * F.col("l_quantity") + 5.0 + 0.01 * F.col("l_discount")
    )
    mid = engine.train(df, "linear_regression", ["l_quantity"], target="y")
    metrics = engine.evaluate(df, mid)
    assert metrics["r2"] > 0.99
    meta = engine.catalog.get("models", mid)
    assert meta["status"] == "ready"


def test_logistic_classification_beats_chance(engine, emb):
    mid = engine.train(emb, "logistic_regression", ["embedding"], target="y")
    m = engine.evaluate(emb, mid)
    assert m["accuracy"] > 0.5


def test_random_forest_classifier(engine, emb):
    mid = engine.train(
        emb, "random_forest", ["embedding"], target="label",
        params={"numTrees": 10},
    )
    m = engine.evaluate(emb, mid)
    assert 0.0 <= m["accuracy"] <= 1.0


def test_kmeans_clustering(engine, emb):
    mid = engine.train(emb, "kmeans", ["embedding"], params={"k": 4})
    m = engine.evaluate(emb, mid)
    assert -1.0 <= m["silhouette"] <= 1.0
    pred = engine.predict(emb, mid)
    assert pred.select("prediction").distinct().count() == 4


def test_pca_reduces_dim(engine, emb):
    mid = engine.train(emb, "pca", ["embedding"], params={"k": 4})
    pred = engine.predict(emb, mid)
    first = pred.select("pca_features").head()[0]
    assert len(first) == 4


def test_unknown_algorithm_raises(engine, emb):
    with pytest.raises(ValueError, match="unknown algorithm"):
        engine.train(emb, "quantum_forest", ["embedding"], target="y")


def test_unknown_model_raises(engine, emb):
    with pytest.raises(ValueError, match="unknown model"):
        engine.predict(emb, "nope-123")
