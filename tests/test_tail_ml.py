"""kNN model persistence, bayesian optimize, t-SNE/UMAP, OPQ rotation
(reference: ml_knn.c:759, ml_hyperparameter_tuning.c:560-700,
ml_dimensionality_reduction.c:60-820, ml_opq.c:94-480)."""

import os
import random
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _two_blobs(spark, n=60, seed=3):
    rng = random.Random(seed)
    rows = [
        (i, [rng.gauss(0, 0.3), rng.gauss(0, 0.3)], 0.0) for i in range(n // 2)
    ] + [
        (n + i, [rng.gauss(4, 0.3), rng.gauss(4, 0.3)], 1.0) for i in range(n // 2)
    ]
    return spark.createDataFrame(rows, "id long, v array<double>, y double")


def test_knn_model_train_predict_evaluate(spark):
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ml.api import MLEngine, list_algorithms

    assert any(a["algorithm"] == "knn" for a in list_algorithms())
    eng = MLEngine(Catalog(tempfile.mkdtemp(prefix="knn_model_")))
    df = _two_blobs(spark)
    mid = eng.train(df, "knn", ["v"], target="y", params={"k": 5})
    assert mid.startswith("knn-")
    # model payload persisted; predict works from the catalog alone
    pred = eng.predict(df, mid)
    rows = {r["id"]: r["prediction"] for r in pred.collect()}
    assert all(rows[r["id"]] == r["y"] for r in df.collect())
    m = eng.evaluate(df, mid)
    assert m["accuracy"] == 1.0
    with pytest.raises(ValueError, match="k must be"):
        eng.train(df, "knn", ["v"], target="y", params={"k": 0})


@pytest.mark.slow  # lifecycle/long-loop e2e; extended lane (r16)
def test_bayesian_optimize_deterministic_cycling(spark):
    from neurondb_spark.ml.automl import bayesian_optimize

    df = _two_blobs(spark)
    out = bayesian_optimize(
        df, "logistic_regression", ["v"], "y",
        {"regParam": [0.0, 0.5], "maxIter": [5, 10, 20]},
        n_calls=6, folds=2,
    )
    assert len(out["results"]) == 6
    # reference sampling: call i -> value[i % len] per param
    assert out["results"][0]["params"] == {"regParam": 0.0, "maxIter": 5}
    assert out["results"][1]["params"] == {"regParam": 0.5, "maxIter": 10}
    assert out["results"][5]["params"] == {"regParam": 0.5, "maxIter": 20}
    assert out["best"]["score"] >= max(r["score"] for r in out["results"]) - 1e-12


def test_tsne_separates_clusters(spark):
    from neurondb_spark.ml.dimreduce import tsne

    df = _two_blobs(spark, n=40)
    out = tsne(df, "v", "id", perplexity=10.0, iterations=300, seed=1)
    emb = {r["id"]: r["embedding"] for r in out.collect()}
    assert len(emb) == 40 and len(next(iter(emb.values()))) == 2
    a = np.array([emb[i] for i in emb if i < 40])
    b = np.array([emb[i] for i in emb if i >= 40])
    # clusters must stay separable: mean inter-cluster distance dominates
    # mean intra-cluster distance (t-SNE expands clusters, so compare
    # pairwise distances, not centroid-vs-spread)
    intra = np.linalg.norm(a[:, None] - a[None, :], axis=-1).mean()
    inter = np.linalg.norm(a[:, None] - b[None, :], axis=-1).mean()
    assert inter > 1.5 * intra


def test_umap_separates_clusters(spark):
    from neurondb_spark.ml.dimreduce import umap

    df = _two_blobs(spark, n=40)
    out = umap(df, "v", "id", n_neighbors=8, iterations=150, seed=1)
    emb = {r["id"]: r["embedding"] for r in out.collect()}
    assert len(emb) == 40
    a = np.array([emb[i] for i in emb if i < 40])
    b = np.array([emb[i] for i in emb if i >= 40])
    sep = np.linalg.norm(a.mean(0) - b.mean(0))
    spread = max(a.std(), b.std())
    assert sep > 1.5 * spread


def test_autoencoder_reconstructs_and_separates(spark):
    from neurondb_spark.ml.dimreduce import autoencoder_reduce

    df = _two_blobs(spark, n=40)
    out = autoencoder_reduce(
        df, "v", "id", bottleneck_dim=2, hidden=[8], epochs=200,
        learning_rate=0.05, seed=2,
    )
    emb = {r["id"]: r["encoded"] for r in out.collect()}
    assert len(emb) == 40 and len(next(iter(emb.values()))) == 2
    a = np.array([emb[i] for i in emb if i < 40])
    b = np.array([emb[i] for i in emb if i >= 40])
    # bottleneck codes must separate the two blobs
    intra = np.linalg.norm(a[:, None] - a[None, :], axis=-1).mean()
    inter = np.linalg.norm(a[:, None] - b[None, :], axis=-1).mean()
    assert inter > 1.5 * intra
    import pytest as _pt

    with _pt.raises(ValueError, match="activation"):
        autoencoder_reduce(df, "v", "id", activation="bogus")


def test_opq_rotation_orthonormal_and_variance_sorted(spark):
    from neurondb_spark.ml.dimreduce import _collect_sample  # noqa: F401
    from neurondb_spark.ml.opq import apply_opq_rotation, train_opq_rotation

    rng = np.random.RandomState(0)
    # anisotropic data: variance concentrated on one direction
    base = rng.normal(size=(300, 4)) * np.array([5.0, 1.0, 0.2, 0.1])
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(base)],
        "id long, v array<double>",
    )
    R = train_opq_rotation(df, "v", num_subspaces=2)
    assert R.shape == (4, 4)
    assert np.allclose(R @ R.T, np.eye(4), atol=1e-8)  # orthonormal
    rot = apply_opq_rotation(df, "v", R)
    X = np.array([r["rotated"] for r in rot.collect()])
    vs = X.var(0)
    assert vs[0] == max(vs)  # first rotated dim carries the most variance
    with pytest.raises(ValueError, match="divisible"):
        train_opq_rotation(df, "v", num_subspaces=3)
