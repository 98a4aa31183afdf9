"""DBSCAN, AutoML, ALS, ops-surface tests."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_dbscan_finds_planted_clusters(spark):
    from neurondb_spark.ml.dbscan import dbscan

    # two tight planted clusters + isolated noise points
    rows = []
    for i in range(20):
        rows.append((i, [0.0 + i * 0.01, 0.0]))
    for i in range(20, 40):
        rows.append((i, [10.0 + (i - 20) * 0.01, 10.0]))
    rows += [(100, [50.0, 50.0]), (101, [-50.0, 30.0])]
    df = spark.createDataFrame(rows, "id int, v array<double>")
    out = dbscan(df, "v", "id", eps=0.5, min_samples=3, allow_cross=True)
    got = {r["id"]: r["cluster"] for r in out.collect()}
    c0 = {got[i] for i in range(20)}
    c1 = {got[i] for i in range(20, 40)}
    assert len(c0) == 1 and len(c1) == 1 and c0 != c1
    assert got[100] == -1 and got[101] == -1


def test_auto_train_leaderboard(spark):
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ml.automl import auto_train

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "y", (F.col("label") < 5).cast("double")
    )
    cat = Catalog(tempfile.mkdtemp(prefix="automl_"))
    res = auto_train(
        emb, ["embedding"], "y", task="classification",
        candidates=["logistic_regression", "naive_bayes"], folds=2, catalog=cat,
    )
    assert res["best"] is not None
    assert len(res["leaderboard"]) == 2
    assert "model_id" in res
    assert cat.get("models", res["model_id"])["status"] == "ready"


def test_cross_validate_param_grid(spark):
    from neurondb_spark.ml.automl import cross_validate

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "y", (F.col("label") < 5).cast("double")
    )
    res = cross_validate(
        emb, "logistic_regression", ["embedding"], "y",
        param_grid={"regParam": [0.0, 0.5]}, folds=2,
    )
    assert len(res["all_scores"]) == 2
    assert res["best_params"]["regParam"] in (0.0, 0.5)


def test_als_recommender(spark):
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ml.api import MLEngine
    from neurondb_spark.registry.common import events as load_events

    ev = load_events(spark, SF_DIR)
    ratings = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
        .withColumn("item_id", F.abs(F.hash("event_type")) % 1000)
    )
    eng = MLEngine(Catalog(tempfile.mkdtemp(prefix="als_")))
    mid = eng.train(
        ratings, "collaborative_filter", features=[], target=None,
        params={"userCol": "user_id", "itemCol": "item_id", "ratingCol": "rating", "rank": 4},
    )
    model, meta = eng._load(mid)
    recs = model.recommendForAllUsers(2)
    assert recs.count() > 0
    assert {"user_id", "recommendations"} <= set(recs.columns)


def test_ops_surface(spark):
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ops import (
        Metrics,
        QuotaManager,
        assert_recall,
        assert_vector_equal,
        health,
        tenant_view,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b"), (1, "c")], "tenant int, v string")
    assert tenant_view(df, "tenant", 1).count() == 2

    qm = QuotaManager(Catalog(tempfile.mkdtemp(prefix="quota_")))
    qm.set_quota("t1", 100)
    assert qm.check_and_consume("t1", 60)
    assert not qm.check_and_consume("t1", 60)
    qm.reset("t1")
    assert qm.check_and_consume("t1", 60)
    assert qm.usage("t1")["used_rows"] == 60

    m = Metrics()
    m.incr("knn_queries")
    with m.time("knn"):
        pass
    assert "neurondb_knn_queries 1" in m.prometheus()
    assert m.to_df(spark).count() == 3

    h = health(spark)
    assert h["status"] == "ok" and h["default_parallelism"] >= 1

    assert_vector_equal([1.0, 2.0], [1.0, 2.0])
    with pytest.raises(AssertionError):
        assert_vector_equal([1.0], [1.0, 2.0])
    assert assert_recall([1, 2, 3], [1, 2], 0.5) == 1.0
    with pytest.raises(AssertionError):
        assert_recall([9], [1, 2], 0.5)


def test_explain_shows_pushdown(spark):
    from neurondb_spark.ops import explain_vector_query

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").where(
        F.col("l_quantity") > 40
    ).select("l_orderkey", "l_quantity")
    plan = explain_vector_query(df)
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_topic_discovery(spark):
    from neurondb_spark.ml.topics import discover_topics

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = discover_topics(docs, emb, "text", "doc_id", "vec_id", "embedding",
                          n_topics=3, top_terms=4)
    rows = out.collect()
    topics = {r["topic"] for r in rows}
    assert topics == {0, 1, 2}
    for t in topics:
        ranks = [r["term_rank"] for r in rows if r["topic"] == t]
        assert ranks == [1, 2, 3, 4]


def test_whitening_unit_variance(spark):
    from pyspark.sql import functions as F

    from neurondb_spark.ml.topics import whiten_embeddings

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = whiten_embeddings(emb, "embedding", k=4)
    stats = out.select(
        *[F.stddev_pop(F.col("whitened")[i]).alias(f"s{i}") for i in range(4)]
    ).head()
    for i in range(4):
        assert abs(stats[f"s{i}"] - 1.0) < 1e-6


def test_exact_ensembles_through_catalog(spark):
    """gbt_exact / rf_exact through train/predict/evaluate: the model is
    a JSON stump list in the catalog, predict is a rebuilt literal
    expression, retraining is bit-identical (no seeds involved)."""
    from neurondb_spark.engine import NeuronSparkEngine

    eng = NeuronSparkEngine(spark, tempfile.mkdtemp(prefix="exact_ens_"))
    rows = [(float(i), float(x), float(d), 10.0 * x + 100.0 * d)
            for i, (x, d) in enumerate(
                (x, d) for x in range(1, 11) for d in (0.0, 1.0, 2.0))]
    df = spark.createDataFrame(rows, ["rid", "x", "d", "y"])

    mid = eng.train(df, "gbt_exact", ["x", "d"], "y",
                    params={"grid": {"x": [3.0, 5.0, 7.0],
                                     "d": [0.0, 1.0]},
                            "rounds": 3, "lr": 1.0})
    meta = eng.catalog.get("models", mid)
    assert meta["model_class"] == "ExactStumpEnsemble"
    assert len(meta["model"]["stumps"]) == 3
    pred = eng.predict(df, mid)
    ev = eng.evaluate(df, mid)
    assert ev["r2"] > 0.9
    mid2 = eng.train(df, "gbt_exact", ["x", "d"], "y",
                     params={"grid": {"x": [3.0, 5.0, 7.0],
                                      "d": [0.0, 1.0]},
                             "rounds": 3, "lr": 1.0})
    assert eng.catalog.get("models", mid2)["model"] == meta["model"]

    rid = eng.train(df, "rf_exact", ["x", "d"], "y",
                    params={"grid": {"x": [3.0, 5.0, 7.0],
                                     "d": [0.0, 1.0]},
                            "trees": 3, "key_col": "rid"})
    rmeta = eng.catalog.get("models", rid)
    assert len(rmeta["model"]["trees"]) == 3
    assert eng.predict(df, rid).select("prediction").count() == len(rows)

    import pytest as _pt
    with _pt.raises(ValueError, match="key_col"):
        eng.train(df, "rf_exact", ["x"], "y", params={})
    algos = {a["algorithm"] for a in eng.list_algorithms()}
    assert {"gbt_exact", "rf_exact"} <= algos
