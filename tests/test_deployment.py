"""Deployment / versioning / A-B / monitoring surface."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_deploy_version_ab_monitor(spark):
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ml.api import MLEngine
    from neurondb_spark.ml.deployment import Deployments

    cat = Catalog(tempfile.mkdtemp(prefix="deploy_"))
    eng = MLEngine(cat)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "y", (F.col("label") < 5).cast("double")
    )
    m1 = eng.train(emb, "logistic_regression", ["embedding"], target="y")
    m2 = eng.train(emb, "logistic_regression", ["embedding"], target="y",
                   params={"regParam": 0.1})

    dep = Deployments(cat)
    v1 = dep.publish_version("clf", m1)
    v2 = dep.publish_version("clf", m2)
    assert (v1, v2) == (1, 2)
    assert dep.active_model_id("clf") == m1  # first publish auto-activates

    dep.activate("clf", 2)
    assert dep.active_model_id("clf") == m2
    assert dep.rollback("clf") == 1
    assert dep.active_model_id("clf") == m1

    pred = dep.predict(emb, "clf")
    assert pred.count() == emb.count()

    # A/B: deterministic stable assignment, both arms served
    dep2 = Deployments(cat)
    dep2.publish_version("clf_b", m2)
    ab1 = dep.ab_predict(emb, "clf", "clf_b", "vec_id", traffic_b=0.5)
    ab2 = dep.ab_predict(emb, "clf", "clf_b", "vec_id", traffic_b=0.5)
    arms1 = {r["vec_id"]: r["ab_arm"] for r in ab1.select("vec_id", "ab_arm").collect()}
    arms2 = {r["vec_id"]: r["ab_arm"] for r in ab2.select("vec_id", "ab_arm").collect()}
    assert arms1 == arms2  # stable
    counts = ab1.groupBy("ab_arm").count().collect()
    assert {r["ab_arm"] for r in counts} == {"A", "B"}
    frac_b = ab1.where(F.col("ab_arm") == "B").count() / ab1.count()
    assert 0.35 < frac_b < 0.65

    dep.log_monitoring("clf", {"accuracy": 0.9, "rows": 500})
    dep.log_monitoring("clf", {"accuracy": 0.88, "rows": 600})
    hist = dep.monitoring_history("clf")
    assert len(hist) == 2 and hist[0]["accuracy"] == 0.9

    with pytest.raises(ValueError, match="unknown deployment"):
        dep.active_model_id("nope")
    with pytest.raises(ValueError, match="no version"):
        dep.activate("clf", 99)
    with pytest.raises(ValueError, match="unknown model"):
        dep.publish_version("clf", "missing-model")
