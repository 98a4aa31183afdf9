"""Recommender family beyond ALS (ml/recommender.py): user_similarity
sparse cosine and the hybrid blend — semantics + determinism.
Reference: ml_recommender.c:128-1706."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neurondb_spark.ml.recommender import (
    recommend_hybrid,
    user_item,
    user_similarity,
)


@pytest.fixture(scope="module")
def ui(spark):
    rows = [
        # user, item, value
        (1, 10, 2.0), (1, 11, 1.0), (1, 12, 3.0),
        (2, 10, 2.0), (2, 11, 1.0), (2, 12, 3.0),   # identical to 1
        (3, 10, 1.0),                                # weak overlap
        (4, 99, 5.0),                                # no overlap
    ]
    df = spark.createDataFrame(rows, ["u", "i", "q"])
    return user_item(df, "u", "i", "q")


def test_user_item_aggregates(spark):
    df = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 2.0)], ["u", "i", "q"]
    )
    row = user_item(df, "u", "i", "q").head()
    assert row["value"] == pytest.approx(3.0)


def test_user_similarity_identical_user(spark, ui):
    out = user_similarity(ui, 1, k=5).collect()
    assert out[0]["user"] == 2
    assert out[0]["cosine_sim"] == pytest.approx(1.0)
    # user 4 shares nothing -> absent
    assert all(r["user"] != 4 for r in out)


def test_user_similarity_ordering_deterministic(spark, ui):
    a = [(r["user"], r["cosine_sim"]) for r in user_similarity(ui, 1, k=5).collect()]
    b = [(r["user"], r["cosine_sim"]) for r in user_similarity(ui, 1, k=5).collect()]
    assert a == b


def test_user_similarity_unknown_user(spark, ui):
    with pytest.raises(ValueError, match="no ratings"):
        user_similarity(ui, 999)


def test_recommend_hybrid_excludes_seen(spark, ui):
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in (10, 11, 12, 99)],
        ["item", "embedding"],
    )
    out = recommend_hybrid(ui, vecs, 1, alpha=0.5, k=10, dim=2).collect()
    ids = [r["item"] for r in out]
    assert 10 not in ids and 11 not in ids and 12 not in ids
    assert 99 in ids  # unseen item recommended via CF/content blend
