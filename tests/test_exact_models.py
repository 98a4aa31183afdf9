"""Semantics tests for ml/exact_models.py (ridge, Bernoulli NB) and
functions/repetition.py (Gopher repetition filters). The gate proves
bit-parity vs DuckDB; these prove the math means what it claims."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from neurondb_spark.functions.repetition import repetition_filters
from neurondb_spark.ml.exact_models import bernoulli_nb_predict, ridge_closed_form

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def li(spark):
    return spark.read.parquet(f"{SF}/lineitem.parquet")


def test_ridge_lambda_zero_is_ols(spark, li):
    """λ=0 must reproduce the numpy least-squares solution."""
    row = ridge_closed_form(li, "l_quantity", "l_discount",
                            "l_extendedprice", lam=0.0).head()
    pdf = li.select("l_quantity", "l_discount", "l_extendedprice").toPandas()
    X = np.column_stack([np.ones(len(pdf)), pdf["l_quantity"], pdf["l_discount"]])
    beta = np.linalg.lstsq(X, pdf["l_extendedprice"].to_numpy(), rcond=None)[0]
    assert abs(row["beta0"] - beta[0]) < 1e-4 * max(1.0, abs(beta[0]))
    assert abs(row["beta1"] - beta[1]) < 1e-4 * max(1.0, abs(beta[1]))
    assert abs(row["beta2"] - beta[2]) < 1e-4 * max(1.0, abs(beta[2]))


def test_ridge_large_lambda_shrinks(spark, li):
    """Huge λ must shrink coefficients toward zero monotonically."""
    small = ridge_closed_form(li, "l_quantity", "l_discount",
                              "l_extendedprice", lam=1.0).head()
    huge = ridge_closed_form(li, "l_quantity", "l_discount",
                             "l_extendedprice", lam=1e9).head()
    assert abs(huge["beta1"]) < abs(small["beta1"])
    assert abs(huge["beta2"]) < abs(small["beta2"])


def test_bernoulli_nb_separable(spark):
    """Planted perfectly-separable corpus → resubstitution accuracy 1.0."""
    rows = [(i, "alpha foo common", "a") for i in range(10)] + [
        (i + 10, "beta bar common", "b") for i in range(10)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = bernoulli_nb_predict(df, "text", "lang", "doc_id", ["foo", "bar"])
    got = {r["doc_id"]: r["predicted"] for r in out.collect()}
    assert len(got) == 20
    for i in range(10):
        assert got[i] == "a" and got[i + 10] == "b"


def test_bernoulli_nb_posterior_bounds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = bernoulli_nb_predict(docs, "text", "lang", "doc_id",
                               ["spark", "join"]).collect()
    assert len(out) == docs.count()
    for r in out:
        assert 0.0 < r["posterior_score"] <= 1.0


def test_repetition_filters_planted(spark):
    rows = [
        (0, "spam spam spam spam spam spam"),           # maximal repetition
        (1, "the quick brown fox jumps over a lazy dog"),  # all distinct
        (2, ""),                                         # degenerate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           repetition_filters(df, "text", "doc_id").collect()}
    assert got[0]["top2_frac"] == 1.0 and got[0]["dup_tok_frac"] > 0.8
    assert got[0]["keep"] == 0
    assert got[1]["dup_tok_frac"] == 0.0 and got[1]["keep"] == 1
    assert got[1]["top2_frac"] == 0.125  # 8 bigrams, all distinct
    assert got[2]["top2_frac"] == 1.0 and got[2]["keep"] == 0


def test_repetition_filters_corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = repetition_filters(docs, "text", "doc_id").collect()
    assert len(out) == docs.count()
    keeps = {r["keep"] for r in out}
    assert keeps <= {0, 1}
    for r in out:
        assert 0.0 < r["top2_frac"] <= 1.0
        assert 0.0 <= r["dup_tok_frac"] < 1.0
