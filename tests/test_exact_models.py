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


def test_regression_eval_perfect_fit(spark):
    from neurondb_spark.ml.exact_models import regression_eval_exact

    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(1, 11)], ["y", "yhat"]
    )
    row = regression_eval_exact(df, "y", "yhat").head()
    assert row["mse"] == 0.0 and row["rmse"] == 0.0 and row["mae"] == 0.0
    assert row["r2"] == 1.0


def test_regression_eval_known_values(spark):
    from neurondb_spark.ml.exact_models import regression_eval_exact

    # y = [1,2,3], yhat = [2,2,2] -> mse=2/3, mae=2/3, r2 = 1 - 2/2 = 0
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 2.0), (3.0, 2.0)], ["y", "yhat"]
    )
    # residual sums are bsum-quantized at 2^-28 per addend
    row = regression_eval_exact(df, "y", "yhat").head()
    assert abs(row["mse"] - 2.0 / 3.0) < 1e-7
    assert abs(row["mae"] - 2.0 / 3.0) < 1e-7
    assert abs(row["r2"]) < 1e-7


def test_classification_eval_confusion(spark):
    from neurondb_spark.ml.exact_models import classification_eval_exact

    # a: 2 correct, 1 predicted as b; b: 1 correct, 1 predicted as a
    rows = [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a")]
    df = spark.createDataFrame(rows, ["label", "pred"])
    got = {r["cls"]: r for r in
           classification_eval_exact(df, "label", "pred").collect()}
    a, b = got["a"], got["b"]
    assert (a["tp"], a["n_actual"], a["n_pred"]) == (2, 3, 3)
    assert abs(a["precision"] - 2 / 3) < 1e-12
    assert abs(a["recall"] - 2 / 3) < 1e-12
    assert (b["tp"], b["n_actual"], b["n_pred"]) == (1, 2, 2)


def test_classification_eval_absent_class(spark):
    """A class never predicted gets precision 0 and f1 0 (zero-guard),
    and a predicted-only class still appears via the full outer join."""
    from neurondb_spark.ml.exact_models import classification_eval_exact

    rows = [("a", "c"), ("a", "c"), ("b", "b")]
    df = spark.createDataFrame(rows, ["label", "pred"])
    got = {r["cls"]: r for r in
           classification_eval_exact(df, "label", "pred").collect()}
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["precision"] == 0.0 and got["a"]["f1"] == 0.0
    assert got["c"]["n_actual"] == 0 and got["c"]["recall"] == 0.0


def test_silhouette_separated_clusters(spark):
    """Two well-separated planted blobs -> avg silhouette near 1 in both
    clusters."""
    from neurondb_spark.ml.exact_models import silhouette_simplified

    rows = [(i, [0.0 + 0.01 * i, 0.0]) for i in range(5)] + [
        (i + 5, [100.0 + 0.01 * i, 0.0]) for i in range(5)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = silhouette_simplified(df, "embedding", "vec_id", k=2, iters=2).collect()
    assert len(out) == 2
    for r in out:
        assert r["n_points"] == 5
        assert r["avg_silhouette"] > 0.95


def test_ridge_grid_matches_explicit_eval(spark, li):
    """The algebraic ss_res expansion must equal the explicit
    prediction-residual path (cross-check of the one-scan grid)."""
    from neurondb_spark.ml.exact_models import (
        regression_eval_exact,
        ridge_closed_form,
        ridge_grid_rmse,
    )

    grid = ridge_grid_rmse(li, "l_quantity", "l_discount",
                           "l_extendedprice", [0.0, 100.0]).collect()
    by_lam = {r["lam"]: r["train_rmse"] for r in grid}
    for lam in (0.0, 100.0):
        betas = ridge_closed_form(li, "l_quantity", "l_discount",
                                  "l_extendedprice", lam=lam).head()
        pred = li.select(
            F.col("l_extendedprice").alias("y"),
            (F.lit(betas["beta0"])
             + F.lit(betas["beta1"]) * F.col("l_quantity")
             + F.lit(betas["beta2"]) * F.col("l_discount")).alias("yhat"),
        )
        explicit = regression_eval_exact(pred, "y", "yhat").head()["rmse"]
        assert abs(by_lam[lam] - explicit) < 1e-6 * explicit
    assert by_lam[100.0] >= by_lam[0.0]  # resubstitution rmse grows with lam


def test_ridge_cv_partitions_and_recovers(spark):
    """Exact linear data -> every fold's held-out rmse ~ 0 at lam=0; the
    md5 folds partition the table."""
    from neurondb_spark.ml.exact_models import ridge_cv_rmse

    rows = [
        (i, float(i % 7), float((i * 3) % 5),
         2.0 + 3.0 * (i % 7) + 4.0 * ((i * 3) % 5))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["rid", "x1", "x2", "y"])
    out = ridge_cv_rmse(df, "x1", "x2", "y", ["rid"], lam=0.0,
                        k_folds=3).collect()
    assert len(out) == 3
    assert sum(r["n_test"] for r in out) == 300
    for r in out:
        assert r["rmse"] < 1e-5


def test_feature_importance_scale_invariant(spark, li):
    """Standardized importance must be invariant to feature rescaling
    (the point of standardizing); raw betas are not."""
    from neurondb_spark.ml.exact_models import feature_importance_linreg

    base = {r["feature"]: r for r in feature_importance_linreg(
        li, "l_quantity", "l_discount", "l_extendedprice").collect()}
    scaled_df = li.withColumn("q1000", F.col("l_quantity") * 1000.0)
    scaled = {r["feature"]: r for r in feature_importance_linreg(
        scaled_df, "q1000", "l_discount", "l_extendedprice").collect()}
    assert abs(scaled["q1000"]["beta"] - base["l_quantity"]["beta"] / 1000.0) \
        < 1e-9 * abs(base["l_quantity"]["beta"])
    assert abs(scaled["q1000"]["importance"]
               - base["l_quantity"]["importance"]) \
        < 1e-9 * base["l_quantity"]["importance"]


def test_decision_stump_planted_split(spark):
    """Label flips exactly at x>5 -> best split (min weighted gini) is
    threshold 5 with gini 0."""
    from neurondb_spark.ml.exact_models import decision_stump_gini

    rows = [(float(x), 1 if x > 5 else 0) for x in range(1, 11)
            for _ in range(7)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = decision_stump_gini(df, "x", F.col("y") == 1).collect()
    assert len(out) == 9  # 10 distinct values, last has empty right side
    best = min(out, key=lambda r: (r["weighted_gini"], r["threshold"]))
    assert best["threshold"] == 5.0
    assert best["weighted_gini"] == 0.0
    assert best["n_left"] == 35 and best["n_right"] == 35


def test_gbt_fixed_stumps_planted_structure(spark):
    """y is a pure two-level step on x -> round 1 must pick the planted
    threshold with leaf means equal to lr*(level - mean); further rounds
    shrink SSE monotonically; prediction column is a pure expression."""
    from neurondb_spark.functions.aggregates import dsum
    from neurondb_spark.ml.boosting import gbt_fixed_stumps

    rows = [(float(x), 100.0 if x <= 5 else 200.0)
            for x in range(1, 11) for _ in range(3)]
    df = spark.createDataFrame(rows, ["x", "y"])
    grid = {"x": [3.0, 5.0, 7.0]}
    model, pred = gbt_fixed_stumps(df, grid, "y", rounds=2, lr=0.5)
    assert model["base"] == 150.0
    s0 = model["stumps"][0]
    assert s0["feature"] == "x" and s0["threshold"] == 5.0
    assert s0["left"] == 0.5 * -50.0 and s0["right"] == 0.5 * 50.0

    def sse(p):
        r = F.col("y").cast("double") - p
        return df.agg(dsum(r * r).alias("s")).head()["s"]

    base_sse = sse(F.lit(model["base"]))
    cur = F.lit(model["base"])
    last = base_sse
    for st in model["stumps"]:
        cur = cur + F.when(
            F.col(st["feature"]).cast("double") <= F.lit(st["threshold"]),
            F.lit(st["left"])).otherwise(F.lit(st["right"]))
        now = sse(cur)
        assert now < last
        last = now

    # pred is a literal CASE chain — applies to any frame with the col
    other = spark.createDataFrame([(2.0,), (9.0,)], ["x"])
    got = [r["p"] for r in other.select(pred.alias("p")).collect()]
    assert got[0] == 150.0 - 25.0 + model["stumps"][1]["left" if 2.0 <= model["stumps"][1]["threshold"] else "right"]


def test_gbt_fixed_stumps_degenerate_grid_stops(spark):
    """No candidate splits the data (threshold beyond the range on both
    sides) -> zero stumps, prediction is the exact base mean."""
    from neurondb_spark.ml.boosting import gbt_fixed_stumps

    df = spark.createDataFrame([(1.0, 10.0), (2.0, 20.0)], ["x", "y"])
    model, pred = gbt_fixed_stumps(df, {"x": [100.0]}, "y", rounds=3, lr=0.5)
    assert model["stumps"] == []
    got = [r["p"] for r in df.select(pred.alias("p")).collect()]
    assert got == [15.0, 15.0]


def test_gbt_shap_additivity_exact(spark):
    """base + Σ E[leaf_t] + Σ_f φ_f(x) == prediction(x), double for
    double, on every row — the closed-form-SHAP contract."""
    from neurondb_spark.ml.boosting import gbt_fixed_stumps, gbt_shap_cols

    rows = [(float(x), float(d), 10.0 * x + 100.0 * d)
            for x in range(1, 11) for d in (0, 1, 2)]
    df = spark.createDataFrame(rows, ["x", "d", "y"])
    grid = {"d": [0.0, 1.0], "x": [3.0, 5.0, 7.0]}
    model, pred = gbt_fixed_stumps(df, grid, "y", rounds=3, lr=1.0)
    assert len(model["stumps"]) == 3
    phis = gbt_shap_cols(model, sorted(grid))
    anchor = model["base"] + sum(s["expected"] for s in model["stumps"])
    got = df.select(
        pred.alias("p"),
        (F.lit(anchor) + phis["d"] + phis["x"]).alias("re"),
    ).collect()
    for r in got:
        assert r["p"] == pytest.approx(r["re"], abs=1e-9)
    # attributions are non-trivial: both features got a stump
    feats = {s["feature"] for s in model["stumps"]}
    assert feats == {"d", "x"}


def test_rf_fixed_stumps_deterministic_bagging(spark):
    """Same data -> identical forest across runs (md5 bootstrap is
    seed-free determinism); prediction is the fixed-order leaf mean;
    degenerate grid raises instead of fitting constant trees."""
    from neurondb_spark.ml.boosting import rf_fixed_stumps

    rows = [(float(x), 100.0 if x <= 5 else 200.0)
            for x in range(1, 11) for _ in range(5)]
    df = spark.createDataFrame(rows, ["x", "y"]).withColumn(
        "rid", F.monotonically_increasing_id().cast("string"))
    grid = {"x": [3.0, 5.0, 7.0]}
    m1, p1 = rf_fixed_stumps(df, grid, "y", F.col("rid"), trees=3)
    m2, _ = rf_fixed_stumps(df, grid, "y", F.col("rid"), trees=3)
    assert m1["trees"] == m2["trees"] and len(m1["trees"]) == 3
    got = df.select("x", p1.alias("p")).collect()
    for r in got:
        ls = [t["left"] if r["x"] <= t["threshold"] else t["right"]
              for t in m1["trees"]]
        assert r["p"] == ((ls[0] + ls[1]) + ls[2]) / 3.0

    with pytest.raises(ValueError, match="no valid split"):
        rf_fixed_stumps(df, {"x": [99.0]}, "y", F.col("rid"), trees=2)
