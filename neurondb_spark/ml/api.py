"""Unified ML API: train / predict / evaluate / list_algorithms.

Reference contract (SURVEY §3.2): neurondb.train(project, algorithm, table,
target, features, params) → model_id; neurondb.predict(model_id, features);
neurondb.evaluate(model_id, table, target)
(neurondb--1.0.sql:4795-5039; dispatch src/ml/ml_unified_api.c:569-616;
persistence src/ml/ml_catalog.c:529-615).

Structural win over the reference: training data is NOT materialized into
backend RAM (the reference caps at 200,000 rows — ml_unified_api.c:206,218);
MLlib estimators train distributed with no row cap. Models persist as MLlib
model dirs + a catalog JSON entry (the bytea-payload analog).

Gradient-boosted aliases: the reference shells out to external XGBoost/
LightGBM/CatBoost libs (ml_xgboost.c etc.); here they are semantic
equivalents on MLlib GBT (same model family, same API contract).
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark.catalog import Catalog

# algorithm name → (estimator factory, task type)
# names mirror the reference's algorithm strings (ml_unified_api.c:569-616)


def _algorithms():
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        GBTClassifier,
        LinearSVC,
        LogisticRegression,
        MultilayerPerceptronClassifier,
        NaiveBayes,
        RandomForestClassifier,
    )
    from pyspark.ml.clustering import (
        BisectingKMeans,
        GaussianMixture,
        KMeans,
        LDA,
    )
    from pyspark.ml.feature import PCA
    from pyspark.ml.recommendation import ALS
    from pyspark.ml.regression import (
        DecisionTreeRegressor,
        GBTRegressor,
        LinearRegression,
        RandomForestRegressor,
    )

    return {
        # -- regression
        "linear_regression": (lambda p: LinearRegression(**p), "regression"),
        "ridge": (
            lambda p: LinearRegression(
                regParam=p.pop("regParam", 0.1), elasticNetParam=0.0, **p
            ),
            "regression",
        ),
        "lasso": (
            lambda p: LinearRegression(
                regParam=p.pop("regParam", 0.1), elasticNetParam=1.0, **p
            ),
            "regression",
        ),
        "elastic_net": (
            lambda p: LinearRegression(
                regParam=p.pop("regParam", 0.1),
                elasticNetParam=p.pop("elasticNetParam", 0.5),
                **p,
            ),
            "regression",
        ),
        "decision_tree_regressor": (lambda p: DecisionTreeRegressor(**p), "regression"),
        "random_forest_regressor": (
            lambda p: RandomForestRegressor(seed=p.pop("seed", 42), **p),
            "regression",
        ),
        "xgboost_regressor": (
            lambda p: GBTRegressor(seed=p.pop("seed", 42), **p),
            "regression",
        ),
        "gbt_regressor": (
            lambda p: GBTRegressor(seed=p.pop("seed", 42), **p),
            "regression",
        ),
        # -- classification
        "logistic_regression": (lambda p: LogisticRegression(**p), "classification"),
        "svm": (lambda p: LinearSVC(**p), "classification"),
        "decision_tree": (lambda p: DecisionTreeClassifier(seed=p.pop("seed", 42), **p), "classification"),
        "random_forest": (
            lambda p: RandomForestClassifier(seed=p.pop("seed", 42), **p),
            "classification",
        ),
        # reference NB is Gaussian (ml_naive_bayes.c:110) — also the only
        # variant that accepts negative feature values
        "naive_bayes": (
            lambda p: NaiveBayes(modelType=p.pop("modelType", "gaussian"), **p),
            "classification",
        ),
        "xgboost": (lambda p: GBTClassifier(seed=p.pop("seed", 42), **p), "classification"),
        "lightgbm": (lambda p: GBTClassifier(seed=p.pop("seed", 42), **p), "classification"),
        "catboost": (lambda p: GBTClassifier(seed=p.pop("seed", 42), **p), "classification"),
        "gbt": (lambda p: GBTClassifier(seed=p.pop("seed", 42), **p), "classification"),
        "neural_network": (
            lambda p: MultilayerPerceptronClassifier(seed=p.pop("seed", 42), **p),
            "classification",
        ),
        # -- clustering
        "kmeans": (lambda p: KMeans(seed=p.pop("seed", 42), **p), "clustering"),
        "minibatch_kmeans": (lambda p: KMeans(seed=p.pop("seed", 42), **p), "clustering"),
        "gmm": (lambda p: GaussianMixture(seed=p.pop("seed", 42), **p), "clustering"),
        "hierarchical": (lambda p: BisectingKMeans(seed=p.pop("seed", 42), **p), "clustering"),
        "lda": (lambda p: LDA(seed=p.pop("seed", 42), **p), "clustering"),
        # -- other
        "pca": (lambda p: PCA(k=p.pop("k", 2), **p), "reduction"),
        "collaborative_filter": (lambda p: ALS(seed=p.pop("seed", 42), **p), "recommendation"),
    }


def list_algorithms() -> list[dict]:
    """neurondb.list_algorithms analog (neurondb--1.0.sql:5040-5071)."""
    out = [{"algorithm": k, "task": v[1]} for k, v in _algorithms().items()]
    out.append({"algorithm": "knn", "task": "classification"})  # ml_knn.c:759
    # deterministic value-replayable ensemble twins (ml/boosting.py)
    out.append({"algorithm": "gbt_exact", "task": "regression"})
    out.append({"algorithm": "rf_exact", "task": "regression"})
    return sorted(out, key=lambda a: a["algorithm"])


def _featurize(df: DataFrame, features: list[str], feature_col: str = "features") -> DataFrame:
    """Accept either [one array<numeric> column] or a list of numeric
    columns; produce an MLlib vector column."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import array_to_vector

    if len(features) == 1 and df.schema[features[0]].dataType.typeName() == "array":
        return df.withColumn(
            feature_col, array_to_vector(F.col(features[0]).cast("array<double>"))
        )
    va = VectorAssembler(inputCols=features, outputCol=feature_col)
    return va.transform(df)


class MLEngine:
    """train/predict/evaluate with a model catalog."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    def train(
        self,
        df: DataFrame,
        algorithm: str,
        features: list[str],
        target: str | None = None,
        project: str = "default",
        params: dict | None = None,
    ) -> str:
        if algorithm == "knn":
            return self._train_knn(df, features, target, project, params)
        if algorithm in ("gbt_exact", "rf_exact"):
            return self._train_exact_ensemble(
                df, algorithm, features, target, project, params
            )
        algos = _algorithms()
        if algorithm not in algos:
            raise ValueError(f"neurondb: unknown algorithm {algorithm!r}")
        factory, task = algos[algorithm]
        params = dict(params or {})
        est = factory(params)
        data = _featurize(df, features)
        if hasattr(est, "setFeaturesCol"):
            est.setFeaturesCol("features")
        elif hasattr(est, "setInputCol"):  # PCA-style transformers
            est.setInputCol("features")
            if hasattr(est, "setOutputCol"):
                est.setOutputCol("pca_features")
        if task in ("regression", "classification"):
            if target is None:
                raise ValueError("neurondb: supervised algorithm needs target")
            est.setLabelCol(target)
        t0 = time.time()
        model = est.fit(data)
        model_id = f"{algorithm}-{uuid.uuid4().hex[:8]}"
        path = self.catalog.artifact_dir("models", model_id)
        model.write().overwrite().save(path)
        self.catalog.register(
            "models",
            model_id,
            {
                "project": project,
                "algorithm": algorithm,
                "task": task,
                "features": features,
                "target": target,
                "params": {k: str(v) for k, v in params.items()},
                "model_class": type(model).__name__,
                "path": path,
                "train_seconds": time.time() - t0,
                "status": "ready",
            },
        )
        return model_id

    def _train_knn(self, df, features, target, project, params) -> str:
        """train_knn_model_id (ml_knn.c:759-900): a kNN 'model' IS its
        training set — the reference serializes (features, labels) into
        the model bytea; here the payload is a parquet copy of the
        non-null training rows (no 200k cap), and predict is a
        distributed kNN join + majority vote against it."""
        params = dict(params or {})
        k = int(params.pop("k", 5))
        if not 1 <= k <= 1000:
            raise ValueError("neurondb: knn k must be between 1 and 1000")
        if target is None:
            raise ValueError("neurondb: knn needs target")
        if len(features) != 1:
            raise ValueError("neurondb: knn takes one vector feature column")
        feat = features[0]
        t0 = time.time()
        model_id = f"knn-{uuid.uuid4().hex[:8]}"
        path = self.catalog.artifact_dir("models", model_id)
        data = (
            df.where(F.col(feat).isNotNull() & F.col(target).isNotNull())
            .select(
                F.col(feat).cast("array<double>").alias("_feat"),
                F.col(target).cast("double").alias("_label"),
            )
        )
        data.write.mode("overwrite").parquet(path + "/train")
        self.catalog.register(
            "models", model_id,
            {
                "project": project, "algorithm": "knn",
                "task": "classification", "features": features,
                "target": target, "params": {"k": str(k)},
                "model_class": "KNNModel", "path": path, "k": k,
                "train_seconds": time.time() - t0, "status": "ready",
            },
        )
        return model_id

    def _train_exact_ensemble(
        self, df, algorithm, features, target, project, params
    ) -> str:
        """Deterministic, value-replayable ensemble training
        (ml/boosting.py — the exact twins of the ml_xgboost.c /
        ml_random_forest.c surfaces): the model IS a small JSON dict of
        stumps, persisted inline in the catalog; predict rebuilds the
        literal CASE-chain expression — no MLlib artifact, no Python in
        the scoring path. params: ``grid`` ({feature: [thresholds]};
        default = per-feature exact deciles), ``rounds``/``lr`` for
        gbt_exact, ``trees``/``sample_mod``/``key_col`` for rf_exact
        (key_col names the row-identity column the md5 bootstrap keys
        on — required)."""
        from neurondb_spark.ml.boosting import (
            gbt_fixed_stumps,
            rf_fixed_stumps,
        )

        if target is None:
            raise ValueError("neurondb: exact ensembles need target")
        params = dict(params or {})
        grid = params.pop("grid", None)
        if grid is None:
            qs = [i / 10.0 for i in range(1, 10)]
            grid = {
                f: sorted(set(df.stat.approxQuantile(f, qs, 0.0)))
                for f in features
            }
        t0 = time.time()
        if algorithm == "gbt_exact":
            model, _pred = gbt_fixed_stumps(
                df, grid, target,
                rounds=int(params.pop("rounds", 5)),
                lr=float(params.pop("lr", 0.5)),
            )
        else:
            key_col = params.pop("key_col", None)
            if key_col is None:
                raise ValueError(
                    "neurondb: rf_exact needs params['key_col'] — the "
                    "row-identity column its deterministic bootstrap "
                    "hashes (the reproducibility contract)"
                )
            model, _pred = rf_fixed_stumps(
                df, grid, target, F.col(key_col).cast("string"),
                trees=int(params.pop("trees", 5)),
                sample_mod=int(params.pop("sample_mod", 2)),
            )
        model_id = f"{algorithm}-{uuid.uuid4().hex[:8]}"
        self.catalog.register(
            "models", model_id,
            {
                "project": project, "algorithm": algorithm,
                "task": "regression", "features": features,
                "target": target,
                "params": {k: str(v) for k, v in params.items()},
                "model_class": "ExactStumpEnsemble", "model": model,
                "grid": {k: list(map(float, v)) for k, v in grid.items()},
                "path": None, "train_seconds": time.time() - t0,
                "status": "ready",
            },
        )
        return model_id

    def _predict_exact_ensemble(self, df: DataFrame, meta: dict) -> DataFrame:
        from neurondb_spark.ml.boosting import (
            gbt_pred_from_model,
            rf_pred_from_model,
        )

        build = (
            gbt_pred_from_model
            if meta["algorithm"] == "gbt_exact"
            else rf_pred_from_model
        )
        return df.withColumn("prediction", build(meta["model"]))

    def _predict_knn(self, df: DataFrame, meta: dict) -> DataFrame:
        """knn_predict_batch (ml_knn.c:905): GEMM kNN join against the
        parquet training payload + majority vote. Train-row ids pack the
        label's sorted rank into the high bits (label_idx * 2^50 + uid),
        so knn_join_gemm's id-ascending tie-break resolves equal
        distances by label ascending — a deterministic, engine-neutral
        policy an external oracle can replicate — and the vote recovers
        labels via integer arithmetic + a broadcast dictionary join
        instead of re-shuffling the full training set per predict."""
        from neurondb_spark.operators.joins import knn_join_gemm

        feat = meta["features"][0]
        k = meta["k"]
        spark = df.sparkSession
        train = spark.read.parquet(meta["path"] + "/train")
        labels = sorted(
            r[0] for r in train.select("_label").distinct().collect()
        )
        if len(labels) >= (1 << 13):
            raise ValueError("neurondb: knn supports at most 8192 labels")
        import pandas as pd

        label_dict = spark.createDataFrame(
            pd.DataFrame({"_lidx": range(len(labels)), "_label": labels})
        )  # pd path = Arrow, no pickled-RDD python worker
        # uid collisions (mod 2^50) are harmless: rows colliding on
        # (_dist, _tid) necessarily share a label, and the vote counts
        # neighbor rows, not distinct ids
        train = train.join(F.broadcast(label_dict), "_label").withColumn(
            "_tid",
            F.col("_lidx") * F.lit(1 << 50)
            + F.pmod(F.monotonically_increasing_id(), F.lit(1 << 50)),
        )
        # materialize: _qid is nondeterministic, and q is evaluated by two
        # independent jobs (the kNN join and the final q.join(pred)) — an
        # unpinned id could mispair predictions after a shuffle upstream
        q = df.withColumn("_qid", F.monotonically_increasing_id()).localCheckpoint()
        nn = knn_join_gemm(
            q.select("_qid", F.col(feat).cast("array<double>").alias("_qv")),
            train.select("_tid", "_feat"),
            "_qv", "_feat", "_qid", "_tid", k=k,
        )
        votes = (
            nn.withColumn("_lidx", F.shiftrightunsigned("_tid", 50))
            .join(F.broadcast(label_dict), "_lidx")
            .groupBy("_qid", "_label")
            .agg(F.count(F.lit(1)).alias("_votes"))
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("_qid").orderBy(
            F.col("_votes").desc(), F.col("_label").asc()
        )
        pred = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("_qid", F.col("_label").alias("prediction"))
        )
        return q.join(pred, "_qid").drop("_qid")

    def _load(self, model_id: str):
        import importlib

        meta = self.catalog.get("models", model_id)
        if meta is None:
            raise ValueError(f"neurondb: unknown model {model_id!r}")
        cls_name = meta["model_class"]
        for mod in (
            "pyspark.ml.classification",
            "pyspark.ml.regression",
            "pyspark.ml.clustering",
            "pyspark.ml.feature",
            "pyspark.ml.recommendation",
        ):
            m = importlib.import_module(mod)
            if hasattr(m, cls_name):
                return getattr(m, cls_name).load(meta["path"]), meta
        raise ValueError(f"neurondb: cannot load model class {cls_name}")

    def predict(self, df: DataFrame, model_id: str) -> DataFrame:
        meta = self.catalog.get("models", model_id)
        if meta is not None and meta.get("algorithm") == "knn":
            return self._predict_knn(df, meta)
        if meta is not None and meta.get("algorithm") in (
            "gbt_exact", "rf_exact"
        ):
            return self._predict_exact_ensemble(df, meta)
        model, meta = self._load(model_id)
        data = _featurize(df, meta["features"])
        return model.transform(data)

    def evaluate(self, df: DataFrame, model_id: str) -> dict:
        """Reference metric contracts (tests/sql/basic/001_linreg_basic.sql:41-70):
        regression → mse/rmse/mae/r²; classification → accuracy/f1/
        precision/recall; clustering → silhouette."""
        from pyspark.ml.evaluation import (
            ClusteringEvaluator,
            MulticlassClassificationEvaluator,
            RegressionEvaluator,
        )

        meta = self.catalog.get("models", model_id)
        if meta is None:
            raise ValueError(f"neurondb: unknown model {model_id!r}")
        pred = self.predict(df, model_id)
        task = meta["task"]
        if task == "regression":
            ev = RegressionEvaluator(labelCol=meta["target"], predictionCol="prediction")
            return {
                m: ev.setMetricName(m).evaluate(pred)
                for m in ("mse", "rmse", "mae", "r2")
            }
        if task == "classification":
            ev = MulticlassClassificationEvaluator(
                labelCol=meta["target"], predictionCol="prediction"
            )
            return {
                "accuracy": ev.setMetricName("accuracy").evaluate(pred),
                "f1": ev.setMetricName("f1").evaluate(pred),
                "precision": ev.setMetricName("weightedPrecision").evaluate(pred),
                "recall": ev.setMetricName("weightedRecall").evaluate(pred),
            }
        if task == "clustering":
            ev = ClusteringEvaluator(featuresCol="features")
            return {"silhouette": ev.evaluate(pred)}
        return {"rows": pred.count()}
