"""Feature store, index tuning, data management, extra ML algorithms."""

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_feature_store_pit_join(spark):
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ml.feature_store import FeatureStore

    fs = FeatureStore(spark, Catalog(tempfile.mkdtemp(prefix="fs_")))
    feats = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00", 10.0), (1, "2026-01-03 00:00:00", 30.0),
         (2, "2026-01-02 00:00:00", 20.0)],
        "user_id int, f_ts string, spend double",
    ).withColumn("f_ts", F.col("f_ts").cast("timestamp"))
    fs.register_features("user_spend", feats, ["user_id"], ts_col="f_ts")
    assert fs.list_feature_groups()[0]["name"] == "user_spend"

    obs = spark.createDataFrame(
        [(1, "2026-01-02 12:00:00"), (2, "2026-01-05 00:00:00")],
        "user_id int, obs_ts string",
    ).withColumn("obs_ts", F.col("obs_ts").cast("timestamp"))
    out = {r["user_id"]: r["spend"] for r in fs.join_features(obs, "user_spend", "obs_ts").collect()}
    assert out[1] == 10.0  # Jan-3 value is in the future of Jan-2 obs
    assert out[2] == 20.0

    with pytest.raises(ValueError, match="unknown feature group"):
        fs.get_features("nope")


def test_index_tuning_heuristics(spark):
    from neurondb_spark.index.tuning import (
        index_recommend_type,
        ivf_tune,
        lsh_tune,
        validate_vectors,
    )

    assert index_recommend_type(10_000, 64)["recommended"] == "exact"
    assert index_recommend_type(10_000_000, 64, "online")["recommended"] == "ivf"
    t = ivf_tune(1_000_000, 0.9)
    assert 16 <= t["nlists"] <= 65536 and 1 <= t["nprobe"] <= t["nlists"]
    assert lsh_tune(64, 0.95)["probe_hamming"] >= 2

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [1.0, 2.0, 3.0]), (4, [float("nan"), 0.0])],
        "id int, v array<double>",
    )
    rep = validate_vectors(df, "v", 2)
    assert rep["nulls"] == 1 and rep["dim_mismatch"] == 1 and rep["non_finite"] == 1
    assert not rep["valid"]


def test_data_management_roundtrip(spark):
    from neurondb_spark.data_management import snapshot, tier_cold, time_travel

    df = spark.createDataFrame(
        [(1, [0.5, -0.5], "2025-01-01 00:00:00"), (2, [0.9, 0.1], "2026-06-01 00:00:00")],
        "id int, v array<double>, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    hot, cold = tier_cold(df, "v", "ts", "2026-01-01 00:00:00")
    assert hot.count() == 1 and cold.count() == 1
    crow = cold.head()
    assert "vec_int8" in cold.columns and len(crow["vec_int8"]) == 2

    with tempfile.TemporaryDirectory() as td:
        base = os.path.join(td, "snaps")
        v0 = snapshot(spark, df.where(F.col("id") == 1), base)
        v1 = snapshot(spark, df, base)
        assert (v0, v1) == (0, 1)
        assert time_travel(spark, base, 0).count() == 1
        assert time_travel(spark, base, 1).count() == 2
        with pytest.raises(ValueError):
            time_travel(spark, base, 99)


def test_catalog_rejects_path_escape_names(spark):
    from neurondb_spark.catalog import Catalog

    cat = Catalog(tempfile.mkdtemp(prefix="cat_hardening_"))
    for bad in ("../evil", "a/b", "/etc/passwd", "..", "", "a\\b"):
        with pytest.raises(ValueError, match="invalid catalog"):
            cat.register("indexes", bad, {})
        with pytest.raises(ValueError, match="invalid catalog"):
            cat.artifact_dir("indexes", bad)
    with pytest.raises(ValueError, match="invalid catalog"):
        cat.get("../outside", "x")
    cat.register("indexes", "ok_name-1.2", {"a": 1})  # legal chars pass
    assert cat.get("indexes", "ok_name-1.2")["a"] == 1


def test_compact_swap_keeps_backup_until_verified(spark):
    """Crash between the two renames must leave data recoverable: the
    backup survives until the swapped-in directory reads back."""
    import shutil

    from neurondb_spark.data_management import compact, recover

    td = tempfile.mkdtemp(prefix="dm_swap_")
    path = os.path.join(td, "data")
    spark.range(100).coalesce(4).write.parquet(path)
    assert compact(spark, path, target_partitions=1) == path
    assert spark.read.parquet(path).count() == 100
    assert not os.path.exists(path + ".old")  # backup cleaned after verify

    # simulate a crash after `path` was renamed away but before the new
    # data was swapped in: recover() restores from the backup
    os.rename(path, path + ".old")
    assert recover(path)
    assert spark.read.parquet(path).count() == 100
    assert not recover(path)  # idempotent no-op when path exists
    shutil.rmtree(td)


def test_more_algorithms_train(spark):
    from neurondb_spark.catalog import Catalog
    from neurondb_spark.ml.api import MLEngine

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").withColumn(
        "y", (F.col("label") < 5).cast("double")
    )
    eng = MLEngine(Catalog(tempfile.mkdtemp(prefix="algos_")))
    for algo, kwargs in [
        ("gmm", {"params": {"k": 3}}),
        ("hierarchical", {"params": {"k": 3}}),
        ("svm", {"target": "y"}),
        ("naive_bayes", {"target": "y"}),
        ("gbt", {"target": "y", "params": {"maxIter": 3}}),
        ("decision_tree", {"target": "label"}),
    ]:
        mid = eng.train(emb, algo, ["embedding"], **kwargs)
        pred = eng.predict(emb, mid)
        assert pred.count() == emb.count(), algo
