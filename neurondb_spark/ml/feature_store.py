"""Feature store (SURVEY §2.8; reference src/ml/ml_feature_store.c:46-578,
catalog tables sql/ml_schema.sql:10-186).

Spark mapping: feature groups are parquet tables registered in the
catalog; retrieval is a key join; point-in-time retrieval uses the
as-of pattern (latest feature row per key with ts ≤ observation ts) — a
window over (key, ts) rather than the reference's per-row SPI lookups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from neurondb_spark.catalog import Catalog


class FeatureStore:
    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog

    def register_features(
        self, name: str, df: DataFrame, key_cols: list[str],
        ts_col: str | None = None, description: str = "",
    ) -> str:
        """neurondb_register_feature: persist the feature group + metadata."""
        path = self.catalog.artifact_dir("features", name)
        data_path = os.path.join(path, "data")
        df.write.mode("overwrite").parquet(data_path)
        self.catalog.register(
            "features", name,
            {
                "path": data_path,
                "key_cols": key_cols,
                "ts_col": ts_col,
                "columns": df.columns,
                "description": description,
            },
        )
        return name

    def get_features(self, name: str) -> DataFrame:
        meta = self.catalog.get("features", name)
        if meta is None:
            raise ValueError(f"neurondb: unknown feature group {name!r}")
        return self.spark.read.parquet(meta["path"])

    def join_features(
        self, df: DataFrame, name: str, observation_ts: str | None = None,
    ) -> DataFrame:
        """neurondb_get_features: enrich ``df`` with the feature group.
        With ``observation_ts`` + a registered ts_col: point-in-time
        correct join (latest feature value with feature_ts ≤ obs_ts —
        no leakage from the future)."""
        meta = self.catalog.get("features", name)
        if meta is None:
            raise ValueError(f"neurondb: unknown feature group {name!r}")
        feats = self.get_features(name)
        keys = meta["key_cols"]
        if observation_ts is None or meta["ts_col"] is None:
            return df.join(feats, on=keys, how="left")
        ts_col = meta["ts_col"]
        joined = df.join(feats, on=keys, how="left").where(
            F.col(ts_col).isNull() | (F.col(ts_col) <= F.col(observation_ts))
        )
        w = W.partitionBy(*keys, observation_ts).orderBy(F.col(ts_col).desc())
        return (
            joined.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def list_feature_groups(self) -> list[dict]:
        return self.catalog.list("features")
