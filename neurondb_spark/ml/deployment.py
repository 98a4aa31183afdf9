"""Model deployment / versioning / A-B testing / monitoring (SURVEY §1.3
catalog model: neurondb.ml_deployments / ab_tests / model_versions /
model_monitoring — sql/ml_schema.sql:10-186).

The reference stores these as ordinary tables updated by SQL functions;
here they are catalog entries + deterministic routing expressions.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neurondb_spark.catalog import Catalog
from neurondb_spark.ml.api import MLEngine


class Deployments:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self.ml = MLEngine(catalog)

    # ------------------------------------------------------------ versions

    def publish_version(self, name: str, model_id: str) -> int:
        """Register model_id as the next version of a named deployment."""
        meta = self.catalog.get("deployments", name) or {"versions": [], "active": None}
        if self.catalog.get("models", model_id) is None:
            raise ValueError(f"neurondb: unknown model {model_id!r}")
        version = len(meta["versions"]) + 1
        meta["versions"].append({"version": version, "model_id": model_id,
                                 "published_at": time.time()})
        if meta["active"] is None:
            meta["active"] = version
        self.catalog.register("deployments", name, meta)
        return version

    def activate(self, name: str, version: int) -> None:
        meta = self._get(name)
        if not any(v["version"] == version for v in meta["versions"]):
            raise ValueError(f"neurondb: no version {version} of {name!r}")
        meta["active"] = version
        self.catalog.register("deployments", name, meta)

    def rollback(self, name: str) -> int:
        """Reactivate the previous version."""
        meta = self._get(name)
        if meta["active"] is None or meta["active"] <= 1:
            raise ValueError("neurondb: nothing to roll back to")
        meta["active"] -= 1
        self.catalog.register("deployments", name, meta)
        return meta["active"]

    def _get(self, name: str) -> dict:
        meta = self.catalog.get("deployments", name)
        if meta is None:
            raise ValueError(f"neurondb: unknown deployment {name!r}")
        return meta

    def active_model_id(self, name: str) -> str:
        meta = self._get(name)
        for v in meta["versions"]:
            if v["version"] == meta["active"]:
                return v["model_id"]
        raise ValueError(f"neurondb: deployment {name!r} has no active version")

    def predict(self, df: DataFrame, name: str) -> DataFrame:
        """Score with the deployment's active version."""
        return self.ml.predict(df, self.active_model_id(name))

    # ------------------------------------------------------------- A/B

    def ab_predict(
        self, df: DataFrame, name_a: str, name_b: str, key_col: str,
        traffic_b: float = 0.5, salt: str = "ab",
    ) -> DataFrame:
        """Deterministic A/B split on a hash of the entity key (stable
        assignment across runs — the ab_tests semantics): arm B iff
        hash(key||salt) mod 1000 < traffic_b·1000. Returns predictions with
        an ``ab_arm`` column."""
        bucket = F.conv(
            F.substring(F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))), 1, 8),
            16, 10,
        ).cast("long") % 1000
        tagged = df.withColumn(
            "ab_arm", F.when(bucket < int(traffic_b * 1000), F.lit("B")).otherwise(F.lit("A"))
        )
        pa = self.predict(tagged.where(F.col("ab_arm") == "A"), name_a)
        pb = self.predict(tagged.where(F.col("ab_arm") == "B"), name_b)
        common = [c for c in pa.columns if c in set(pb.columns)]
        return pa.select(common).unionByName(pb.select(common))

    # -------------------------------------------------------- monitoring

    def log_monitoring(self, name: str, metrics: dict) -> None:
        """model_monitoring row: append a metrics snapshot."""
        meta = self.catalog.get("monitoring", name) or {"snapshots": []}
        meta["snapshots"].append({"at": time.time(), **metrics})
        self.catalog.register("monitoring", name, meta)

    def monitoring_history(self, name: str) -> list[dict]:
        meta = self.catalog.get("monitoring", name)
        return meta["snapshots"] if meta else []
