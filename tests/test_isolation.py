"""Exact deterministic isolation forest (ml/isolation.py) — the gate
proves bit-parity vs DuckDB; these tests prove the SEMANTICS are right
(planted outlier isolates early, depths bounded, parity at test SF).

Reference analog: NeuronDB/src/ml/ml_anomaly.c
train/predict_isolation_forest with the RNG replaced by md5-derived
pseudo-randomness (module docstring).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neurondb_spark.ml.isolation import (
    isolation_forest_exact,
    sql_isolation_forest_exact,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_isolation_depths_bounded(spark, emb):
    trees, depth = 3, 5
    out = isolation_forest_exact(
        emb, "embedding", "vec_id", trees=trees, depth=depth
    )
    rows = out.collect()
    assert len(rows) == emb.count()
    assert all(0 <= r["depth_sum"] <= trees * depth for r in rows)


def test_isolation_planted_outlier_isolates_early(spark, emb):
    """A vector far outside the data's bounding box must have a
    STRICTLY smaller depth_sum than the median row — the defining
    isolation-forest property."""
    dim = len(emb.first()["embedding"])
    far = emb.limit(1).select(
        F.lit(-1).cast("long").alias("vec_id"),
        F.array(*[F.lit(50.0) for _ in range(dim)]).alias("embedding"),
        F.lit(0).alias("label"),
    )
    df = emb.select("vec_id", "embedding", "label").unionByName(far)
    out = isolation_forest_exact(
        df, "embedding", "vec_id", trees=4, depth=8, dim=dim
    ).collect()
    by_id = {r["vec_id"]: r["depth_sum"] for r in out}
    depths = sorted(by_id.values())
    median = depths[len(depths) // 2]
    assert by_id[-1] < median


def test_isolation_oracle_parity(spark, duck):
    """Bit-exact vs the identically-unrolled DuckDB CTE chain at the
    conftest SF (the driver re-proves this at sf0.01)."""
    from tests.conftest import SF_DIR, compare_frames

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = isolation_forest_exact(df, "embedding", "vec_id", trees=4, depth=10)
    rel = duck.sql(sql_isolation_forest_exact(depth=10))
    compare_frames(out, rel)
