"""Data-management surface (SURVEY §2.11; reference
src/util/data_management.c:38-686: vacuum_vectors, compress_cold_tier,
vector_time_travel, rebalance_index).

Spark/parquet mapping:
- compact: small-file compaction = coalesced rewrite (OPTIMIZE analog)
- tier_cold: rewrite rows older than a cutoff with a quantized vector
  column (int8) — the compress_cold_tier semantic: colder data, cheaper
  bytes, same searchable surface via dequantize-on-read
- snapshot/time_travel: versioned directory snapshots (Delta's
  versionAsOf analog without the Delta dependency)
- rebalance: rewrite partitioned data with a fresh partition count
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark.functions.quantization import int8_scale, vector_to_int8


def compact(spark: SparkSession, path: str, target_partitions: int = 8) -> str:
    """Small-file compaction: read → coalesce → rewrite atomically-ish
    (write to .tmp, swap)."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact_tmp"
    df.coalesce(target_partitions).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + ".old"
    os.rename(path, bak)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(bak)
    return path


def tier_cold(
    df: DataFrame, vec_col: str, ts_col: str, cutoff: str,
) -> tuple[DataFrame, DataFrame]:
    """Split hot/cold at the cutoff; cold rows carry the int8-quantized
    vector + scale instead of full floats (≈4× smaller)."""
    hot = df.where(F.col(ts_col) >= F.lit(cutoff).cast("timestamp"))
    cold = df.where(F.col(ts_col) < F.lit(cutoff).cast("timestamp")).withColumn(
        "vec_int8", vector_to_int8(vec_col)
    ).withColumn("vec_scale", int8_scale(vec_col)).drop(vec_col)
    return hot, cold


def snapshot(spark: SparkSession, df: DataFrame, base_dir: str) -> int:
    """Write a new immutable version; returns the version id."""
    existing = [
        int(d.split("=")[1])
        for d in os.listdir(base_dir)
        if d.startswith("v=")
    ] if os.path.isdir(base_dir) else []
    version = (max(existing) + 1) if existing else 0
    df.write.mode("errorifexists").parquet(os.path.join(base_dir, f"v={version}"))
    return version


def time_travel(spark: SparkSession, base_dir: str, version: int) -> DataFrame:
    """vector_time_travel analog: read an old snapshot."""
    p = os.path.join(base_dir, f"v={version}")
    if not os.path.isdir(p):
        raise ValueError(f"neurondb: no snapshot version {version}")
    return spark.read.parquet(p)


def rebalance(spark: SparkSession, path: str, partition_col: str, n: int) -> str:
    """rebalance_index analog: rewrite with n partitions per key range."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".rebalance_tmp"
    df.repartition(n, partition_col).write.mode("overwrite").parquet(tmp)
    import shutil

    bak = path.rstrip("/") + ".old"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return path
