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


def atomic_write_json(path: str, obj) -> None:
    """Crash-safe small-file write: serialize to ``path + ".tmp"``, fsync,
    then ``os.replace`` — a reader never observes a truncated or
    interleaved file, and a crash mid-write leaves the old content intact
    (the reference gets this from WAL-logged page writes; on a local FS
    the rename is the commit point, same protocol as the rebalance
    journal, index/ivf.py). Every index meta.json write goes through
    here."""
    import json

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _swap_in(spark: SparkSession, path: str, tmp: str) -> str:
    """Replace ``path`` with the fully-written ``tmp`` directory, keeping a
    ``.old`` backup until the new data is verified readable.

    Crash contract (local-FS rename swap — on object storage use a table
    format with atomic commit instead): after a crash, at most one of
    {path, path.old} is missing; recover() restores path from the backup.
    The backup is only deleted AFTER a successful schema read of the
    swapped-in data, so a bad write can never destroy the original."""
    import shutil

    spark.read.parquet(tmp).schema  # tmp must be complete + readable
    bak = path.rstrip("/") + ".old"
    if os.path.exists(bak):
        shutil.rmtree(bak)  # stale backup from an interrupted earlier swap
    os.rename(path, bak)
    os.rename(tmp, path)
    try:
        spark.read.parquet(path).schema
    except Exception:
        # swapped-in data unreadable: roll back to the original
        shutil.rmtree(path, ignore_errors=True)
        os.rename(bak, path)
        raise
    shutil.rmtree(bak)
    return path


def recover(path: str) -> bool:
    """Restore ``path`` from its ``.old`` backup after a crash mid-swap.
    Returns True if a recovery happened."""
    bak = path.rstrip("/") + ".old"
    if not os.path.exists(path) and os.path.isdir(bak):
        os.rename(bak, path)
        return True
    return False


def compact(spark: SparkSession, path: str, target_partitions: int = 8) -> str:
    """Small-file compaction: read → coalesce → rewrite, then verified
    backup-keeping swap (see _swap_in)."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compact_tmp"
    df.coalesce(target_partitions).write.mode("overwrite").parquet(tmp)
    return _swap_in(spark, path, tmp)


def compact_partitioned(spark: SparkSession, path: str, part_col: str) -> str:
    """Small-file compaction for a partitioned layout (IVF cluster dirs /
    LSH bucket dirs after many streaming-CDC appends — one file lands per
    micro-batch per touched partition, so a long-running ingest degrades
    the scan into a file-listing problem): read → repartition BY THE
    partition column (each partition's rows land in one task) → rewrite
    partitioned → verified backup-keeping swap. Row content, partition
    values and schema are unchanged — only file counts drop (hash
    collisions putting two partitions in one task still emit one file per
    partition dir under partitionBy). The reference's VACUUM FULL /
    am-level compaction analog for the ingest path."""
    df = spark.read.parquet(path)
    if part_col not in df.columns:
        raise ValueError(
            f"neurondb: compact_partitioned: {part_col!r} not in "
            f"{df.columns} at {path!r}"
        )
    tmp = path.rstrip("/") + ".compact_tmp"
    df.repartition(F.col(part_col)).write.mode("overwrite").partitionBy(
        part_col
    ).parquet(tmp)
    return _swap_in(spark, path, tmp)


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
    """rebalance_index analog: rewrite with n partitions per key range,
    then verified backup-keeping swap (see _swap_in)."""
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".rebalance_tmp"
    df.repartition(n, partition_col).write.mode("overwrite").parquet(tmp)
    return _swap_in(spark, path, tmp)
