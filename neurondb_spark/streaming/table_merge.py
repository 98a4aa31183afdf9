"""Streaming CDC drain into a bucketed copy-on-write TABLE (§2.13 ×
data_management.apply_changes — the table-level twin of the index CDC
drain in streaming/index_ingest.py).

Reference analog: WAL-replayed table DML (NeuronDB/src/storage/
vector_wal.c applies logged insert/update/delete to heap + index; a PG
table gets UPDATE/DELETE natively). Spark-first form = the Hudi/Delta
copy-on-write shape without the table-format dependency:

- the table lives as ``table_dir/bucket=<b>/`` parquet, bucketed by a
  hash of the key — the physical layout that bounds every merge's write
  amplification to the TOUCHED buckets, not the whole table;
- each micro-batch validates once, slices its changes per bucket, runs
  the same last-writer-wins ``apply_changes`` against only the touched
  buckets, and swaps each rewritten bucket in with the verified
  backup-keeping rename (data_management._swap_in);
- exactly-once to the reader: the apply is IDEMPOTENT (upserts replace,
  deletes remove, inserts anti-join), so a post-crash replay of the same
  micro-batch — or of a half-applied one — converges to the same state;
  the streaming checkpoint guarantees no batch is skipped.

At 100 TB: buckets = thousands (a few GB each); a micro-batch touching
k buckets reads and rewrites ~k·(table/n_buckets) bytes — the standard
copy-on-write cost, with merge-on-read (change-log + compaction) as the
table-format upgrade path (README "Deliberate descopes": Delta/Iceberg).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark.data_management import _swap_in, apply_changes, recover

_BUCKET_DIR_RE = re.compile(r"^bucket=\d+$")
_META_FILE = "_table_meta.json"


def _write_table_meta(table_dir: str, key_cols: list[str],
                      n_buckets: int) -> None:
    """Persist the table's immutable layout parameters next to the data
    (tmp + atomic rename). Without this, a drain called with a different
    n_buckets than the table was bucketed with hashes a key's change to
    the WRONG bucket — the upsert lands as an insert elsewhere while the
    stale row survives, silent duplicate keys on read."""
    tmp = os.path.join(table_dir, _META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"key_cols": list(key_cols), "n_buckets": int(n_buckets)}, f)
    os.replace(tmp, os.path.join(table_dir, _META_FILE))


def _load_table_meta(table_dir: str) -> dict | None:
    try:
        with open(os.path.join(table_dir, _META_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None  # pre-meta table (legacy layout) — caller can't verify


def _check_table_meta(table_dir: str, key_cols: list[str],
                      n_buckets: int) -> None:
    meta = _load_table_meta(table_dir)
    if meta is None:
        return
    if meta["n_buckets"] != int(n_buckets) or meta["key_cols"] != list(key_cols):
        raise ValueError(
            f"neurondb: merge table at {table_dir!r} was initialized with "
            f"key_cols={meta['key_cols']} n_buckets={meta['n_buckets']}, "
            f"but this call passed key_cols={list(key_cols)} "
            f"n_buckets={int(n_buckets)} — mismatched bucketing would "
            "silently duplicate keys; use the table's own parameters"
        )


def _heal_table(table_dir: str) -> None:
    """Clear crash leftovers so partition discovery never sees them:
    ``bucket=N.old`` either restores a missing bucket (recover) or is a
    stale backup (swap completed — drop it); ``*.merge_tmp`` is an
    incomplete write (the original bucket is intact — drop it)."""
    if not os.path.isdir(table_dir):
        return
    for name in os.listdir(table_dir):
        p = os.path.join(table_dir, name)
        if name.endswith(".old"):
            recover(p[: -len(".old")])
            if os.path.isdir(p):
                shutil.rmtree(p)
        elif name.endswith(".merge_tmp") and os.path.isdir(p):
            shutil.rmtree(p)


def _bucket_of(key_cols: list[str], n_buckets: int):
    """Deterministic key → bucket in [0, n_buckets): layout-only (never
    oracle-checked), so Spark's native hash is fine; pmod keeps negative
    hashes in range."""
    return F.pmod(F.hash(*key_cols), F.lit(n_buckets))


def init_merge_table(
    spark: SparkSession, df: DataFrame, table_dir: str,
    key_cols: list[str], n_buckets: int = 16,
) -> None:
    """Seed the bucketed table layout from a base frame. One partitioned
    write; bucket count is fixed for the table's lifetime (re-bucketing
    is a rebalance job, data_management.rebalance)."""
    (
        df.withColumn("bucket", _bucket_of(key_cols, n_buckets))
        .write.mode("overwrite").partitionBy("bucket").parquet(table_dir)
    )
    _write_table_meta(table_dir, key_cols, n_buckets)


def read_merge_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Current table state (all buckets, layout column dropped). Reads
    by explicit ``bucket=N`` paths so a crash leftover the drain has not
    healed yet can never poison partition discovery."""
    paths = sorted(
        os.path.join(table_dir, d)
        for d in os.listdir(table_dir)
        if _BUCKET_DIR_RE.match(d)
    )
    if not paths:
        raise ValueError(
            f"neurondb: {table_dir!r} has no bucket=N partitions — "
            "not an init_merge_table layout"
        )
    return (
        spark.read.option("basePath", table_dir).parquet(*paths).drop("bucket")
    )


def merge_stream_drain(
    spark: SparkSession,
    src_dir: str,
    schema,
    table_dir: str,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    checkpoint_dir: str | None = None,
    n_buckets: int = 16,
    max_files_per_trigger: int | None = None,
    files_per_bucket: int = 8,
) -> None:
    """Drain change files (rows = table columns + op i/u/d + seq) into
    the bucketed table, AvailableNow run-once semantics; re-invoking
    after new files land continues from the checkpoint. ``seq_col`` is
    REQUIRED: a CDC batch legitimately carries several changes per key
    and "arbitrary row wins" is a silent bug — the drain refuses to
    guess (apply_changes's last-writer-wins window orders them).
    ``key_cols``/``n_buckets`` are verified against the layout recorded
    at ``init_merge_table`` — a mismatch errors instead of silently
    scattering changes across the wrong buckets."""
    _check_table_meta(table_dir, key_cols, n_buckets)
    _heal_table(table_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(src_dir)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # one bounded validation job per BATCH (then validate=False per
        # bucket slice)
        if batch_df.where(~F.col(op_col).isin("i", "u", "d")).limit(1).count():
            raise ValueError(
                f"neurondb: {op_col!r} must be one of 'i'/'u'/'d'"
            )
        changes = batch_df.withColumn(
            "bucket", _bucket_of(key_cols, n_buckets)
        ).localCheckpoint(eager=True)  # one source read, reused per bucket
        touched = sorted(
            r["bucket"] for r in changes.select("bucket").distinct().collect()
        )
        for b in touched:
            bdir = os.path.join(table_dir, f"bucket={b}")
            recover(bdir)  # heal a crash mid-swap from a prior run
            ch = changes.where(F.col("bucket") == b).drop("bucket")
            if os.path.isdir(bdir):
                cur = spark.read.parquet(bdir)
                merged = apply_changes(
                    cur, ch, key_cols, op_col=op_col, seq_col=seq_col,
                    validate=False,
                )
                tmp = bdir + ".merge_tmp"
                # a bucket is a table/n_buckets slice — cap its file
                # count so every swap doesn't shard it into one file per
                # shuffle partition (small-file creep across batches)
                merged.coalesce(files_per_bucket).write.mode(
                    "overwrite"
                ).parquet(tmp)
                _swap_in(spark, bdir, tmp)
            else:
                # brand-new bucket: surviving upserts only, no swap needed
                merged = apply_changes(
                    ch.where(F.col(op_col) != "d")
                    .drop(op_col, seq_col).limit(0),
                    ch, key_cols, op_col=op_col, seq_col=seq_col,
                    validate=False,
                )
                merged.coalesce(files_per_bucket).write.mode(
                    "overwrite"
                ).parquet(bdir)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(table_dir, "_merge_checkpoint"),
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
