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
copy-on-write cost. The MERGE-ON-READ tier (``merge_on_read=True`` +
``compact_merge_table``) is the other half of the Hudi/Delta shape:
each micro-batch appends one bucketed change-log directory (write cost
= the batch itself), reads union base + log with last-writer-wins, and
a cadence-driven compactor folds the log back into the base — the
write-heavy/read-light trade every streaming-ingest table format
offers, without the format dependency.
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
_LOG_DIR = "_log"
_LOG_META_FILE = "_log_meta.json"
_LOG_BATCH_RE = re.compile(r"^logbatch=\d+$")


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


# ------------------------------------------------- merge-on-read tier


def _log_batch_dirs(table_dir: str) -> list[str]:
    """Unfolded change-log batch directories, oldest batch first."""
    log_dir = os.path.join(table_dir, _LOG_DIR)
    if not os.path.isdir(log_dir):
        return []
    dirs = [d for d in os.listdir(log_dir) if _LOG_BATCH_RE.match(d)]
    dirs.sort(key=lambda d: int(d.split("=", 1)[1]))
    return [os.path.join(log_dir, d) for d in dirs]


def _write_log_meta(table_dir: str, op_col: str, seq_col: str) -> None:
    """Persist (and verify on re-drain) which columns of the log files
    are the CDC op/seq — the reader and compactor need them, and mixing
    drains with different names against one log would mis-order it."""
    log_dir = os.path.join(table_dir, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, _LOG_META_FILE)
    want = {"op_col": op_col, "seq_col": seq_col}
    if os.path.exists(path):
        with open(path) as f:
            have = json.load(f)
        if have != want:
            raise ValueError(
                f"neurondb: merge-on-read log at {log_dir!r} was written "
                f"with {have}, this drain passed {want} — one log, one "
                "op/seq naming"
            )
        return
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(want, f)
    os.replace(tmp, path)


def _load_log_meta(table_dir: str) -> dict:
    with open(os.path.join(table_dir, _LOG_DIR, _LOG_META_FILE)) as f:
        return json.load(f)


def _latest_log_changes(
    log: DataFrame, key_cols: list[str], op_col: str, seq_col: str,
) -> DataFrame:
    """Cross-batch last-writer-wins reduction of the change log to ONE
    row per key: newest batch wins, then highest seq within the batch,
    then the same stable payload-hash tiebreak as apply_changes. One
    window over the LOG (bounded by the compaction cadence), never over
    the table."""
    from pyspark.sql import Window as W

    payload = [c for c in log.columns
               if c not in (*key_cols, seq_col, "logbatch", "bucket")]
    w = W.partitionBy(*key_cols).orderBy(
        F.col("logbatch").desc(), F.col(seq_col).desc(),
        F.xxhash64(*payload).desc(),
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def compact_merge_table(
    spark: SparkSession,
    table_dir: str,
    files_per_bucket: int = 8,
) -> int:
    """Fold the unfolded change log into the base buckets (the
    merge-on-read table's compaction job — Hudi's compactor / the
    reference's background defrag worker, NeuronDB/src/worker/
    worker_init.c:127-176). Reduces the log once (last-writer-wins),
    rewrites only the TOUCHED buckets via the same verified
    backup-keeping swap as the copy-on-write drain, then drops the
    folded batch directories. Returns the number of batches folded.

    Crash-safe without its own journal: a crash after some bucket swaps
    leaves those changes BOTH in the base and in the log — re-applying
    identical last-writer-wins changes is idempotent, so the retry (or
    any read, which unions base + log) converges to the same state; a
    crash mid-swap is healed by the bucket's own recover()."""
    batch_dirs = _log_batch_dirs(table_dir)
    if not batch_dirs:
        return 0
    meta = _load_table_meta(table_dir)
    if meta is None:
        raise ValueError(
            f"neurondb: {table_dir!r} has a change log but no "
            "_table_meta.json — not an init_merge_table layout"
        )
    key_cols, n_buckets = meta["key_cols"], meta["n_buckets"]
    lmeta = _load_log_meta(table_dir)
    op_col, seq_col = lmeta["op_col"], lmeta["seq_col"]
    log = spark.read.option(
        "basePath", os.path.join(table_dir, _LOG_DIR)
    ).parquet(*batch_dirs)
    latest = _latest_log_changes(
        log, key_cols, op_col, seq_col
    ).localCheckpoint(eager=True)  # one log reduce, reused per bucket
    touched = sorted(
        r["bucket"] for r in latest.select("bucket").distinct().collect()
    )  # bounded collect: ≤ n_buckets rows
    for b in touched:
        bdir = os.path.join(table_dir, f"bucket={b}")
        recover(bdir)
        ch = latest.where(F.col("bucket") == b).drop(
            "bucket", "logbatch", seq_col
        )
        if os.path.isdir(bdir):
            cur = spark.read.parquet(bdir)
            merged = apply_changes(
                cur, ch, key_cols, op_col=op_col, seq_col=None,
                validate=False,
            )
            tmp = bdir + ".merge_tmp"
            merged.coalesce(files_per_bucket).write.mode(
                "overwrite"
            ).parquet(tmp)
            _swap_in(spark, bdir, tmp)
        else:
            merged = apply_changes(
                ch.where(F.col(op_col) != "d").drop(op_col).limit(0),
                ch, key_cols, op_col=op_col, seq_col=None, validate=False,
            )
            merged.coalesce(files_per_bucket).write.mode(
                "overwrite"
            ).parquet(bdir)
    for d in batch_dirs:
        shutil.rmtree(d)
    return len(batch_dirs)


def rebalance_merge_table(
    spark: SparkSession, table_dir: str, n_buckets: int,
) -> None:
    """Re-bucket a merge table to a new bucket count — the rebalance job
    ``init_merge_table`` names as the only way bucket count changes
    (growing tables outgrow their bucketing; the reference's analog is
    rebalance_index). Folds the change log first (a log written under
    the old bucketing would be mis-sliced by the new one), rewrites the
    whole table once into a staging dir with the new layout + meta,
    carries the streaming checkpoint and log meta across, then swaps via
    the verified backup-keeping rename — a crash mid-swap is recover()'d
    by the next drain's healing pass, and the checkpoint carry means
    drains continue from where they were instead of replaying history.
    One full-table shuffle by construction; run it as the offline
    maintenance job it is."""
    meta = _load_table_meta(table_dir)
    if meta is None:
        raise ValueError(
            f"neurondb: {table_dir!r} has no _table_meta.json — "
            "re-init legacy tables before rebalancing"
        )
    if int(n_buckets) < 1:
        raise ValueError("neurondb: n_buckets must be >= 1")
    compact_merge_table(spark, table_dir)
    df = read_merge_table(spark, table_dir)
    tmp = table_dir.rstrip("/") + ".rebalance_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        df.withColumn("bucket", _bucket_of(meta["key_cols"], int(n_buckets)))
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    )
    _write_table_meta(tmp, meta["key_cols"], int(n_buckets))
    for aux in ("_merge_checkpoint", _LOG_DIR):
        p = os.path.join(table_dir, aux)
        if os.path.isdir(p):
            shutil.copytree(p, os.path.join(tmp, aux))
    _swap_in(spark, table_dir, tmp)


def lookup_merge_table(
    spark: SparkSession, table_dir: str, key: dict,
) -> DataFrame:
    """Bucket-pruned point read: the current row(s) for ONE key, reading
    only that key's ``bucket=N`` slice of the base (1/n_buckets of the
    table) plus the same bucket's change-log slices — the 100 TB key
    lookup a full read_merge_table (all buckets + whole-log window)
    would pay the entire table for. ``key`` must bind every key column.

    Cost: one 1-row job to evaluate the bucket hash with Spark's own
    function (never reimplemented driver-side — a Python Murmur3 that
    drifted from F.hash would silently read the wrong bucket), then a
    single-bucket scan with the key predicate pushed down."""
    meta = _load_table_meta(table_dir)
    if meta is None:
        raise ValueError(
            f"neurondb: {table_dir!r} has no _table_meta.json — "
            "lookup needs the recorded bucketing"
        )
    key_cols, n_buckets = meta["key_cols"], meta["n_buckets"]
    if set(key) != set(key_cols):
        raise ValueError(
            f"neurondb: lookup key must bind exactly {key_cols}, got "
            f"{sorted(key)}"
        )
    bucket_paths = sorted(
        os.path.join(table_dir, d)
        for d in os.listdir(table_dir)
        if _BUCKET_DIR_RE.match(d)
    )
    if not bucket_paths:
        raise ValueError(
            f"neurondb: {table_dir!r} has no bucket=N partitions — "
            "not an init_merge_table layout"
        )
    schema_src = spark.read.option("basePath", table_dir).parquet(
        bucket_paths[0]
    ).drop("bucket")
    types = dict(schema_src.dtypes)
    kdf = spark.createDataFrame([tuple(key[c] for c in key_cols)],
                                key_cols)
    kdf = kdf.select(*[F.col(c).cast(types[c]) for c in key_cols])
    b = int(
        kdf.select(_bucket_of(key_cols, n_buckets).alias("b")).head()["b"]
    )
    pred = None
    for c in key_cols:
        cond = F.col(c).eqNullSafe(F.lit(key[c]).cast(types[c]))
        pred = cond if pred is None else (pred & cond)
    bdir = os.path.join(table_dir, f"bucket={b}")
    base = None
    if os.path.isdir(bdir):
        base = (
            spark.read.option("basePath", table_dir).parquet(bdir)
            .drop("bucket").where(pred)
        )
    log_slices = [
        p for d in _log_batch_dirs(table_dir)
        if os.path.isdir(p := os.path.join(d, f"bucket={b}"))
    ]
    if not log_slices:
        return base if base is not None else schema_src.limit(0)
    lmeta = _load_log_meta(table_dir)
    op_col, seq_col = lmeta["op_col"], lmeta["seq_col"]
    log = spark.read.option(
        "basePath", os.path.join(table_dir, _LOG_DIR)
    ).parquet(*log_slices).where(pred)
    latest = _latest_log_changes(log, key_cols, op_col, seq_col)
    out_cols = schema_src.columns
    upserts = latest.where(F.col(op_col) != "d").select(*out_cols)
    if base is None:
        return upserts
    return base.join(
        latest.select(*key_cols), key_cols, "left_anti"
    ).unionByName(upserts)


def read_merge_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Current table state (all buckets, layout column dropped). Reads
    by explicit ``bucket=N`` paths so a crash leftover the drain has not
    healed yet can never poison partition discovery.

    Merge-on-read: when unfolded change-log batches exist, the read
    unions base + log with the same last-writer-wins semantics the
    compactor folds with — a read between drains/compactions sees every
    landed change, at the cost of one window over the (cadence-bounded)
    log."""
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
    base = (
        spark.read.option("basePath", table_dir).parquet(*paths).drop("bucket")
    )
    batch_dirs = _log_batch_dirs(table_dir)
    if not batch_dirs:
        return base
    meta = _load_table_meta(table_dir)
    if meta is None:
        raise ValueError(
            f"neurondb: {table_dir!r} has a change log but no "
            "_table_meta.json — not an init_merge_table layout"
        )
    lmeta = _load_log_meta(table_dir)
    op_col, seq_col = lmeta["op_col"], lmeta["seq_col"]
    log = spark.read.option(
        "basePath", os.path.join(table_dir, _LOG_DIR)
    ).parquet(*batch_dirs)
    latest = _latest_log_changes(log, meta["key_cols"], op_col, seq_col)
    survivors = base.join(
        latest.select(*meta["key_cols"]), meta["key_cols"], "left_anti"
    )
    upserts = latest.where(F.col(op_col) != "d").select(*base.columns)
    return survivors.unionByName(upserts)


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
    merge_on_read: bool = False,
    compact_every: int = 0,
) -> None:
    """Drain change files (rows = table columns + op i/u/d + seq) into
    the bucketed table, AvailableNow run-once semantics; re-invoking
    after new files land continues from the checkpoint. ``seq_col`` is
    REQUIRED: a CDC batch legitimately carries several changes per key
    and "arbitrary row wins" is a silent bug — the drain refuses to
    guess (apply_changes's last-writer-wins window orders them).
    ``key_cols``/``n_buckets`` are verified against the layout recorded
    at ``init_merge_table`` — a mismatch errors instead of silently
    scattering changes across the wrong buckets.

    ``merge_on_read=True`` switches the drain to the Hudi MOR shape:
    each micro-batch is ONE bucketed append into the table's change log
    (``_log/logbatch=<id>/bucket=<b>``) — no base read, no bucket
    rewrite — and reads union base + log with last-writer-wins
    (read_merge_table). Replay-idempotent because each batch overwrites
    its OWN logbatch directory. ``compact_every=N`` folds the log into
    the base after every Nth batch (compact_merge_table — the CDC-index
    drain's compaction-cadence shape); 0 = never, compaction is then an
    explicit job. Write amplification per batch drops from
    k·(table/n_buckets) to the batch's own bytes; the read pays one
    window over the cadence-bounded log."""
    _check_table_meta(table_dir, key_cols, n_buckets)
    _heal_table(table_dir)
    if merge_on_read:
        _write_log_meta(table_dir, op_col, seq_col)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(src_dir)
    committed_n = 0  # in-process cadence counter (index_ingest playbook)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal committed_n
        # one bounded validation job per BATCH (then validate=False per
        # bucket slice)
        if batch_df.where(~F.col(op_col).isin("i", "u", "d")).limit(1).count():
            raise ValueError(
                f"neurondb: {op_col!r} must be one of 'i'/'u'/'d'"
            )
        if merge_on_read:
            (
                batch_df.withColumn("bucket", _bucket_of(key_cols, n_buckets))
                .write.mode("overwrite").partitionBy("bucket")
                .parquet(os.path.join(
                    table_dir, _LOG_DIR, f"logbatch={int(batch_id)}"
                ))
            )
            committed_n += 1
            if compact_every and committed_n % int(compact_every) == 0:
                compact_merge_table(
                    spark, table_dir, files_per_bucket=files_per_bucket
                )
            return
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
