"""Streaming CDC drain into a bucketed, manifest-committed TABLE (§2.13
× data_management.apply_changes — the table-level twin of the index CDC
drain in streaming/index_ingest.py).

Reference analog: WAL-replayed table DML (NeuronDB/src/storage/
vector_wal.c applies logged insert/update/delete to heap + index; a PG
table gets UPDATE/DELETE natively). Spark-first form = the Hudi/Delta
shape without the table-format dependency:

- the table lives as ``table_dir/bucket=<b>/__nbv=<v>/`` parquet,
  bucketed by a hash of the key — the physical layout that bounds every
  merge's write amplification to the TOUCHED buckets, not the whole
  table. Version dirs are IMMUTABLE once published: a rewrite writes a
  NEW ``__nbv`` dir, never touches the old one;
- every state change is an atomic MANIFEST COMMIT (``_manifest.json``,
  tmp + rename — the Iceberg commit shape): the manifest records each
  bucket's current version dir and the unfolded change-log batches, and
  every reader resolves its ENTIRE file set from the manifest ONCE at
  read start. A compaction/drain/rebalance swapping buckets mid-read
  can no longer tear a reader between pre- and post-fold buckets — the
  reader's snapshot is whatever manifest it opened;
- files dereferenced by a commit are RETIRED, not deleted: they are
  garbage-collected at the NEXT commit (one-commit retention, the
  expire-snapshots analog), so a snapshot opened against manifest N
  stays readable until commit N+2;
- copy-on-write drains rewrite touched buckets per micro-batch;
  merge-on-read drains (``merge_on_read=True``) append one bucketed
  change-log directory per batch and reads union base + log with
  last-writer-wins; a cadence-driven compactor
  (``compact_merge_table``) folds the log back into the base. The
  cadence triggers on the MANIFEST's unfolded-batch count — durable by
  construction, so a crash that skipped a scheduled fold self-heals on
  the next drain;
- exactly-once to the reader: the apply is IDEMPOTENT (upserts replace,
  deletes remove, inserts anti-join), so a post-crash replay of the
  same micro-batch — or of a half-applied one — converges to the same
  state; the streaming checkpoint guarantees no batch is skipped, and
  a crash before a manifest publish leaves only orphan version dirs —
  never referenced by any manifest, never overwritten (the next write
  numbers PAST them), reclaimed by ``vacuum_merge_table``.

Single writer at a time (the streaming checkpoint's own contract),
ENFORCED optimistically at every manifest commit: the committer
re-reads ``_manifest.json`` immediately before publishing and raises
:class:`ConcurrentWriterError` if another writer committed since this
one loaded its manifest — the classic lost-update becomes a clear
error instead of a silently vanished commit. Readers are lock-free
against the writer via the manifest snapshot.

At 100 TB: buckets = thousands (a few GB each); a COW micro-batch
touching k buckets rewrites ~k·(table/n_buckets) bytes; a MOR batch
writes only itself and reads pay one window over the cadence-bounded
log. Steady-state disk = current files + the last commit's retired set
(one version back per touched bucket).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark.data_management import apply_changes, recover

_BUCKET_DIR_RE = re.compile(r"^bucket=\d+$")
_VER_DIR_RE = re.compile(r"^__nbv=\d+$")
_META_FILE = "_table_meta.json"
_MANIFEST_FILE = "_manifest.json"
_LOG_DIR = "_log"
_LOG_META_FILE = "_log_meta.json"
_LOG_BATCH_RE = re.compile(r"^logbatch=\d+$")


class ConcurrentWriterError(RuntimeError):
    """Two writers raced one manifest commit. The single-writer contract
    (one drain/compaction/rebalance/vacuum at a time) is the caller's to
    uphold; this error is the optimistic enforcement that turns a
    violated contract into a loud failure instead of a silently lost
    commit. Reference analog: PG's page-level locking under generic_xlog
    (NeuronDB/src/index/hnsw_am.c:32) makes the same interleaving
    impossible by blocking; here the loser aborts and may retry from a
    fresh manifest."""


def _write_table_meta(table_dir: str, key_cols: list[str],
                      n_buckets: int,
                      dtypes: list[tuple[str, str]] | None = None) -> None:
    """Persist the table's immutable layout parameters next to the data
    (tmp + atomic rename). Without this, a drain called with a different
    n_buckets than the table was bucketed with hashes a key's change to
    the WRONG bucket — the upsert lands as an insert elsewhere while the
    stale row survives, silent duplicate keys on read. ``dtypes``
    (ordered column→Spark-SQL-type pairs, from ``df.dtypes``) caches the
    table schema so point lookups never open a parquet footer just for
    column types; it is refreshed at init/rebalance — the only moments
    the schema can change."""
    tmp = os.path.join(table_dir, _META_FILE + ".tmp")
    meta: dict = {"key_cols": list(key_cols), "n_buckets": int(n_buckets)}
    if dtypes is not None:
        meta["dtypes"] = [[c, t] for c, t in dtypes]
    with open(tmp, "w") as f:
        json.dump(meta, f)
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
    """Clear PRE-MANIFEST crash leftovers so nothing stale poisons a
    legacy directory listing: ``bucket=N.old`` either restores a missing
    bucket (recover) or is a stale backup (swap completed — drop it);
    ``*.merge_tmp`` is an incomplete write (the original bucket is
    intact — drop it). Manifest-era writes never create either shape
    (new version dirs are published by manifest commit, not by swap)."""
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


# ------------------------------------------------------ manifest commits


def _read_manifest(table_dir: str) -> dict | None:
    try:
        with open(os.path.join(table_dir, _MANIFEST_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _list_log_dirs_raw(table_dir: str) -> list[str]:
    """Raw on-disk ``logbatch=N`` directories (manifest-blind — includes
    folded-but-retained and orphan dirs), oldest first."""
    log_dir = os.path.join(table_dir, _LOG_DIR)
    if not os.path.isdir(log_dir):
        return []
    dirs = [d for d in os.listdir(log_dir) if _LOG_BATCH_RE.match(d)]
    dirs.sort(key=lambda d: int(d.split("=", 1)[1]))
    return [os.path.join(log_dir, d) for d in dirs]


def _synth_manifest(table_dir: str) -> dict:
    """Bootstrap a manifest for a pre-manifest (legacy) table from its
    directory listing: loose-file buckets are referenced by their root
    dir; every on-disk log batch counts as unfolded (legacy compaction
    deleted folded dirs eagerly, so whatever remains IS the unfolded
    set). The synthesized manifest is not persisted — the next commit
    publishes a real one."""
    buckets: dict[str, str] = {}
    if os.path.isdir(table_dir):
        for name in os.listdir(table_dir):
            if not _BUCKET_DIR_RE.match(name):
                continue
            vers = [
                int(v.split("=", 1)[1])
                for v in os.listdir(os.path.join(table_dir, name))
                if _VER_DIR_RE.match(v)
            ]
            b = name.split("=", 1)[1]
            # version dirs without a manifest only arise from an init
            # crash; best effort = newest. Loose files = legacy layout.
            buckets[b] = f"{name}/__nbv={max(vers)}" if vers else name
    log_batches = [
        int(os.path.basename(d).split("=", 1)[1])
        for d in _list_log_dirs_raw(table_dir)
    ]
    return {"format": "neurondb-merge-manifest-v1", "commit": 0,
            "buckets": buckets, "log_batches": log_batches, "retired": []}


def _load_manifest(table_dir: str) -> dict:
    m = _read_manifest(table_dir)
    return m if m is not None else _synth_manifest(table_dir)


_HISTORY_DIR = "_manifests"
# History copies retained: at one commit per micro-batch a streaming
# drain would otherwise grow _manifests/ without bound (the Iceberg
# expire-snapshots-metadata analog). Commits older than the newest
# _HISTORY_KEEP lose only their metadata record — their DATA files were
# garbage-collected one commit after dereference anyway, so nothing
# readable is lost; time travel to a pruned commit raises the same
# clear history error as an unrecorded one.
_HISTORY_KEEP = 512


def _publish_manifest(table_dir: str, manifest: dict) -> None:
    """Atomic manifest publish + an immutable copy under ``_manifests/``
    (commit history — KBs per commit; time-travel metadata survives even
    after the commit's data files are garbage-collected). History is
    pruned to the newest ``_HISTORY_KEEP`` commits."""
    tmp = os.path.join(table_dir, _MANIFEST_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(table_dir, _MANIFEST_FILE))
    hist = os.path.join(table_dir, _HISTORY_DIR)
    os.makedirs(hist, exist_ok=True)
    hpath = os.path.join(hist, f"{int(manifest['commit']):08d}.json")
    htmp = hpath + ".tmp"
    with open(htmp, "w") as f:
        json.dump(manifest, f)
    os.replace(htmp, hpath)
    copies = sorted(n for n in os.listdir(hist)
                    if n.endswith(".json") and not n.endswith(".tmp"))
    for name in copies[:-_HISTORY_KEEP]:
        os.remove(os.path.join(hist, name))


def _gc_paths(table_dir: str, rels: list[str]) -> None:
    for rel in rels:
        p = os.path.join(table_dir, rel)
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif os.path.exists(p):
            os.remove(p)


def _check_no_foreign_commit(table_dir: str, prev: dict) -> None:
    """Optimistic-concurrency gate: the manifest on disk must still be
    the one this writer loaded (same commit number) — otherwise another
    writer published in between, and committing over it would silently
    erase that writer's bucket swaps / log appends (lost update). A
    missing on-disk manifest matches the synthesized commit-0 a legacy
    table's writer starts from."""
    cur = _read_manifest(table_dir)
    cur_commit = int(cur.get("commit", 0)) if cur is not None else 0
    want = int(prev.get("commit", 0))
    if cur_commit != want:
        raise ConcurrentWriterError(
            f"neurondb: merge table at {table_dir!r} advanced to commit "
            f"{cur_commit} while this writer was working from commit "
            f"{want} — a concurrent drain/compaction/rebalance violated "
            "the single-writer contract. This writer's changes were NOT "
            "committed; reload the manifest and retry"
        )


def _commit_manifest(
    table_dir: str, prev: dict, bucket_updates: dict[str, str],
    newly_retired: list[str], log_batches: list[int],
) -> dict:
    """One atomic state change: garbage-collect what the PREVIOUS commit
    retired (one-commit retention — a reader holding the previous
    manifest still needs those files; a reader holding this one doesn't
    reference them), then publish the new manifest. Crash between GC and
    publish re-runs idempotently (GC skips missing paths). The publish
    is guarded by the optimistic concurrent-writer check — the GC before
    it only touches ``prev``'s retired set, which EVERY successor commit
    (this writer's or a racing one's) deletes identically, so a losing
    writer's partial GC destroys nothing a winner still references."""
    _gc_paths(table_dir, prev.get("retired", []))
    new = {
        "format": "neurondb-merge-manifest-v1",
        "commit": int(prev.get("commit", 0)) + 1,
        "buckets": {**prev.get("buckets", {}), **bucket_updates},
        "log_batches": sorted(set(int(i) for i in log_batches)),
        "retired": sorted(set(newly_retired)),
    }
    _check_no_foreign_commit(table_dir, prev)
    _publish_manifest(table_dir, new)
    return new


def _next_version_rel(table_dir: str, b: int) -> str:
    """Relative path of the NEXT version dir for bucket ``b`` — one past
    the highest on disk, so orphans from a crashed (never-published)
    commit are never overwritten while possibly mid-write elsewhere."""
    broot = os.path.join(table_dir, f"bucket={b}")
    cur = -1
    if os.path.isdir(broot):
        for name in os.listdir(broot):
            if _VER_DIR_RE.match(name):
                cur = max(cur, int(name.split("=", 1)[1]))
    return f"bucket={b}/__nbv={cur + 1}"


def _bucket_retired(table_dir: str, prev_rel: str | None) -> list[str]:
    """What replacing a bucket's current data dereferences: the old
    version dir, or — for a legacy loose-file bucket whose ROOT now also
    holds the new version dir — the individual loose files."""
    if prev_rel is None:
        return []
    if _VER_DIR_RE.match(os.path.basename(prev_rel)):
        return [prev_rel]
    broot = os.path.join(table_dir, prev_rel)
    if not os.path.isdir(broot):
        return []
    return [
        f"{prev_rel}/{f}" for f in os.listdir(broot)
        if not f.startswith(("_", ".")) and not _VER_DIR_RE.match(f)
    ]


def _write_bucket_version(
    spark: SparkSession, table_dir: str, b: int, manifest: dict,
    ch: DataFrame, key_cols: list[str], op_col: str, seq_col: str | None,
    files_per_bucket: int,
) -> tuple[str, list[str]]:
    """Merge ``ch`` into bucket ``b``'s current data and write the result
    as a NEW immutable version dir (never published until the caller's
    manifest commit). Returns (new relative dir, retired relative paths).
    A bucket is a table/n_buckets slice — the coalesce caps its file
    count so repeated rewrites don't shard it into one file per shuffle
    partition (small-file creep across batches)."""
    prev_rel = manifest["buckets"].get(str(b))
    if prev_rel is not None:
        cur = spark.read.parquet(os.path.join(table_dir, prev_rel))
        merged = apply_changes(
            cur, ch, key_cols, op_col=op_col, seq_col=seq_col,
            validate=False,
        )
    else:
        # brand-new bucket: surviving upserts only
        drop_cols = [op_col] + ([seq_col] if seq_col else [])
        merged = apply_changes(
            ch.where(F.col(op_col) != "d").drop(*drop_cols).limit(0),
            ch, key_cols, op_col=op_col, seq_col=seq_col, validate=False,
        )
    rel = _next_version_rel(table_dir, b)
    merged.coalesce(files_per_bucket).write.mode("overwrite").parquet(
        os.path.join(table_dir, rel)
    )
    return rel, _bucket_retired(table_dir, prev_rel)


def init_merge_table(
    spark: SparkSession, df: DataFrame, table_dir: str,
    key_cols: list[str], n_buckets: int = 16,
) -> None:
    """Seed the bucketed table layout from a base frame: one partitioned
    write (every bucket at version 0), then layout meta + the first
    manifest commit. Bucket count is fixed for the table's lifetime
    (re-bucketing is a rebalance job, rebalance_merge_table)."""
    (
        df.withColumn("bucket", _bucket_of(key_cols, n_buckets))
        .withColumn("__nbv", F.lit(0))
        .write.mode("overwrite").partitionBy("bucket", "__nbv")
        .parquet(table_dir)
    )
    _write_table_meta(table_dir, key_cols, n_buckets, dtypes=df.dtypes)
    buckets = {
        name.split("=", 1)[1]: f"{name}/__nbv=0"
        for name in os.listdir(table_dir)
        if _BUCKET_DIR_RE.match(name)
    }
    _publish_manifest(table_dir, {
        "format": "neurondb-merge-manifest-v1", "commit": 1,
        "buckets": buckets, "log_batches": [], "retired": [],
    })


# ------------------------------------------------- merge-on-read tier


def _log_batch_dirs(table_dir: str) -> list[str]:
    """UNFOLDED change-log batch directories, oldest first — the
    manifest's list (folded-but-retained and orphan dirs excluded);
    raw directory listing for legacy manifest-less tables."""
    m = _read_manifest(table_dir)
    if m is None:
        return _list_log_dirs_raw(table_dir)
    return [
        os.path.join(table_dir, _LOG_DIR, f"logbatch={i}")
        for i in sorted(int(x) for x in m.get("log_batches", []))
    ]


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
    writes each touched bucket as a new immutable version dir, then
    publishes ONE manifest commit that swaps every touched bucket and
    empties the unfolded list atomically — a reader holding the prior
    manifest keeps its pre-fold snapshot (old versions + log are
    retired, not deleted, until the next commit). Returns the number of
    batches folded.

    Crash-safe without its own journal: a crash before the manifest
    publish leaves only orphan version dirs (unreferenced and never
    overwritten; reclaimed by ``vacuum_merge_table``) — the prior
    manifest still shows the log unfolded, so the retry folds the
    identical last-writer-wins changes again, idempotent by
    construction."""
    recover(table_dir)
    manifest = _load_manifest(table_dir)
    batch_ids = sorted(int(i) for i in manifest.get("log_batches", []))
    if not batch_ids:
        return 0
    meta = _load_table_meta(table_dir)
    if meta is None:
        raise ValueError(
            f"neurondb: {table_dir!r} has a change log but no "
            "_table_meta.json — not an init_merge_table layout"
        )
    key_cols = meta["key_cols"]
    lmeta = _load_log_meta(table_dir)
    op_col, seq_col = lmeta["op_col"], lmeta["seq_col"]
    batch_dirs = [
        os.path.join(table_dir, _LOG_DIR, f"logbatch={i}") for i in batch_ids
    ]
    log = spark.read.option(
        "basePath", os.path.join(table_dir, _LOG_DIR)
    ).parquet(*batch_dirs)
    latest = _latest_log_changes(
        log, key_cols, op_col, seq_col
    ).localCheckpoint(eager=True)  # one log reduce, reused per bucket
    touched = sorted(
        r["bucket"] for r in latest.select("bucket").distinct().collect()
    )  # bounded collect: ≤ n_buckets rows
    updates: dict[str, str] = {}
    retired = [f"{_LOG_DIR}/logbatch={i}" for i in batch_ids]
    for b in touched:
        ch = latest.where(F.col("bucket") == b).drop(
            "bucket", "logbatch", seq_col
        )
        rel, ret = _write_bucket_version(
            spark, table_dir, b, manifest, ch, key_cols, op_col,
            None, files_per_bucket,
        )
        updates[str(b)] = rel
        retired.extend(ret)
    _commit_manifest(table_dir, manifest, updates, retired, [])
    return len(batch_ids)


def rebalance_merge_table(
    spark: SparkSession, table_dir: str, n_buckets: int,
) -> None:
    """Re-bucket a merge table to a new bucket count — the rebalance job
    ``init_merge_table`` names as the only way bucket count changes
    (growing tables outgrow their bucketing; the reference's analog is
    rebalance_index). Folds the change log first (a log written under
    the old bucketing would be mis-sliced by the new one) and
    garbage-collects the retired set (offline job — no reader to keep a
    snapshot for), rewrites the whole table once into a staging dir with
    the new layout + meta + manifest, carries the streaming checkpoint
    and log meta across, then swaps via the verified backup-keeping
    rename — a crash mid-swap is recover()'d at the next entry into ANY
    merge-table operation, and the checkpoint carry means drains
    continue from where they were instead of replaying history. One
    full-table shuffle by construction; run it as the offline
    maintenance job it is."""
    from neurondb_spark.data_management import _swap_in

    recover(table_dir)
    meta = _load_table_meta(table_dir)
    if meta is None:
        raise ValueError(
            f"neurondb: {table_dir!r} has no _table_meta.json — "
            "re-init legacy tables before rebalancing"
        )
    if int(n_buckets) < 1:
        raise ValueError("neurondb: n_buckets must be >= 1")
    compact_merge_table(spark, table_dir)
    # offline: drop the fold's retired set now rather than at next commit
    m = _load_manifest(table_dir)
    if m.get("retired"):
        _gc_paths(table_dir, m["retired"])
        _check_no_foreign_commit(table_dir, m)
        _publish_manifest(table_dir, dict(m, commit=m["commit"] + 1,
                                          retired=[]))
    df = read_merge_table(spark, table_dir)
    tmp = table_dir.rstrip("/") + ".rebalance_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        df.withColumn("bucket", _bucket_of(meta["key_cols"], int(n_buckets)))
        .withColumn("__nbv", F.lit(0))
        .write.mode("overwrite").partitionBy("bucket", "__nbv").parquet(tmp)
    )
    _write_table_meta(tmp, meta["key_cols"], int(n_buckets),
                      dtypes=df.dtypes)
    buckets = {
        name.split("=", 1)[1]: f"{name}/__nbv=0"
        for name in os.listdir(tmp)
        if _BUCKET_DIR_RE.match(name)
    }
    _publish_manifest(tmp, {
        "format": "neurondb-merge-manifest-v1", "commit": 1,
        "buckets": buckets, "log_batches": [], "retired": [],
    })
    ckpt = os.path.join(table_dir, "_merge_checkpoint")
    if os.path.isdir(ckpt):
        shutil.copytree(ckpt, os.path.join(tmp, "_merge_checkpoint"))
    log_meta = os.path.join(table_dir, _LOG_DIR, _LOG_META_FILE)
    if os.path.exists(log_meta):
        os.makedirs(os.path.join(tmp, _LOG_DIR), exist_ok=True)
        shutil.copy(log_meta, os.path.join(tmp, _LOG_DIR, _LOG_META_FILE))
    _swap_in(spark, table_dir, tmp)


def merge_table_history(table_dir: str) -> list[dict]:
    """The table's recorded commits, oldest first — each entry is the
    manifest published at that commit (commit number, bucket→version
    map, unfolded log batches, retired set). Driver-side JSON reads;
    KBs per commit. The ops surface behind ``read_merge_table(
    at_commit=...)``: pick a commit here, read it there."""
    hist = os.path.join(table_dir, _HISTORY_DIR)
    if not os.path.isdir(hist):
        return []
    out = []
    for name in sorted(os.listdir(hist)):
        if not name.endswith(".json") or name.endswith(".tmp"):
            continue
        try:
            with open(os.path.join(hist, name)) as f:
                out.append(json.load(f))
        except (OSError, ValueError):
            continue  # half-written history copy — skip, never raise
    out.sort(key=lambda m: int(m.get("commit", 0)))
    return out


def vacuum_merge_table(table_dir: str) -> dict:
    """Remove files no manifest holder can reach — the remove-orphan-
    files maintenance job: version dirs from crashed (never-published)
    commits and on-disk log batches that are neither unfolded nor in the
    retired set. The RETIRED set itself is untouched (a reader of the
    previous manifest may still hold it; the next commit deletes it on
    schedule), as is a ``.rebalance_tmp`` sibling only if orphaned.
    Returns ``{"orphan_versions": n, "orphan_log_batches": n}``.

    Writer-class job (same single-writer contract as drain/compaction/
    rebalance): a concurrent drain's not-yet-published version dirs look
    exactly like orphans — do not run them together."""
    recover(table_dir)
    m = _read_manifest(table_dir)
    if m is None:
        raise ValueError(
            f"neurondb: {table_dir!r} has no _manifest.json — vacuum "
            "needs the recorded file set (legacy tables migrate on "
            "their first post-manifest write)"
        )
    keep = set(m.get("buckets", {}).values()) | set(m.get("retired", []))
    n_ver = 0
    for name in os.listdir(table_dir):
        if not _BUCKET_DIR_RE.match(name):
            continue
        broot = os.path.join(table_dir, name)
        for v in os.listdir(broot):
            rel = f"{name}/{v}"
            if _VER_DIR_RE.match(v) and rel not in keep:
                shutil.rmtree(os.path.join(broot, v), ignore_errors=True)
                n_ver += 1
    live_logs = {f"{_LOG_DIR}/logbatch={int(i)}"
                 for i in m.get("log_batches", [])}
    n_log = 0
    for d in _list_log_dirs_raw(table_dir):
        rel = f"{_LOG_DIR}/{os.path.basename(d)}"
        if rel not in live_logs and rel not in keep:
            shutil.rmtree(d, ignore_errors=True)
            n_log += 1
    staging = table_dir.rstrip("/") + ".rebalance_tmp"
    if os.path.isdir(staging):
        shutil.rmtree(staging, ignore_errors=True)
    return {"orphan_versions": n_ver, "orphan_log_batches": n_log}


def lookup_merge_table_many(
    spark: SparkSession, table_dir: str, keys: list[dict],
    at_commit: int | None = None,
) -> DataFrame:
    """Bucket-pruned point read for N keys: the current row(s) for each
    key, reading only the touched buckets' current version dirs (each
    1/n_buckets of the table) plus those buckets' unfolded log slices —
    the 100 TB key lookup a full read_merge_table (all buckets +
    whole-log window) would pay the entire table for. Every key must
    bind every key column. File set resolves from the manifest once —
    the same snapshot semantics as read_merge_table.

    Cost: ONE job evaluating every key's bucket hash with Spark's own
    function (never reimplemented driver-side — a Python Murmur3 that
    drifted from F.hash would silently read the wrong bucket), then one
    pruned scan per TOUCHED bucket with the key predicates pushed down.
    N is point-lookup sized; the per-bucket OR-of-keys predicate is
    linear in that bucket's keys. ``at_commit`` answers the lookup
    against a recorded historical commit (same retention contract as
    read_merge_table)."""
    recover(table_dir)
    meta = _load_table_meta(table_dir)
    if meta is None:
        raise ValueError(
            f"neurondb: {table_dir!r} has no _table_meta.json — "
            "lookup needs the recorded bucketing"
        )
    key_cols, n_buckets = meta["key_cols"], meta["n_buckets"]
    if not keys:
        raise ValueError("neurondb: lookup needs at least one key")
    for key in keys:
        if set(key) != set(key_cols):
            raise ValueError(
                f"neurondb: lookup key must bind exactly {key_cols}, got "
                f"{sorted(key)}"
            )
    manifest = (_load_manifest(table_dir) if at_commit is None
                else _manifest_at(table_dir, at_commit))
    if not manifest["buckets"]:
        raise ValueError(
            f"neurondb: {table_dir!r} has no bucket=N partitions — "
            "not an init_merge_table layout"
        )
    # column dtypes from the meta cache written at init/rebalance — the
    # lookup path touches NO parquet footer for schema; only legacy
    # (pre-dtype-cache) tables fall back to one footer read.
    dtypes: list[tuple[str, str]] = [
        (c, t) for c, t in meta.get("dtypes", [])
    ]
    if not dtypes:
        first_rel = manifest["buckets"][min(manifest["buckets"])]
        dtypes = spark.read.parquet(
            os.path.join(table_dir, first_rel)
        ).dtypes
    types = dict(dtypes)
    kdf = spark.createDataFrame(
        [tuple(key[c] for c in key_cols) for key in keys], key_cols
    ).select(*[F.col(c).cast(types[c]) for c in key_cols])
    # the ONE hash job: every key's bucket in a single collect
    krows = kdf.withColumn(
        "__b", _bucket_of(key_cols, n_buckets)
    ).collect()
    by_bucket: dict[int, list] = {}
    for r in krows:
        by_bucket.setdefault(int(r["__b"]), []).append(r)
    # unfolded log batches from the SAME loaded manifest as the buckets
    # (never re-read: a compaction committing between two reads would
    # pair pre-fold buckets with an emptied log — dropped changes; the
    # _load_manifest synth covers legacy manifest-less tables)
    batch_dirs = [
        os.path.join(table_dir, _LOG_DIR, f"logbatch={i}")
        for i in sorted(int(x) for x in manifest.get("log_batches", []))
    ]
    lmeta = _load_log_meta(table_dir) if batch_dirs else None
    out_cols = [c for c, _ in dtypes]
    parts: list[DataFrame] = []
    for b in sorted(by_bucket):
        pred = None
        for r in by_bucket[b]:
            cond = None
            for c in key_cols:
                eq = F.col(c).eqNullSafe(F.lit(r[c]).cast(types[c]))
                cond = eq if cond is None else (cond & eq)
            pred = cond if pred is None else (pred | cond)
        base = None
        rel = manifest["buckets"].get(str(b))
        if rel is not None:
            base = spark.read.parquet(
                os.path.join(table_dir, rel)
            ).where(pred)
        log_slices = [
            p for d in batch_dirs
            if os.path.isdir(p := os.path.join(d, f"bucket={b}"))
        ]
        if not log_slices:
            if base is not None:
                parts.append(base)
            continue
        op_col, seq_col = lmeta["op_col"], lmeta["seq_col"]
        log = spark.read.option(
            "basePath", os.path.join(table_dir, _LOG_DIR)
        ).parquet(*log_slices).where(pred)
        latest = _latest_log_changes(log, key_cols, op_col, seq_col)
        upserts = latest.where(F.col(op_col) != "d").select(*out_cols)
        if base is None:
            parts.append(upserts)
        else:
            parts.append(
                base.join(latest.select(*key_cols), key_cols, "left_anti")
                .unionByName(upserts)
            )
    if not parts:
        return spark.createDataFrame(
            [], ", ".join(f"`{c}` {t}" for c, t in dtypes)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lookup_merge_table(
    spark: SparkSession, table_dir: str, key: dict,
    at_commit: int | None = None,
) -> DataFrame:
    """Bucket-pruned point read of ONE key — the single-key form of
    :func:`lookup_merge_table_many` (multi-key callers should batch:
    one hash job covers all keys)."""
    return lookup_merge_table_many(spark, table_dir, [key],
                                   at_commit=at_commit)


def _manifest_at(table_dir: str, commit: int) -> dict:
    """A historical commit's manifest, with an existence check over every
    data path it references — a commit older than the retention window
    (current + previous) has had its files garbage-collected, and that
    must be a clear error, not a mid-scan FileNotFound."""
    hpath = os.path.join(table_dir, _HISTORY_DIR, f"{int(commit):08d}.json")
    try:
        with open(hpath) as f:
            m = json.load(f)
    except OSError:
        raise ValueError(
            f"neurondb: merge table at {table_dir!r} has no recorded "
            f"commit {commit} (history lives in {_HISTORY_DIR}/; a "
            "rebalance starts a new lineage)"
        ) from None
    rels = list(m.get("buckets", {}).values()) + [
        f"{_LOG_DIR}/logbatch={i}" for i in m.get("log_batches", [])
    ]
    missing = [r for r in rels if not os.path.isdir(os.path.join(table_dir, r))]
    if missing:
        raise ValueError(
            f"neurondb: commit {commit}'s data has been garbage-collected "
            f"(retention is one commit back; missing {missing[:3]}...) — "
            "only the current and previous commits are readable"
        )
    return m


def read_merge_table(
    spark: SparkSession, table_dir: str, at_commit: int | None = None,
) -> DataFrame:
    """Current table state (all buckets). The file set — every bucket's
    current version dir plus the unfolded log batches — resolves from
    the manifest ONCE here, so the returned frame is a consistent
    SNAPSHOT: a compaction or drain committing after this call cannot
    tear the read between pre- and post-fold buckets (their commit
    retires this snapshot's files without deleting them; deletion waits
    one further commit).

    ``at_commit`` time-travels to a recorded commit's manifest (the
    reference's snapshot_time_travel analog at the table-format layer) —
    readable while that commit's files survive the one-commit-back
    retention window; older commits raise a clear retention error.

    Merge-on-read: when unfolded change-log batches exist, the read
    unions base + log with the same last-writer-wins semantics the
    compactor folds with — a read between drains/compactions sees every
    landed change, at the cost of one window over the (cadence-bounded)
    log."""
    recover(table_dir)
    manifest = (_load_manifest(table_dir) if at_commit is None
                else _manifest_at(table_dir, at_commit))
    if not manifest["buckets"]:
        raise ValueError(
            f"neurondb: {table_dir!r} has no bucket=N partitions — "
            "not an init_merge_table layout"
        )
    paths = sorted(
        os.path.join(table_dir, rel) for rel in manifest["buckets"].values()
    )
    base = spark.read.parquet(*paths)
    # unfolded log batches from the SAME loaded manifest as the buckets
    # — never a second manifest read (a compaction committing between
    # the two reads would pair pre-fold buckets with an emptied log,
    # silently dropping every unfolded change; the _load_manifest synth
    # covers legacy manifest-less tables)
    batch_dirs = [
        os.path.join(table_dir, _LOG_DIR, f"logbatch={i}")
        for i in sorted(int(x) for x in manifest.get("log_batches", []))
    ]
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
    scattering changes across the wrong buckets. Each micro-batch is one
    manifest commit (copy-on-write: touched buckets get new version
    dirs; merge-on-read: the batch's log append joins the unfolded
    list).

    A COPY-ON-WRITE drain REFUSES a table with unfolded merge-on-read
    log batches: applying new changes to the base while older log
    entries still shadow it at read time would resurrect deleted rows
    and serve stale values (one forgotten ``merge_on_read`` flag on a
    re-drain) — run ``compact_merge_table`` first, or keep draining
    with ``merge_on_read=True``.

    ``merge_on_read=True`` switches the drain to the Hudi MOR shape:
    each micro-batch is ONE bucketed append into the table's change log
    (``_log/logbatch=<id>/bucket=<b>``) — no base read, no bucket
    rewrite — and reads union base + log with last-writer-wins
    (read_merge_table). Replay-idempotent because each batch overwrites
    its OWN logbatch directory. ``compact_every=N`` folds the log into
    the base whenever the MANIFEST's unfolded-batch count reaches N —
    durable across drain invocations by construction (an AvailableNow
    caller draining one file per invocation still compacts on schedule,
    and a crash that skipped a fold self-heals at the next batch); 0 =
    never, compaction is then an explicit job. Write amplification per
    batch drops from k·(table/n_buckets) to the batch's own bytes; the
    read pays one window over the cadence-bounded log."""
    recover(table_dir)
    _check_table_meta(table_dir, key_cols, n_buckets)
    _heal_table(table_dir)
    if merge_on_read:
        _write_log_meta(table_dir, op_col, seq_col)
    elif os.path.isdir(table_dir) and _log_batch_dirs(table_dir):
        raise ValueError(
            f"neurondb: merge table at {table_dir!r} has unfolded "
            "merge-on-read log batches — a copy-on-write drain over them "
            "would let stale log entries shadow the new base at read "
            "time (resurrecting deletes). Run compact_merge_table first "
            "or pass merge_on_read=True"
        )
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
        manifest = _load_manifest(table_dir)
        if merge_on_read:
            (
                batch_df.withColumn("bucket", _bucket_of(key_cols, n_buckets))
                .write.mode("overwrite").partitionBy("bucket")
                .parquet(os.path.join(
                    table_dir, _LOG_DIR, f"logbatch={int(batch_id)}"
                ))
            )
            unfolded = sorted(
                {int(i) for i in manifest.get("log_batches", [])}
                | {int(batch_id)}
            )
            _commit_manifest(table_dir, manifest, {}, [], unfolded)
            if compact_every and len(unfolded) >= int(compact_every):
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
        updates: dict[str, str] = {}
        retired: list[str] = []
        for b in touched:
            ch = changes.where(F.col("bucket") == b).drop("bucket")
            rel, ret = _write_bucket_version(
                spark, table_dir, b, manifest, ch, key_cols, op_col,
                seq_col, files_per_bucket,
            )
            updates[str(b)] = rel
            retired.extend(ret)
        _commit_manifest(table_dir, manifest, updates, retired,
                         manifest.get("log_batches", []))

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
