"""Stateful streaming sessionizer (streaming/sessionize.py): the
GroupState fold must equal the batch lag+cumsum twin — including when
state carries across micro-batches (maxFilesPerTrigger=1)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neurondb_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)


@pytest.fixture(scope="module")
def events_dirs(spark):
    """Three time-ordered parquet files: sessions span file boundaries."""
    base = pd.Timestamp("2024-03-01 00:00:00")
    rows = []
    eid = 0
    for part in range(3):
        for u in (1, 2):
            for j in range(4):
                # 10-min steps inside a part; 2h jump between parts for u=1
                # (new session), 5-min bridge for u=2 (session continues)
                off = part * (120 if u == 1 else 35) + j * 10
                rows.append((u, eid, base + pd.Timedelta(minutes=off)))
                eid += 1
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts"])
    td = tempfile.mkdtemp(prefix="neurondb_sess_t_")
    for part in range(3):
        chunk = pdf[(pdf.event_id >= part * 8) & (pdf.event_id < (part + 1) * 8)]
        spark.createDataFrame(chunk).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(td, f"p{part}")
        )
    # one flat dir with the three files for the stream source
    flat = os.path.join(td, "flat")
    spark.read.parquet(*[os.path.join(td, f"p{i}") for i in range(3)]) \
        .repartition(3, "event_id").write.mode("overwrite").parquet(flat)
    return td, flat, pdf


def _run_stream(spark, src, files_per_trigger=None):
    sdf = spark.readStream.schema("user_id long, event_id long, ts timestamp")
    if files_per_trigger:
        sdf = sdf.option("maxFilesPerTrigger", files_per_trigger)
    sdf = sdf.parquet(src)
    name = f"sess_t_{files_per_trigger or 0}"
    q = (
        sessionize_stream(sdf, gap_s=1800.0).writeStream.format("memory")
        .queryName(name).outputMode("update").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    return (
        spark.table(name).groupBy("user_id")
        .agg(F.max("n_sessions").alias("n_sessions"),
             F.max("max_session_events").alias("max_session_events"))
    )


def test_single_batch_equals_batch_twin(spark, events_dirs):
    td, flat, pdf = events_dirs
    got = {r["user_id"]: (r["n_sessions"], r["max_session_events"])
           for r in _run_stream(spark, flat).collect()}
    want = {r["user_id"]: (r["n_sessions"], r["max_session_events"])
            for r in sessionize_batch(spark.createDataFrame(pdf)).collect()}
    assert got == want


def test_gap_semantics(spark, events_dirs):
    td, flat, pdf = events_dirs
    want = {r["user_id"]: (r["n_sessions"], r["max_session_events"])
            for r in sessionize_batch(spark.createDataFrame(pdf)).collect()}
    # u=1: three 4-event sessions (2h gaps); u=2: one 12-event session
    assert want[1] == (3, 4)
    assert want[2] == (1, 12)


def test_state_across_microbatches(spark, events_dirs):
    """maxFilesPerTrigger=1 over time-split files: sessions that span
    file boundaries must survive in GroupState between micro-batches."""
    import glob
    import shutil
    import time as _time

    td, flat, pdf = events_dirs
    ordered = os.path.join(td, "ordered")
    os.makedirs(ordered, exist_ok=True)
    for part in range(3):  # one data file per part, mtimes ascending
        src = glob.glob(os.path.join(td, f"p{part}", "part-*.parquet"))[0]
        shutil.copy(src, os.path.join(ordered, f"chunk{part}.parquet"))
        _time.sleep(1.1)
    got = {r["user_id"]: (r["n_sessions"], r["max_session_events"])
           for r in _run_stream(spark, ordered, files_per_trigger=1).collect()}
    want = {r["user_id"]: (r["n_sessions"], r["max_session_events"])
            for r in sessionize_batch(spark.createDataFrame(pdf)).collect()}
    assert got == want


def test_stream_pack_carries_offset_across_batches(spark):
    """The per-shard next-offset state must carry across micro-batches
    AND drain restarts: two successive AvailableNow drains over the same
    checkpoint (second drain sees only newly-landed files) emit, in
    union, exactly the batch pack_sequences layout of the full corpus."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from neurondb_spark.operators.corpus import pack_sequences
    from neurondb_spark.streaming.packing import pack_stream

    td = tempfile.mkdtemp(prefix="pack_stream_")
    src = os.path.join(td, "src")
    ckpt = os.path.join(td, "ckpt")
    os.makedirs(src)
    L = 64
    docs = spark.createDataFrame(
        [(f"s{d % 3}", d, 10 + (d * 7) % 90) for d in range(200)],
        "shard string, id long, n long",
    )

    def drain(_qname):
        rows = []
        sdf = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            pack_stream(sdf, L).writeStream
            .foreachBatch(lambda bdf, _bid: rows.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return rows

    # first half lands, first drain; second half lands, second drain —
    # ids are increasing across the two waves per shard
    docs.where(F.col("id") < 100).orderBy("id").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = drain("pack_t1")
    docs.where(F.col("id") >= 100).orderBy("id").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got += drain("pack_t2")

    want = pack_sequences(docs, F.col("n"), "shard", "id", L).collect()
    cols = ("shard", "bin_id", "id", "doc_offset", "bin_offset",
            "take_tokens")
    assert sorted(tuple(r) for r in got) == sorted(
        tuple(r[f] for f in cols) for r in want
    )


def test_stream_pack_sorts_across_arrow_chunks(spark):
    """r11 ADVICE (medium): the stateful fold must sort the WHOLE
    micro-batch group, not each Arrow chunk independently. Force
    multi-chunk groups (tiny arrow.maxRecordsPerBatch) and land the
    shard's rows across several files in DESCENDING id order so the
    shuffle-read chunk order cannot accidentally be id order — the
    emitted layout must still equal batch pack_sequences."""
    import os
    import tempfile

    from neurondb_spark.operators.corpus import pack_sequences
    from neurondb_spark.streaming.packing import pack_stream

    td = tempfile.mkdtemp(prefix="pack_chunks_")
    src = os.path.join(td, "src")
    ckpt = os.path.join(td, "ckpt")
    os.makedirs(src)
    L = 50
    docs = spark.createDataFrame(
        [("s0", d, 5 + (d * 13) % 40) for d in range(120)],
        "shard string, id long, n long",
    )
    # Three files, each a descending-id slice, all in ONE micro-batch.
    for i, (lo, hi) in enumerate([(80, 120), (40, 80), (0, 40)]):
        (docs.where((F.col("id") >= lo) & (F.col("id") < hi))
         .orderBy(F.col("id").desc()).coalesce(1)
         .write.mode("append").parquet(src))

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        rows = []
        sdf = spark.readStream.schema(docs.schema).parquet(src)
        q = (
            pack_stream(sdf, L).writeStream
            .foreachBatch(lambda bdf, _bid: rows.extend(bdf.collect()))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )

    want = pack_sequences(docs, F.col("n"), "shard", "id", L).collect()
    cols = ("shard", "bin_id", "id", "doc_offset", "bin_offset",
            "take_tokens")
    assert sorted(tuple(r) for r in rows) == sorted(
        tuple(r[f] for f in cols) for r in want
    )
