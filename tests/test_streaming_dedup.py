"""Streaming incremental exact-dedup must equal its batch twin exactly."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from neurondb_spark.streaming.dedup import dedup_batch, dedup_stream

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _corpus(spark):
    rows = [(i, f"doc body number {i % 7} stable") for i in range(40)]
    return spark.createDataFrame(rows, SCHEMA)  # 7 distinct texts, heavy dups


def test_stream_dedup_equals_batch(spark):
    src = os.path.join(tempfile.mkdtemp(prefix="neurondb_sdedup_t_"), "docs")
    # multiple files => multiple arrival orders for the state fold
    _corpus(spark).repartition(4).write.mode("overwrite").parquet(src)
    stream = dedup_stream(spark, src, SCHEMA, "text", "doc_id")
    q = (
        stream.writeStream.format("memory").queryName("sdedup_t")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    got = {
        r["fingerprint"]: (r["doc_id"], r["dup_count"])
        for r in spark.table("sdedup_t").collect()
    }
    want = {
        r["fingerprint"]: (r["doc_id"], r["dup_count"])
        for r in dedup_batch(
            spark.read.schema(SCHEMA).parquet(src), "text", "doc_id"
        ).collect()
    }
    assert got == want
    assert len(got) == 7  # the distinct texts
    # min-id winner and full dup counts survived the incremental fold
    assert sorted(v[0] for v in got.values()) == list(range(7))
    assert all(v[1] in (5, 6) for v in got.values())


def test_stream_dedup_batch_twin_matches_exact_dedup(spark):
    from neurondb_spark.operators.dedup import exact_dedup

    df = _corpus(spark)
    a = {(r["fingerprint"], r["doc_id"], r["dup_count"])
         for r in dedup_batch(df, "text", "doc_id").collect()}
    b = {(r["fingerprint"], r["doc_id"], r["dup_count"])
         for r in exact_dedup(df, "text", "doc_id", keep="min").collect()}
    assert a == b


def test_strict_stream_mode_raises_instead_of_batch_twin(spark, monkeypatch):
    """Gate integrity (round-6 verdict #1): under NEURONDB_STRICT_STREAM=1
    the streaming gate rows must RAISE on a streaming failure instead of
    silently computing the answer with the batch twin — a drain-side bug
    that surfaces as a StreamingQueryException must turn the sims red."""
    import pytest
    from pyspark.errors import StreamingQueryException

    import neurondb_spark.registry.misc_queries as mq
    from tests.conftest import SF_DIR

    def _boom(*a, **k):
        raise StreamingQueryException("boom")

    monkeypatch.setattr(
        "neurondb_spark.streaming.dedup.lsh_pairs_drain", _boom
    )
    # non-strict: the infra-only fallback computes via the batch twin
    monkeypatch.delenv("NEURONDB_STRICT_STREAM", raising=False)
    fn = mq.QUERIES["stream_lsh_neardup"][0]
    assert fn(spark, SF_DIR).head(1)  # batch twin answered
    # strict: the same failure must surface
    monkeypatch.setenv("NEURONDB_STRICT_STREAM", "1")
    with pytest.raises(StreamingQueryException):
        fn(spark, SF_DIR)


def test_lsh_drain_streaming_path_actually_executes(spark):
    """The drain must produce pairs_dir output via the STREAMING path —
    the gate green must come from foreachBatch, not a fallback."""
    from neurondb_spark.streaming.dedup import lsh_pairs_drain

    rows = [(i, f"shared near dup body {i % 3}") for i in range(12)]
    src = os.path.join(tempfile.mkdtemp(prefix="neurondb_sdrain_t_"), "docs")
    spark.createDataFrame(rows, SCHEMA).repartition(2).write.parquet(src)
    work = tempfile.mkdtemp(prefix="neurondb_sdrain_w_")
    out = lsh_pairs_drain(spark, src, SCHEMA, "text", "doc_id", work_dir=work)
    pairs_dir = os.path.join(work, "pairs")
    assert os.path.isdir(pairs_dir)
    batch_dirs = [d for d in os.listdir(pairs_dir) if d.startswith("batch_id=")]
    assert batch_dirs, "foreachBatch drain wrote no batch output"
    assert out.count() > 0


def test_lsh_drain_replay_survives_torn_batch_dir(spark):
    """r6 ADVICE: a crash mid-write leaves torn parquet under the batch's
    own batch_id= dir; the replay pre-deletes it so the membership read
    never sees the torn files."""
    from neurondb_spark.streaming.dedup import lsh_pairs_batch, lsh_pairs_drain

    rows = [(i, f"replay torn body {i % 4}") for i in range(16)]
    src = os.path.join(tempfile.mkdtemp(prefix="neurondb_storn_t_"), "docs")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    work = tempfile.mkdtemp(prefix="neurondb_storn_w_")
    # Simulate the torn previous attempt: garbage parquet in the dirs the
    # first micro-batch (batch_id=0) will claim, with NO checkpoint entry
    # (the crash happened before the commit log advanced).
    for sub in ("members", "pairs"):
        d = os.path.join(work, sub, "batch_id=0")
        os.makedirs(d)
        with open(os.path.join(d, "part-torn.snappy.parquet"), "wb") as f:
            f.write(b"\x00not a parquet file")
    out = lsh_pairs_drain(spark, src, SCHEMA, "text", "doc_id", work_dir=work)
    want = {(r["id_a"], r["id_b"]) for r in lsh_pairs_batch(
        spark.read.schema(SCHEMA).parquet(src), "text", "doc_id"
    ).collect()}
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == want
