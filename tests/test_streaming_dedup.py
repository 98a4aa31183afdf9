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
