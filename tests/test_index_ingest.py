"""Streaming CDC ingestion into indexes: exactly-once journaling,
crash-undo of partial appends, order-independence, and cross-layout
(IVF / LSH / HNSW) agreement with brute force."""

import glob
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from neurondb_spark.functions.distance import l2_distance  # noqa: E402
from neurondb_spark.operators.knn import _query_lit  # noqa: E402
from neurondb_spark.index import IVFIndex, LSHIndex  # noqa: E402
from neurondb_spark.index.hnsw import HNSWIndex  # noqa: E402
from neurondb_spark.streaming.index_ingest import (  # noqa: E402
    apply_cdc_batch,
    index_cdc_batch,
    index_cdc_drain,
)
from tests.conftest import SF_DIR  # noqa: E402

DIM = 64


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _query(spark):
    row = _emb(spark).where(F.col("vec_id") == 5).select("embedding").head()
    return [float(x) for x in row[0]]


def _ops_schema(emb):
    emb_type = dict((f.name, f.dataType) for f in emb.schema.fields)["embedding"]
    return T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", emb_type),
        T.StructField("op", T.StringType()),
    ])


def _write_ops(emb, src, dead_mod=37):
    """Odd half as inserts + every vec_id % dead_mod == 0 as deletes,
    shuffled across 3 files so micro-batch order varies."""
    emb_type = dict((f.name, f.dataType) for f in emb.schema.fields)["embedding"]
    ins = emb.where(F.col("vec_id") % 2 == 1).withColumn("op", F.lit("i"))
    dels = (
        emb.where(F.col("vec_id") % dead_mod == 0)
        .select(
            "vec_id",
            F.lit(None).cast(emb_type).alias("embedding"),
            F.lit("d").alias("op"),
        )
    )
    ins.select("vec_id", "embedding", "op").unionByName(dels).repartition(
        3
    ).write.mode("overwrite").parquet(src)


def _brute_ids(spark, emb, q, dead_mod=37, k=10):
    live = emb.where(F.col("vec_id") % dead_mod != 0)
    return [
        r["vec_id"]
        for r in live.select(
            "vec_id", l2_distance("embedding", _query_lit(q)).alias("d")
        )
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(k)
        .collect()
    ]


@pytest.fixture()
def cdc_env(spark):
    emb = _emb(spark)
    td = tempfile.mkdtemp(prefix="cdc_ingest_")
    src = os.path.join(td, "ops")
    _write_ops(emb, src)
    yield spark, emb, td, src
    shutil.rmtree(td, ignore_errors=True)


def test_ivf_cdc_drain_exact_and_exactly_once(cdc_env):
    spark, emb, td, src = cdc_env
    idx = IVFIndex.build(
        emb.where(F.col("vec_id") % 2 == 0), "embedding",
        os.path.join(td, "ivf"), nlists=4, metric="l2", dim=DIM,
    )
    index_cdc_drain(
        spark, src, _ops_schema(emb), idx, os.path.join(td, "work")
    )
    q = _query(spark)
    got = [
        r["vec_id"]
        for r in idx.search(spark, q, k=10, nprobe=4, tiebreak=["vec_id"]).collect()
    ]
    assert got == _brute_ids(spark, emb, q)
    total_after = idx.meta["total_rows"]

    # replay the WHOLE source with a fresh checkpoint: markers must
    # short-circuit every batch — no duplicate appends, same top-k
    index_cdc_drain(
        spark, src, _ops_schema(emb), idx, os.path.join(td, "work2")
    )
    idx2 = IVFIndex.load(idx.path)
    assert idx2.meta["total_rows"] == total_after
    got2 = [
        r["vec_id"]
        for r in idx2.search(spark, q, k=10, nprobe=4, tiebreak=["vec_id"]).collect()
    ]
    assert got2 == got
    markers = glob.glob(os.path.join(idx.path, "ingest_journal", "batch_*.json"))
    assert markers and not any(m.endswith(".intent.json") for m in markers)


def test_crash_undo_restores_pre_batch_state(cdc_env):
    spark, emb, td, src = cdc_env
    idx = LSHIndex.build(
        emb.where(F.col("vec_id") % 2 == 0), "embedding",
        os.path.join(td, "lsh"), dim=DIM, nbits=4, metric="l2",
    )
    ops = spark.read.schema(_ops_schema(emb)).parquet(src)

    # simulate a crash mid-apply: intent written, a partial append
    # landed, but no committed marker
    jdir = os.path.join(idx.path, "ingest_journal")
    os.makedirs(jdir, exist_ok=True)
    pre_listing = sorted(
        os.path.relpath(os.path.join(b, f), os.path.join(idx.path, "data"))
        for b, _d, fs in os.walk(os.path.join(idx.path, "data"))
        for f in fs
    )
    with open(os.path.join(jdir, "batch_0.intent.json"), "w") as fh:
        json.dump({"batch_id": 0, "data_files": pre_listing}, fh)
    # the "partial append": insert a stray subset directly
    idx.insert(ops.where((F.col("op") == "i") & (F.col("vec_id") < 50)).drop("op"))

    # replaying batch 0 must first undo the stray rows, then apply fully
    apply_cdc_batch(idx, ops, 0)
    q = _query(spark)
    got = [
        r["vec_id"]
        for r in idx.search(spark, q, k=10, probe_hamming=4, tiebreak=["vec_id"]).collect()
    ]
    assert got == _brute_ids(spark, emb, q)
    assert os.path.exists(os.path.join(jdir, "batch_0.json"))
    assert not os.path.exists(os.path.join(jdir, "batch_0.intent.json"))


def test_hnsw_cdc_batch_upsert_idempotent(cdc_env):
    spark, emb, td, src = cdc_env
    idx = HNSWIndex.build(
        emb.where(F.col("vec_id") % 2 == 0), "embedding", "vec_id",
        os.path.join(td, "hnsw"), metric="l2", dim=DIM,
        m=8, ef_construction=32, num_shards=2, seed=7,
    )
    schema = _ops_schema(emb)
    index_cdc_batch(spark, src, schema, idx, append_only=False)
    q = _query(spark)
    n = emb.count()
    want = _brute_ids(spark, emb, q, k=5)
    got = [
        r["vec_id"]
        for r in idx.search(spark, q, k=5, ef_search=int(n)).collect()
    ]
    assert got == want

    # journal removed → the apply re-runs; HNSW upsert must not
    # duplicate the re-inserted ids
    shutil.rmtree(os.path.join(idx.path, "ingest_journal"))
    index_cdc_batch(spark, src, schema, idx, append_only=False)
    got2 = [
        r["vec_id"]
        for r in idx.search(spark, q, k=5, ef_search=int(n)).collect()
    ]
    assert got2 == want


def test_cdc_rejects_unknown_ops(cdc_env):
    spark, emb, td, src = cdc_env
    idx = IVFIndex.build(
        emb.where(F.col("vec_id") % 2 == 0), "embedding",
        os.path.join(td, "ivf_bad"), nlists=4, metric="l2", dim=DIM,
    )
    bad = spark.read.schema(_ops_schema(emb)).parquet(src).withColumn(
        "op", F.when(F.col("vec_id") == 1, F.lit("x")).otherwise(F.col("op"))
    )
    with pytest.raises(ValueError, match="unknown ops"):
        apply_cdc_batch(idx, bad, 0)


def _pq_files(root):
    return [
        os.path.join(b, f)
        for b, _d, fs in os.walk(root)
        for f in fs
        if f.endswith(".parquet") or f.startswith("part-")
    ]


def test_compact_after_cdc_shrinks_files_preserves_topk(cdc_env):
    """CDC appends leave one file per batch per touched list; compact
    merges to one file per list without changing search results or
    tombstone visibility."""
    spark, emb, td, src = cdc_env
    idx = IVFIndex.build(
        emb.where(F.col("vec_id") % 2 == 0), "embedding",
        os.path.join(td, "ivf_c"), nlists=4, metric="l2", dim=DIM,
    )
    index_cdc_drain(
        spark, src, _ops_schema(emb), idx, os.path.join(td, "work_c")
    )
    q = _query(spark)
    before = [
        r["vec_id"]
        for r in idx.search(spark, q, k=10, nprobe=4, tiebreak=["vec_id"]).collect()
    ]
    data = os.path.join(idx.path, "data")
    n_before = len(_pq_files(data))
    idx.compact(spark)
    n_after = len(_pq_files(data))
    assert n_after < n_before
    # one data file per cluster dir after compaction
    for d in os.listdir(data):
        if d.startswith("cluster_id="):
            fs = _pq_files(os.path.join(data, d))
            assert len(fs) == 1
    after = [
        r["vec_id"]
        for r in idx.search(spark, q, k=10, nprobe=4, tiebreak=["vec_id"]).collect()
    ]
    assert after == before == _brute_ids(spark, emb, q)
