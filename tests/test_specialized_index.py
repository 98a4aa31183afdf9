"""Specialized index variants (SURVEY §2.11, neurondb--1.0.sql:4178-4308):
tenant / temporal / consistent / hybrid / rerank-cache builds, pruning
in the physical plan, quota + snapshot + cache contracts."""

import datetime
import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.index import IVFIndex  # noqa: E402
from neurondb_spark.index.specialized import (  # noqa: E402
    ConsistentIndex,
    HybridIndex,
    RerankIndex,
    TemporalIndex,
    TenantIndex,
    temporal_score,
)
from neurondb_spark.operators.knn import knn  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402

DIM = 64


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _query(spark):
    row = _emb(spark).where(F.col("vec_id") == 5).select("embedding").head()
    return [float(x) for x in row[0]]


# --------------------------------------------------------------- tenant


def test_tenant_search_matches_filtered_knn(spark):
    emb = _emb(spark)
    q = _query(spark)
    with tempfile.TemporaryDirectory() as d:
        idx = TenantIndex.build(emb, "embedding", "label", d, dim=DIM)
        got = idx.search(spark, 3, q, k=5, tiebreak=["vec_id"]).select(
            "vec_id", "distance"
        ).collect()
        want = knn(
            emb.where(F.col("label") == 3), "embedding", q, k=5,
            dim=DIM, tiebreak=["vec_id"],
        ).select("vec_id", "distance").collect()
        assert [(r[0], r[1]) for r in got] == [(r[0], r[1]) for r in want]


def test_tenant_search_prunes_partitions(spark):
    emb = _emb(spark)
    q = _query(spark)
    with tempfile.TemporaryDirectory() as d:
        idx = TenantIndex.build(emb, "embedding", "label", d, dim=DIM)
        plan = idx.search(spark, 3, q, k=5)._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(label" in plan or "label#" in plan
        # the scan must not read every tenant: pruned input size == 1 tenant
        pruned = spark.read.parquet(os.path.join(d, "data")).where(
            F.col("label") == 3
        )
        n_label3 = emb.where(F.col("label") == 3).count()
        assert pruned.count() == n_label3


def test_tenant_quota_enforced_and_reported(spark):
    emb = _emb(spark)
    with tempfile.TemporaryDirectory() as d:
        with pytest.raises(ValueError, match="quota"):
            TenantIndex.build(emb, "embedding", "label", d, quota_rows=3)
    with tempfile.TemporaryDirectory() as d:
        idx = TenantIndex.build(emb, "embedding", "label", d, quota_rows=10_000)
        info = idx.quota(spark, 3)
        assert info["vectors_used"] == emb.where(F.col("label") == 3).count()
        assert info["vectors_limit"] == 10_000
        assert info["storage_mb"] > 0


# -------------------------------------------------------------- temporal


def _emb_ts(spark):
    """Deterministic synthetic insert_ts: epoch + vec_id days."""
    return _emb(spark).withColumn(
        "insert_ts", F.timestamp_micros((F.col("vec_id") * 86_400_000_000))
    )


def test_temporal_search_respects_time_filter(spark):
    df = _emb_ts(spark)
    q = _query(spark)
    with tempfile.TemporaryDirectory() as d:
        idx = TemporalIndex.build(df, "embedding", "insert_ts", d, dim=DIM)
        hi = datetime.datetime(1970, 1, 11)  # vec_id <= 10
        got = idx.search(spark, q, k=100, hi=hi, now=hi, tiebreak=["vec_id"])
        ids = [r["vec_id"] for r in got.collect()]
        assert ids and max(ids) <= 10


def test_temporal_search_prunes_partitions(spark):
    """The time filter must reach the _bucket PARTITION column, not just
    the row-level ts column — PartitionFilters is the index's scale
    contract (only the buckets in [lo, hi] are scanned)."""
    df = _emb_ts(spark)
    q = _query(spark)
    with tempfile.TemporaryDirectory() as d:
        idx = TemporalIndex.build(df, "embedding", "insert_ts", d, dim=DIM)
        lo, hi = datetime.datetime(1970, 1, 5), datetime.datetime(1970, 1, 11)
        res = idx.search(spark, q, k=100, lo=lo, hi=hi, now=hi,
                         tiebreak=["vec_id"])
        plan = res._jdf.queryExecution().executedPlan().toString()
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "_bucket" in pf[0] and ">=" in pf[0] and "<=" in pf[0]
        ids = [r["vec_id"] for r in res.collect()]
        assert ids and 4 <= min(ids) and max(ids) <= 10


def test_temporal_decay_reorders(spark):
    """With decay, an older slightly-closer vector can rank below a newer
    one; score must equal base*exp(-rate*age_days) exactly."""
    import math

    df = _emb_ts(spark)
    q = _query(spark)
    with tempfile.TemporaryDirectory() as d:
        idx = TemporalIndex.build(df, "embedding", "insert_ts", d, dim=DIM)
        now = datetime.datetime(1970, 3, 1)
        rows = idx.search(
            spark, q, k=5, decay_rate=0.1, now=now, tiebreak=["vec_id"]
        ).select("vec_id", "insert_ts", "score").collect()
        assert len(rows) == 5
        base = {
            r["vec_id"]: -r["distance"]
            for r in knn(df, "embedding", q, k=10_000, dim=DIM).select(
                "vec_id", "distance").collect()
        }
        for r in rows:
            age_days = (now - r["insert_ts"]).total_seconds() / 86400.0
            want = base[r["vec_id"]] * math.exp(-0.1 * age_days)
            assert abs(r["score"] - want) < 1e-9


# ------------------------------------------------------------ consistent


def test_consistent_snapshot_pinning(spark):
    emb = _emb(spark).where(F.col("vec_id") <= 400)
    extra = _emb(spark).where(F.col("vec_id") > 400)
    q = _query(spark)
    with tempfile.TemporaryDirectory() as d:
        idx = ConsistentIndex.build(emb, "embedding", "vec_id", d, dim=DIM)
        before = idx.search(spark, q, k=5).select("vec_id").collect()
        idx.append(extra)  # commits v2; this handle stays pinned at v1
        eventual = idx.search(spark, q, k=5, consistency_level="eventual")
        strong = idx.search(spark, q, k=5, consistency_level="strong")
        assert [r[0] for r in eventual.collect()] == [r[0] for r in before]
        assert strong.count() == 5
        # strong sees all rows; the pinned snapshot must not
        n_all = ConsistentIndex.load(d)  # fresh handle pins v2
        assert n_all.pinned == 2
    with pytest.raises(ValueError, match="consistency"):
        idx.search(spark, q, k=5, consistency_level="linearizable")


# ---------------------------------------------------------------- hybrid


def test_hybrid_index_matches_operator_ranking(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(
        F.col("doc_id") <= 300
    )
    from neurondb_spark.functions.embed import hash_embed_expr

    base = docs.withColumn("emb", hash_embed_expr("text", 8))
    qv = [0.5] * 8
    with tempfile.TemporaryDirectory() as d:
        idx = HybridIndex.build(base, "emb", "text", "doc_id", d, dim=8)
        got = idx.search(spark, qv, "hash join table", k=5, alpha=0.5)
        rows = got.collect()
        assert len(rows) == 5
        # text term must contribute: a doc containing the query terms
        # outranks pure-vector order when alpha < 1
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------- rerank


def test_rerank_cache_warm_then_hit(spark):
    emb = _emb(spark)
    q = _query(spark)
    with tempfile.TemporaryDirectory() as d:
        base = IVFIndex.build(emb, "embedding", os.path.join(d, "ivf"),
                              nlists=8, dim=DIM)
        rr = RerankIndex.create(base, os.path.join(d, "rr"), id_col="vec_id")
        # cold: no cache -> cached_score all NULL
        cold = rr.get_candidates(spark, q, k=5, fetch_factor=4).collect()
        assert all(r["cached_score"] is None for r in cold)
        rr.warm(spark, [q], top_k=20)
        warm = rr.get_candidates(spark, q, k=5, fetch_factor=4).collect()
        hits = [r for r in warm if r["cached_score"] is not None]
        assert hits, "warmed query must hit the cache"
        for r in hits:
            assert abs(r["cached_score"] - (-r["distance"])) < 1e-12
