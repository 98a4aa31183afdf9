"""Index-layer queries: IVF probe search (SURVEY §2.5 IVF row, §2.11).

``ivf_knn_full_probe`` probes all lists → EXACT, oracle-checked against
brute force (proves the partitioned layout + pruning machinery loses
nothing). ``ivf_knn_probe`` uses nprobe=4/16 → approximate by design, so
no SQL oracle exists (driver records rows-only; recall is asserted in
tests/test_index.py instead)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark import oracle as O
from neurondb_spark.index.ivf import IVFIndex
from neurondb_spark.registry.common import COMPILE_DIM, EMB_DIM, QVEC_CTE, qvec, t

NLISTS = 16
_cache: dict[str, IVFIndex] = {}


def _index_for(spark: SparkSession, sf_dir: str) -> IVFIndex:
    key = sf_dir.rstrip("/")
    if key in _cache:
        return _cache[key]
    tag = key.replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"neurondb_ivf{tag}")
    if os.path.exists(os.path.join(path, "meta.json")):
        idx = IVFIndex.load(path)
    else:
        emb = t(spark, sf_dir, "embeddings")
        idx = IVFIndex.build(
            emb, "embedding", path, nlists=NLISTS, metric="l2", dim=COMPILE_DIM
        )
    _cache[key] = idx
    return idx


def _q_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index_for(spark, sf_dir)
    q = qvec(spark, sf_dir)
    return idx.search(spark, q, k=10, nprobe=NLISTS, tiebreak=["vec_id"]).select(
        "vec_id", "distance"
    )


def _sql_ivf_full() -> str:
    d = O.sql_l2("e.embedding", "q.qe", EMB_DIM)
    return f"""{QVEC_CTE}
SELECT e.vec_id, {d} AS distance
FROM embeddings e CROSS JOIN q
ORDER BY distance ASC, e.vec_id ASC LIMIT 10"""


def _q_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _index_for(spark, sf_dir)
    q = qvec(spark, sf_dir)
    return idx.search(spark, q, k=10, nprobe=4, tiebreak=["vec_id"]).select(
        "vec_id", "distance"
    )


_tenant_cache: dict[str, "object"] = {}


def _tenant_index_for(spark: SparkSession, sf_dir: str):
    from neurondb_spark.index.specialized import TenantIndex

    key = sf_dir.rstrip("/")
    if key in _tenant_cache:
        return _tenant_cache[key]
    tag = key.replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"neurondb_tenant{tag}")
    if os.path.exists(os.path.join(path, "meta.json")):
        idx = TenantIndex.load(path)
    else:
        emb = t(spark, sf_dir, "embeddings")
        idx = TenantIndex.build(emb, "embedding", "label", path, dim=COMPILE_DIM)
    _tenant_cache[key] = idx
    return idx


def _q_tenant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hnsw_tenant_search (index_hnsw_tenant.c): partition-pruned exact
    kNN inside tenant (=label) 3's files — the oracle proves the tenant
    layout loses no rows vs a filtered brute-force scan."""
    idx = _tenant_index_for(spark, sf_dir)
    q = qvec(spark, sf_dir)
    return idx.search(spark, 3, q, k=10, tiebreak=["vec_id"]).select(
        "vec_id", "distance"
    )


def _sql_tenant() -> str:
    d = O.sql_l2("e.embedding", "q.qe", EMB_DIM)
    return f"""{QVEC_CTE}
SELECT e.vec_id, {d} AS distance
FROM embeddings e CROSS JOIN q
WHERE e.label = 3
ORDER BY distance ASC, e.vec_id ASC LIMIT 10"""


_temporal_cache: dict[str, "object"] = {}
_DAY_US = 86_400_000_000


def _temporal_index_for(spark: SparkSession, sf_dir: str):
    from neurondb_spark.index.specialized import TemporalIndex

    key = sf_dir.rstrip("/")
    if key in _temporal_cache:
        return _temporal_cache[key]
    tag = key.replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"neurondb_temporal_m{tag}")
    if os.path.exists(os.path.join(path, "meta.json")):
        idx = TemporalIndex.load(path)
    else:
        emb = t(spark, sf_dir, "embeddings").withColumn(
            "insert_ts", F.timestamp_micros(F.col("vec_id") * F.lit(_DAY_US))
        )
        # month buckets: the synthetic ts is one row per day, so day
        # buckets would mean one file per row — bucket granularity must
        # track row density, here ~30 rows/partition
        idx = TemporalIndex.build(emb, "embedding", "insert_ts", path,
                                  bucket="month", dim=COMPILE_DIM)
    _temporal_cache[key] = idx
    return idx


def _q_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """temporal_knn_search (index_temporal.c:175-260): cutoff at day 100
    (synthetic insert_ts = epoch + vec_id days), score = -l2 decayed by
    exp(-0.1·age_days). Timestamps are tz-aware instants so the result is
    session-TZ-independent; exp() differs ≤1 ulp across engines → both
    sides round the score to 6 decimals (same rule as events_time_decay)."""
    import datetime as _dt

    idx = _temporal_index_for(spark, sf_dir)
    q = qvec(spark, sf_dir)
    now = _dt.datetime(1970, 4, 11, tzinfo=_dt.timezone.utc)  # day 100
    out = idx.search(spark, q, k=10, hi=now, decay_rate=0.1, now=now,
                     tiebreak=["vec_id"])
    # + 0.0 normalizes IEEE -0.0 (the self-match row) to +0.0 on both engines
    return out.select(
        "vec_id", (F.round(F.col("score"), 6) + F.lit(0.0)).alias("decayed_score")
    )


def _sql_temporal() -> str:
    d = O.sql_l2("e.embedding", "q.qe", EMB_DIM)
    # age_days mirrors the engine chain exactly: every step lands on exact
    # doubles ((now_us - ts_us) / day_us with ts multiples of day_us)
    age = (
        f"((100.0 * {float(_DAY_US)!r}) - (CAST(e.vec_id AS DOUBLE) * "
        f"{float(_DAY_US)!r})) / {float(_DAY_US)!r}"
    )
    return f"""{QVEC_CTE}
SELECT e.vec_id,
       (round((-({d})) * exp(-0.1 * ({age})), 6) + 0.0) AS decayed_score
FROM embeddings e CROSS JOIN q
WHERE e.vec_id <= 100
ORDER BY (-({d})) * exp(-0.1 * ({age})) DESC, e.vec_id ASC LIMIT 10"""


_hybrid_cache: dict[str, "object"] = {}


def _hybrid_index_for(spark: SparkSession, sf_dir: str):
    from neurondb_spark.index.specialized import HybridIndex

    key = sf_dir.rstrip("/")
    if key in _hybrid_cache:
        return _hybrid_cache[key]
    tag = key.replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"neurondb_hybrid{tag}")
    if os.path.exists(os.path.join(path, "meta.json")):
        idx = HybridIndex.load(path)
    else:
        docs = t(spark, sf_dir, "documents")
        emb = t(spark, sf_dir, "embeddings")
        df = docs.join(emb, docs.doc_id == emb.vec_id).select(
            "doc_id", "embedding", "text"
        )
        idx = HybridIndex.build(df, "embedding", "text", "doc_id", path,
                                dim=COMPILE_DIM)
    _hybrid_cache[key] = idx
    return idx


_HYBRID_QTEXT = "hash join merge sort"


def _q_hybrid_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hybrid_index_search (index_hybrid.c): prebuilt inverted postings +
    vector layout; score = 0.5·(1−l2) + 0.5·Σtf over matched query terms.
    The oracle recomputes the postings from raw text — proving the
    build-time inversion loses no term counts."""
    idx = _hybrid_index_for(spark, sf_dir)
    q = qvec(spark, sf_dir)
    return idx.search(spark, q, _HYBRID_QTEXT, k=12, alpha=0.5).select(
        "doc_id", "score"
    )


def _sql_hybrid_index() -> str:
    from neurondb_spark.functions.text import _py_tokenize, sql_tokenize

    d = O.sql_l2("e.embedding", "q.qe", EMB_DIM)
    qterms = ", ".join(f"'{t}'" for t in dict.fromkeys(_py_tokenize(_HYBRID_QTEXT)))
    tf = (
        f"CAST(length(list_filter({sql_tokenize('doc.text')}, "
        f"x -> x IN ({qterms}))) AS DOUBLE)"
    )
    return f"""{QVEC_CTE}
SELECT doc.doc_id, (0.5 * (1.0 - {d}) + 0.5 * {tf}) AS score
FROM documents doc JOIN embeddings e ON doc.doc_id = e.vec_id CROSS JOIN q
ORDER BY score DESC, doc.doc_id ASC LIMIT 12"""


QUERIES = {
    "ivf_knn_full_probe": (_q_ivf_full, _sql_ivf_full()),
    "ivf_knn_probe": (_q_ivf_probe, None),
    "tenant_knn_search": (_q_tenant, _sql_tenant()),
    "temporal_knn_decay": (_q_temporal, _sql_temporal()),
    "hybrid_index_search": (_q_hybrid_index, _sql_hybrid_index()),
}
