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


QUERIES = {
    "ivf_knn_full_probe": (_q_ivf_full, _sql_ivf_full()),
    "ivf_knn_probe": (_q_ivf_probe, None),
}
