"""IVF index DML lifecycle: append-insert, tombstone delete, vacuum
(index/ivf.py; reference ivf_am.c aminsert + dead-tuple VACUUM)."""

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR  # noqa: E402

NLISTS = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def qv(emb):
    row = emb.where(F.col("vec_id") == 3).head()
    return [float(x) for x in row["embedding"]]


def _brute_ids(emb, qv, k, exclude=()):
    from neurondb_spark.functions.distance import l2_distance
    from neurondb_spark.operators.knn import _query_lit

    df = emb
    if exclude:
        df = df.where(~F.col("vec_id").isin(list(exclude)))
    rows = (
        df.select("vec_id", l2_distance("embedding", _query_lit(qv), checked=False).alias("d"))
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(k)
        .collect()
    )
    return [r["vec_id"] for r in rows]


@pytest.fixture(scope="module")
def dml_index(spark, emb):
    from neurondb_spark.index.ivf import IVFIndex

    path = os.path.join(tempfile.mkdtemp(prefix="ivf_dml_"), "idx")
    idx = IVFIndex.build(
        emb.where(F.col("vec_id") % 2 == 0), "embedding", path, nlists=NLISTS
    )
    idx.insert(emb.where(F.col("vec_id") % 2 == 1))
    return idx


def test_insert_appends_to_nearest_list(spark, emb, qv, dml_index):
    assert dml_index.meta["total_rows"] == emb.count()
    got = [
        r["vec_id"]
        for r in dml_index.search(
            spark, qv, k=10, nprobe=NLISTS, tiebreak=["vec_id"]
        ).collect()
    ]
    assert got == _brute_ids(emb, qv, 10)
    # inserted rows landed in their NEAREST list: probe-1 recall on an
    # inserted row's own vector must find that row first
    row = emb.where(F.col("vec_id") % 2 == 1).orderBy("vec_id").head()
    probe1 = dml_index.search(
        spark, [float(x) for x in row["embedding"]], k=1, nprobe=1,
        tiebreak=["vec_id"],
    ).head()
    assert probe1["vec_id"] == row["vec_id"]


def test_delete_and_vacuum(spark, emb, qv, dml_index):
    top = _brute_ids(emb, qv, 2)
    dml_index.delete(spark, top)
    got = [
        r["vec_id"]
        for r in dml_index.search(
            spark, qv, k=10, nprobe=NLISTS, tiebreak=["vec_id"]
        ).collect()
    ]
    assert got == _brute_ids(emb, qv, 10, exclude=top)

    n_before = dml_index.meta["total_rows"]
    dml_index.vacuum(spark)
    assert dml_index._tombstones(spark) is None
    assert dml_index.meta["total_rows"] == n_before - len(top)
    got2 = [
        r["vec_id"]
        for r in dml_index.search(
            spark, qv, k=10, nprobe=NLISTS, tiebreak=["vec_id"]
        ).collect()
    ]
    assert got2 == got
