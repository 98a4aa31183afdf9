"""Exact fixed-iteration mixture EM (ml/mixture.py) — the gate proves
bit-parity vs DuckDB; these tests prove the SEMANTICS are right (all
components survive, soft assignments respond to the M-step, parity
holds at test SF), so the exactness isn't vacuous.

Reference analog: NeuronDB/src/ml/ml_gmm.c:130 cluster_gmm (E-step
:262-273, M-step :293-328) with the transcendental Gaussian kernel
replaced by the hash-gateable rational kernel (module docstring).
"""

from __future__ import annotations

import pytest

from neurondb_spark.ml.mixture import mixture_em_exact, sql_mixture_em_exact

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_mixture_partitions_all_rows(spark, emb):
    out = mixture_em_exact(emb, "embedding", "vec_id", k=3, iters=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert len({r["vec_id"] for r in rows}) == len(rows)
    assert {r["cluster"] for r in rows} <= {0, 1, 2}


def test_mixture_em_moves_assignments(spark, emb):
    """The M-step must matter: 2-round EM differs from the 1-round
    (init-kernel) assignment for at least one row — otherwise the
    'training loop under the gate' claim is vacuous."""
    a1 = {
        r["vec_id"]: r["cluster"]
        for r in mixture_em_exact(
            emb, "embedding", "vec_id", k=3, iters=1).collect()
    }
    a2 = {
        r["vec_id"]: r["cluster"]
        for r in mixture_em_exact(
            emb, "embedding", "vec_id", k=3, iters=2).collect()
    }
    assert a1.keys() == a2.keys()
    assert any(a1[i] != a2[i] for i in a1)


def test_mixture_oracle_parity(spark, emb, duck):
    """Bit-exact vs the identically-unrolled DuckDB CTE chain at the
    conftest SF (the driver re-proves this at sf0.01)."""
    from tests.conftest import SF_DIR, compare_frames

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = mixture_em_exact(df, "embedding", "vec_id", k=3, iters=2)
    rel = duck.sql(sql_mixture_em_exact())
    compare_frames(out, rel)
