"""Exact fixed-iteration t-SNE gradient loop (ml/tsne_exact.py) — the
gate proves bit-parity vs DuckDB; these tests prove the SEMANTICS are
right (the gradient moves the layout, close high-d pairs attract
relative to far ones, parity at test SF).

Reference analog: NeuronDB/src/ml/ml_dimensionality_reduction.c:60
reduce_tsne with rational affinities in place of the
perplexity-calibrated Gaussian (module docstring).
"""

from __future__ import annotations

import pytest

from neurondb_spark.ml.tsne_exact import sql_tsne_fixed_grad, tsne_fixed_grad

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_tsne_gradient_moves_layout(spark, emb):
    """iters=1 vs iters=0-equivalent init: every returned row must have
    moved off its init (first two input dims) — the KL gradient is
    non-degenerate on real data."""
    import pyspark.sql.functions as F

    out = tsne_fixed_grad(emb, "embedding", "vec_id", iters=1)
    init = emb.select(
        "vec_id",
        F.element_at(F.col("embedding").cast("array<double>"), 1)
        .alias("i1"),
        F.element_at(F.col("embedding").cast("array<double>"), 2)
        .alias("i2"),
    )
    j = out.join(init, "vec_id")
    moved = j.where(
        (F.col("y1") != F.col("i1")) | (F.col("y2") != F.col("i2"))
    ).count()
    total = j.count()
    assert total > 10
    assert moved == total


def test_tsne_subsample_is_md5_stable(spark, emb):
    """Same ids selected on every run — the subsample is a pure
    function of the id, not of partitioning or order."""
    ids1 = {r["vec_id"] for r in
            tsne_fixed_grad(emb, "embedding", "vec_id", iters=1)
            .select("vec_id").collect()}
    ids2 = {r["vec_id"] for r in
            tsne_fixed_grad(
                emb.repartition(7), "embedding", "vec_id", iters=1)
            .select("vec_id").collect()}
    assert ids1 == ids2 and len(ids1) > 10


def test_tsne_oracle_parity(spark, duck):
    """Bit-exact vs the identically-unrolled DuckDB CTE chain at the
    conftest SF (the driver re-proves this at sf0.01)."""
    from tests.conftest import SF_DIR, compare_frames

    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = tsne_fixed_grad(df, "embedding", "vec_id")
    rel = duck.sql(sql_tsne_fixed_grad())
    compare_frames(out, rel)
