"""§2.2 masked/affine ops, percentile/quantile, sparse metrics, f1_at_k —
closed-form expectation tests (reference semantics:
vector_advanced.c:78-493, vector_ops.c:32-154, vector_sparse.c:45-230,
ml_recall_metrics.c:192-254)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).head()["v"]


def test_masked_affine_ops(spark):
    from neurondb_spark.functions.vector import (
        vector_filter,
        vector_scale,
        vector_set,
        vector_translate,
        vector_where,
    )

    v = F.array(*[F.lit(x) for x in (1.0, -2.0, 0.0, 4.0)])
    m = F.array(*[F.lit(b) for b in (True, False, False, True)])
    assert _one(spark, vector_scale(v, F.array(*[F.lit(x) for x in (2.0, 3.0, 4.0, 5.0)]))) == [2.0, -6.0, 0.0, 20.0]
    assert _one(spark, vector_translate(v, v)) == [2.0, -4.0, 0.0, 8.0]
    assert _one(spark, vector_filter(v, m)) == [1.0, 4.0]
    # where: cond != 0 ? value : else
    assert _one(spark, vector_where(v, F.array(*[F.lit(x) for x in (9.0, 9.0, 9.0, 9.0)]), 0.5)) == [9.0, 9.0, 0.5, 9.0]
    assert _one(spark, vector_set(v, 3, 7.5)) == [1.0, -2.0, 7.5, 4.0]


def test_masked_ops_error_contracts(spark):
    from neurondb_spark.functions.vector import vector_filter, vector_set

    v = F.array(F.lit(1.0), F.lit(2.0))
    all_false = F.array(F.lit(False), F.lit(False))
    with pytest.raises(Exception, match="at least one true"):
        _one(spark, vector_filter(v, all_false))
    with pytest.raises(Exception, match="out of bounds"):
        _one(spark, vector_set(v, 5, 0.0))


def test_percentile_quantile_nearest_rank_floor(spark):
    from neurondb_spark.functions.vector import vector_percentile, vector_quantile

    # sorted: [1,2,3,4,5]; idx = int(p*(5-1)) → p=0.5 → idx 2 → 3.0 (no interp)
    v = F.array(*[F.lit(x) for x in (5.0, 1.0, 4.0, 2.0, 3.0)])
    assert _one(spark, vector_percentile(v, 0.5)) == 3.0
    assert _one(spark, vector_percentile(v, 0.0)) == 1.0
    assert _one(spark, vector_percentile(v, 1.0)) == 5.0
    # p=0.3 → int(1.2) = 1 → sorted[1] = 2.0 (floor, not round)
    assert _one(spark, vector_percentile(v, 0.3)) == 2.0
    assert _one(spark, vector_quantile(v, [0.0, 0.5, 1.0])) == [1.0, 3.0, 5.0]
    with pytest.raises(ValueError):
        vector_percentile(v, 1.5)


def test_sparse_metrics_closed_form(spark):
    from neurondb_spark.functions.sparse import (
        sparse_cosine_similarity,
        sparse_inner_product,
        sparse_l2_distance,
        sparse_l2_norm,
        sparse_l2_normalize,
        sparse_nnz,
        sparse_to_dense,
        sparsify,
    )

    # a = [3,0,4,0], b = [0,0,4,1] with threshold 0.5
    a = sparsify(F.array(*[F.lit(x) for x in (3.0, 0.0, 4.0, 0.0)]), 0.5)
    b = sparsify(F.array(*[F.lit(x) for x in (0.0, 0.0, 4.0, 1.0)]), 0.5)
    assert _one(spark, sparse_nnz(a)) == 2
    assert _one(spark, sparse_l2_norm(a)) == 5.0  # sqrt(9+16)
    assert _one(spark, sparse_inner_product(a, b)) == 16.0  # only idx 3 shared
    # l2: diffs over union {1,3,4}: 3², 0², 1² → sqrt(10)
    assert _one(spark, sparse_l2_distance(a, b)) == pytest.approx(math.sqrt(10.0))
    ip, na, nb = 16.0, 5.0, math.sqrt(17.0)
    assert _one(spark, sparse_cosine_similarity(a, b)) == pytest.approx(ip / (na * nb))
    normed = _one(spark, sparse_to_dense(sparse_l2_normalize(a)))
    assert normed == pytest.approx([0.6, 0.0, 0.8, 0.0])
    assert _one(spark, sparse_to_dense(a)) == [3.0, 0.0, 4.0, 0.0]


def test_sparse_zero_vector_raises(spark):
    from neurondb_spark.functions.sparse import sparse_cosine_similarity, sparsify

    z = sparsify(F.array(F.lit(0.0), F.lit(0.0)), 0.5)
    a = sparsify(F.array(F.lit(1.0), F.lit(0.0)), 0.5)
    with pytest.raises(Exception, match="zero sparse vector"):
        _one(spark, sparse_cosine_similarity(z, a))


def test_vecmap_aliases_and_l1(spark):
    from neurondb_spark.functions.sparse import (
        sparse_l1_distance,
        sparsify,
        vecmap_add_scalar,
        vecmap_inner_product,
        vecmap_l2_distance,
        vecmap_mul_scalar,
        vecmap_norm,
    )

    a = sparsify(F.array(*[F.lit(x) for x in (3.0, 0.0, 4.0, 0.0)]), 0.5)
    b = sparsify(F.array(*[F.lit(x) for x in (0.0, 0.0, 4.0, 1.0)]), 0.5)
    assert _one(spark, vecmap_norm(a)) == 5.0
    assert _one(spark, vecmap_inner_product(a, b)) == 16.0
    assert _one(spark, vecmap_l2_distance(a, b)) == pytest.approx(math.sqrt(10.0))
    # l1 over union {1,3,4}: |3-0| + |4-4| + |0-1| = 4
    assert _one(spark, sparse_l1_distance(a, b)) == 4.0
    # scalar ops act on STORED components only (map semantics)
    shifted = _one(spark, vecmap_add_scalar(a, 1.0))
    assert shifted["values"] == [4.0, 5.0] and shifted["indices"] == [1, 3]
    scaled = _one(spark, vecmap_mul_scalar(a, 2.0))
    assert scaled["values"] == [6.0, 8.0]


def test_js_divergence_histogram_identical_dists_zero(spark):
    from neurondb_spark.ml.stats import js_divergence_histogram

    df = spark.range(1000).select((F.col("id") % 100).cast("double").alias("x"))
    out = js_divergence_histogram(df, df, "x", 0.0, 100.0, 10).head()[0]
    assert out == 0.0
    # disjoint distributions → ln(2) (maximum JS divergence)
    lo = spark.range(500).select(F.lit(5.0).alias("x"))
    hi = spark.range(500).select(F.lit(95.0).alias("x"))
    out = js_divergence_histogram(lo, hi, "x", 0.0, 100.0, 10).head()[0]
    assert out == pytest.approx(math.log(2.0))


def test_f1_at_k_reference_semantics(spark):
    from neurondb_spark.operators.rerank import f1_at_k

    retrieved = F.array(*[F.lit(i) for i in (1, 2, 3, 4)])
    relevant = F.array(*[F.lit(i) for i in (2, 4, 9)])
    # k=4: found=2, P=0.5, R=2/3, F1 = 2*(0.5*2/3)/(0.5+2/3) = 4/7
    assert _one(spark, f1_at_k(retrieved, relevant, 4)) == pytest.approx(4.0 / 7.0)
    # disjoint → P+R < 1e-10 → 0.0 (reference guard)
    none = F.array(F.lit(7), F.lit(8))
    assert _one(spark, f1_at_k(none, relevant, 2)) == 0.0


def test_knn_large_dim_compiles_via_fold(spark):
    """dim > UNROLL_DIM_MAX must route to the constant-depth fold: the
    unrolled 384-term chain used to overflow the JVM analyzer stack
    (StackOverflowError in withColumn) — the default rag_query dim."""
    import random

    from neurondb_spark.operators.knn import knn

    rng = random.Random(0)
    rows = [(i, [rng.random() for _ in range(384)]) for i in range(20)]
    df = spark.createDataFrame(rows, "id int, v array<double>")
    out = knn(df, "v", rows[0][1], k=3, metric="l2", dim=384,
              tiebreak=["id"]).collect()
    assert out[0]["id"] == 0 and out[0]["distance"] == 0.0
