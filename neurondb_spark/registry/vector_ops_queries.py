"""Vector arithmetic / sparse-vector queries (SURVEY §2.1-2.2, sparsevec
rows of §2.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark import oracle as O
from neurondb_spark.functions.vector import (
    vec,
    vector_add,
    vector_clip,
    vector_hadamard,
    vector_mean,
    vector_normalize,
)
from neurondb_spark.registry.common import EMB_DIM, QVEC_CTE, qvec, t

SPARSE_T = 0.2  # sparsification threshold on |component|


def _q_vector_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = qvec(spark, sf_dir)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return emb.select(
        "vec_id",
        F.element_at(vector_add("embedding", qlit), 1).alias("add_e1"),
        F.element_at(vector_hadamard("embedding", qlit), 3).alias("had_e3"),
        vector_mean("embedding").alias("mean_val"),
        F.element_at(vector_clip("embedding", -0.1, 0.1), 5).alias("clip_e5"),
        F.element_at(vector_normalize("embedding"), 2).alias("norm_e2"),
    )


def _sql_vector_arith() -> str:
    e1, q1 = O.elem("e.embedding", 1), O.elem("q.qe", 1)
    e3, q3 = O.elem("e.embedding", 3), O.elem("q.qe", 3)
    e5 = O.elem("e.embedding", 5)
    e2 = O.elem("e.embedding", 2)
    mean_terms = " + ".join(f"({O.elem('e.embedding', i)})" for i in range(1, EMB_DIM + 1))
    return f"""{QVEC_CTE}
SELECT e.vec_id,
  ({e1}) + ({q1}) AS add_e1,
  ({e3}) * ({q3}) AS had_e3,
  ({mean_terms}) / {EMB_DIM} AS mean_val,
  least(greatest({e5}, -0.1), 0.1) AS clip_e5,
  ({e2}) / ({O.sql_norm('e.embedding', EMB_DIM)}) AS norm_e2
FROM embeddings e CROSS JOIN q"""


def _q_sparse_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparsevec surface: sparsify(v, t) → (nnz, indices) and the sparse
    dot product against the dense query (sparse_vector_dot_product / <*>
    semantics over the kept components)."""
    emb = t(spark, sf_dir, "embeddings")
    q = qvec(spark, sf_dir)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = vec("embedding")
    idx = F.filter(
        F.sequence(F.lit(1), F.size(v)),
        lambda i: F.abs(F.element_at(v, i)) >= SPARSE_T,
    )
    nnz = F.size(idx)
    dot = F.aggregate(
        F.transform(idx, lambda i: F.element_at(v, i) * F.element_at(qlit, i)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    first_idx = F.when(nnz > 0, F.element_at(idx, 1)).otherwise(F.lit(None))
    return emb.select(
        "vec_id",
        nnz.alias("nnz"),
        first_idx.cast("int").alias("first_idx"),
        dot.alias("sparse_dot"),
    )


def _sql_sparse_dot() -> str:
    v = "CAST(e.embedding[i] AS DOUBLE)"
    idx = f"list_filter(generate_series(1, len(e.embedding)), i -> abs({v}) >= {SPARSE_T!r})"
    return f"""{QVEC_CTE}
SELECT e.vec_id,
  CAST(len({idx}) AS INTEGER) AS nnz,
  CAST((CASE WHEN len({idx}) > 0 THEN {idx}[1] END) AS INTEGER) AS first_idx,
  list_reduce(
    list_prepend(CAST(0.0 AS DOUBLE),
      list_transform({idx}, i -> CAST(e.embedding[i] AS DOUBLE) * q.qe[i])),
    (a, b) -> a + b) AS sparse_dot
FROM embeddings e CROSS JOIN q"""


QUERIES = {
    "vector_arith_ops": (_q_vector_arith, _sql_vector_arith()),
    "sparse_vector_dot": (_q_sparse_dot, _sql_sparse_dot()),
}
