"""Sparse vector type + metrics (SURVEY §2.1/§2.3 sparsevec & vecmap rows).

Reference: sparsevec/vecmap are `{dim, nnz, indices[], values[]}` payloads
(NeuronDB/src/vector/vector_types.c:735-800, src/vector/vector_sparse.c:45-230,
vecmap SQL surface neurondb--1.0.sql:613-649). Distances merge the two sorted
index lists (ascending) accumulating in double.

Spark representation: ``struct<dim:int, indices:array<int>, values:array<double>>``
(same logical content as MLlib SparseVector). Indices are 1-based, matching
the repo's dense element_at convention. All metrics are pure Column
expressions — the per-key lookup goes through ``map_from_arrays`` +
``try_element_at`` (absent key → 0.0), the union/intersection key walk is
ascending like the reference's merge loop, so a SQL oracle iterating the
same sorted key list left-associatively matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from neurondb_spark.functions.vector import vec


def sparsify(a, threshold: float) -> Column:
    """Dense → sparse struct keeping components with |x| ≥ threshold
    (the repo's standard dense↔sparse bridge; reference casts
    vector_to_sparsevec keep non-zeros, vector_cast.c:407-525)."""
    a = vec(a)
    t = F.lit(float(threshold))
    idx = F.filter(
        F.sequence(F.lit(1), F.size(a)), lambda i: F.abs(F.element_at(a, i)) >= t
    )
    return F.struct(
        F.size(a).alias("dim"),
        idx.cast("array<int>").alias("indices"),
        F.transform(idx, lambda i: F.element_at(a, i)).alias("values"),
    )


def sparse_nnz(s) -> Column:
    s = F.col(s) if isinstance(s, str) else s
    return F.size(s["indices"])


def _val(s, k) -> Column:
    """Value at key k, 0.0 when absent (the merge loop's implicit zero)."""
    m = F.map_from_arrays(s["indices"], s["values"])
    return F.coalesce(F.try_element_at(m, k), F.lit(0.0))


def _s(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def sparse_inner_product(a, b) -> Column:
    """sparsevec_inner_product / sparse_vector_dot_product `<*>`
    (vector_types.c:749, sparse_vector_types.c:246): Σ over shared keys,
    ascending-key accumulation."""
    a, b = _s(a), _s(b)
    keys = F.array_sort(F.array_intersect(a["indices"], b["indices"]))
    return F.aggregate(
        F.transform(keys, lambda k: _val(a, k) * _val(b, k)),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def sparse_squared_l2_distance(a, b) -> Column:
    a, b = _s(a), _s(b)
    keys = F.array_sort(F.array_union(a["indices"], b["indices"]))
    return F.aggregate(
        F.transform(keys, lambda k: (_val(a, k) - _val(b, k)) * (_val(a, k) - _val(b, k))),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def sparse_l2_distance(a, b) -> Column:
    """sparsevec_l2_distance (vector_types.c:735 → vecmap merge loop,
    vector_sparse.c:45-137): sqrt of squared diffs over the index union."""
    return F.sqrt(sparse_squared_l2_distance(a, b))


def sparse_l2_norm(s) -> Column:
    """sparsevec_l2_norm (vector_types.c:756-784)."""
    s = _s(s)
    return F.sqrt(
        F.aggregate(s["values"], F.lit(0.0), lambda acc, x: acc + x * x)
    )


def sparse_cosine_similarity(a, b) -> Column:
    """Cosine over sparse structs; zero-norm raises like the dense kernel
    (vecmap_cosine_distance, vector_sparse.c:184-230)."""
    a, b = _s(a), _s(b)
    na, nb = sparse_l2_norm(a), sparse_l2_norm(b)
    return F.when(
        (na == 0.0) | (nb == 0.0),
        F.raise_error("neurondb: cosine distance of zero sparse vector is undefined"),
    ).otherwise(sparse_inner_product(a, b) / (na * nb))


def sparse_cosine_distance(a, b) -> Column:
    return 1.0 - sparse_cosine_similarity(a, b)


def sparse_l2_normalize(s) -> Column:
    """sparsevec_l2_normalize (vector_types.c:786-840): values / ‖v‖,
    same struct back; zero norm raises."""
    s = _s(s)
    n = sparse_l2_norm(s)
    return F.when(
        n == 0.0, F.raise_error("neurondb: cannot normalize zero sparse vector")
    ).otherwise(
        F.struct(
            s["dim"].alias("dim"),
            s["indices"].alias("indices"),
            F.transform(s["values"], lambda x: x / n).alias("values"),
        )
    )


def sparse_to_dense(s) -> Column:
    """sparsevec_to_vector (vector_cast.c:407-525): expand to array<double>."""
    s = _s(s)
    m = F.map_from_arrays(s["indices"], s["values"])
    return F.transform(
        F.sequence(F.lit(1), s["dim"]),
        lambda i: F.coalesce(F.try_element_at(m, i.cast("int")), F.lit(0.0)),
    )


def vecmap_add_scalar(s, x) -> Column:
    """vecmap_add_scalar (neurondb--1.0.sql:613-649): add x to the STORED
    components (zeros stay zero — map semantics, not dense semantics)."""
    s, x = _s(s), F.lit(float(x)) if not isinstance(x, Column) else x
    return F.struct(
        s["dim"].alias("dim"),
        s["indices"].alias("indices"),
        F.transform(s["values"], lambda v: v + x.cast("double")).alias("values"),
    )


def vecmap_mul_scalar(s, x) -> Column:
    """vecmap_mul_scalar: scale the stored components."""
    s, x = _s(s), F.lit(float(x)) if not isinstance(x, Column) else x
    return F.struct(
        s["dim"].alias("dim"),
        s["indices"].alias("indices"),
        F.transform(s["values"], lambda v: v * x.cast("double")).alias("values"),
    )


def sparse_l1_distance(a, b) -> Column:
    """vecmap_l1_distance (neurondb--1.0.sql:613-649): Σ|a_k − b_k| over
    the index union, ascending-key accumulation."""
    a, b = _s(a), _s(b)
    keys = F.array_sort(F.array_union(a["indices"], b["indices"]))
    return F.aggregate(
        F.transform(keys, lambda k: F.abs(_val(a, k) - _val(b, k))),
        F.lit(0.0),
        lambda s, x: s + x,
    )


# vecmap / sparsevec are the same struct here (SURVEY §1.2 folds the
# reference's two sparse types into one representation, both function
# families kept): expose the vecmap-named surface as aliases.
vecmap_l2_distance = sparse_l2_distance
vecmap_cosine_distance = sparse_cosine_distance
vecmap_inner_product = sparse_inner_product
vecmap_l1_distance = sparse_l1_distance
vecmap_norm = sparse_l2_norm
