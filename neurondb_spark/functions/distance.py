"""Distance & similarity kernels (SURVEY §2.3) as pure Column expressions.

Reference semantics: NeuronDB/src/vector/vector_distance.c:124-545 (primary
impls), src/core/distance.c:73-290 (duplicates), SIMD variants
vector_distance_simd.c. Operators: <-> l2, <#> negative inner product,
<=> cosine distance, <+> l1, <~> hamming (neurondb--1.0.sql:2721-2783).
Dimension mismatch is an error (sql/03_distance_metrics.sql:178-186); cosine
of a zero vector is an error (sql/03_distance_metrics.sql:63-71).

Two compilation strategies, both double-precision with identical
left-associative accumulation order so results are bit-identical to the
DuckDB oracle (neurondb_spark/oracle.py generates the matching SQL):

- ``dim`` known → **unrolled** chain of element_at terms: participates in
  whole-stage codegen (a tight JVM loop — the Tungsten analog of the
  reference's AVX2 kernels, neurondb_simd_impl.c:21-71).
- ``dim`` unknown → ``F.aggregate(zip_with(...))`` fold (HigherOrderFunction,
  still JVM-side, one pass, no explode).

At 100 TB these are narrow per-row expressions: no shuffle, pushed past the
scan, columnar parquet reads only the two array columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from neurondb_spark.functions.vector import vec


def _dim_check(a: Column, b: Column, expr: Column, checked: bool) -> Column:
    if not checked:
        return expr
    return F.when(
        F.size(a) != F.size(b),
        F.raise_error("neurondb: vector dimension mismatch"),
    ).otherwise(expr)


# The unrolled chain is a left-deep expression tree of depth `dim`; JVM
# analysis/optimization recurse per level and overflow the default driver
# stack somewhere past ~300 terms (observed: StackOverflowError at
# dim=384 inside withColumn analysis). The fold form is one
# HigherOrderFunction node — constant tree depth — with the identical
# left-associative arithmetic, so past this bound it is strictly the
# right compile, not a compromise.
UNROLL_DIM_MAX = 192


def _fold_sum(a: Column, b: Column, term, dim: int | None) -> Column:
    """Sum of term(a_i, b_i) over elements, left-associative."""
    if dim is not None and dim <= UNROLL_DIM_MAX:
        s = term(F.element_at(a, 1), F.element_at(b, 1))
        for i in range(2, dim + 1):
            s = s + term(F.element_at(a, i), F.element_at(b, i))
        return s
    return F.aggregate(F.zip_with(a, b, term), F.lit(0.0), lambda s, x: s + x)


def _fold_sum_one(a: Column, term, dim: int | None) -> Column:
    if dim is not None and dim <= UNROLL_DIM_MAX:
        s = term(F.element_at(a, 1))
        for i in range(2, dim + 1):
            s = s + term(F.element_at(a, i))
        return s
    return F.aggregate(F.transform(a, term), F.lit(0.0), lambda s, x: s + x)


def squared_l2_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """vector_squared_l2_distance (vector_distance.c:417)."""
    a, b = vec(a), vec(b)
    return _dim_check(a, b, _fold_sum(a, b, lambda x, y: (x - y) * (x - y), dim), checked)


def l2_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """<-> vector_l2_distance (vector_distance.c:124)."""
    a, b = vec(a), vec(b)
    return _dim_check(
        a, b, F.sqrt(_fold_sum(a, b, lambda x, y: (x - y) * (x - y), dim)), checked
    )


def inner_product(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """vector_inner_product (vector_distance.c:159)."""
    a, b = vec(a), vec(b)
    return _dim_check(a, b, _fold_sum(a, b, lambda x, y: x * y, dim), checked)


def negative_inner_product(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """<#> returns the NEGATIVE inner product for index ordering
    (neurondb--1.0.sql:2747-2755)."""
    return -inner_product(a, b, dim=dim, checked=checked)


def cosine_similarity(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """vector_cosine_sim (operators.c:177-235); zero vector → error
    (sql/03_distance_metrics.sql:63-71)."""
    a, b = vec(a), vec(b)
    ip = _fold_sum(a, b, lambda x, y: x * y, dim)
    na = F.sqrt(_fold_sum_one(a, lambda x: x * x, dim))
    nb = F.sqrt(_fold_sum_one(b, lambda x: x * x, dim))
    expr = F.when(
        (na == 0.0) | (nb == 0.0),
        F.raise_error("neurondb: cosine distance of zero vector is undefined"),
    ).otherwise(ip / (na * nb))
    return _dim_check(a, b, expr, checked)


def cosine_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """<=> 1 - cosine similarity (vector_distance.c:215)."""
    return 1.0 - cosine_similarity(a, b, dim=dim, checked=checked)


def l1_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """<+> vector_l1_distance / cityblock (vector_distance.c:250)."""
    a, b = vec(a), vec(b)
    return _dim_check(a, b, _fold_sum(a, b, lambda x, y: F.abs(x - y), dim), checked)


def hamming_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """<~> count of unequal elements (vector_distance.c:271)."""
    a, b = vec(a), vec(b)
    term = lambda x, y: F.when(x != y, F.lit(1.0)).otherwise(F.lit(0.0))  # noqa: E731
    return _dim_check(a, b, _fold_sum(a, b, term, dim), checked)


def chebyshev_distance(a, b, checked: bool = True) -> Column:
    """max |a_i - b_i| (vector_distance.c:302)."""
    a, b = vec(a), vec(b)
    expr = F.array_max(F.zip_with(a, b, lambda x, y: F.abs(x - y)))
    return _dim_check(a, b, expr, checked)


def minkowski_distance(a, b, p: float, dim: int | None = None, checked: bool = True) -> Column:
    """(sum |a_i-b_i|^p)^(1/p), p>0 (vector_distance.c:335)."""
    if p <= 0:
        raise ValueError("neurondb: minkowski p must be > 0")
    a, b = vec(a), vec(b)
    pl = F.lit(float(p))
    s = _fold_sum(a, b, lambda x, y: F.pow(F.abs(x - y), pl), dim)
    return _dim_check(a, b, F.pow(s, 1.0 / float(p)), checked)


def jaccard_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """Treats elements as set membership (non-zero = present):
    1 - |intersection| / |union| (vector_distance.c:453)."""
    a, b = vec(a), vec(b)
    inter = _fold_sum(
        a, b,
        lambda x, y: F.when((x != 0.0) & (y != 0.0), F.lit(1.0)).otherwise(F.lit(0.0)),
        dim,
    )
    union = _fold_sum(
        a, b,
        lambda x, y: F.when((x != 0.0) | (y != 0.0), F.lit(1.0)).otherwise(F.lit(0.0)),
        dim,
    )
    return _dim_check(a, b, F.when(union == 0.0, F.lit(0.0)).otherwise(1.0 - inter / union), checked)


def dice_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """1 - 2|A∩B| / (|A|+|B|) over non-zero membership (vector_distance.c:497)."""
    a, b = vec(a), vec(b)
    inter = _fold_sum(
        a, b,
        lambda x, y: F.when((x != 0.0) & (y != 0.0), F.lit(1.0)).otherwise(F.lit(0.0)),
        dim,
    )
    ca = _fold_sum_one(a, lambda x: F.when(x != 0.0, F.lit(1.0)).otherwise(F.lit(0.0)), dim)
    cb = _fold_sum_one(b, lambda x: F.when(x != 0.0, F.lit(1.0)).otherwise(F.lit(0.0)), dim)
    return _dim_check(
        a, b,
        F.when(ca + cb == 0.0, F.lit(0.0)).otherwise(1.0 - (2.0 * inter) / (ca + cb)),
        checked,
    )


def _binary_n(a: Column, dim: int | None) -> Column:
    return F.lit(float(dim)) if dim is not None else F.size(a).cast("double")


def _binary_diff(a: Column, b: Column, dim: int | None) -> Column:
    """Count of positions whose non-zero membership disagrees (b+c)."""
    return _fold_sum(
        a, b,
        lambda x, y: F.when((x != 0.0) != (y != 0.0), F.lit(1.0)).otherwise(F.lit(0.0)),
        dim,
    )


def _binary_inter(a: Column, b: Column, dim: int | None) -> Column:
    """Count of positions non-zero in both (a11)."""
    return _fold_sum(
        a, b,
        lambda x, y: F.when((x != 0.0) & (y != 0.0), F.lit(1.0)).otherwise(F.lit(0.0)),
        dim,
    )


def sokal_michener_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """(b+c)/n — 1 − simple-matching similarity over non-zero membership
    (tests-only metric, sql/03_distance_metrics.sql:179)."""
    a, b = vec(a), vec(b)
    return _dim_check(a, b, _binary_diff(a, b, dim) / _binary_n(a, dim), checked)


def rogers_tanimoto_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """2(b+c) / ((a+d) + 2(b+c)) over non-zero membership
    (sql/03_distance_metrics.sql:182)."""
    a, b = vec(a), vec(b)
    n = _binary_n(a, dim)
    diff = _binary_diff(a, b, dim)
    return _dim_check(a, b, (2.0 * diff) / ((n - diff) + 2.0 * diff), checked)


def russell_rao_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """(n − a11)/n over non-zero membership
    (sql/03_distance_metrics.sql:188)."""
    a, b = vec(a), vec(b)
    n = _binary_n(a, dim)
    return _dim_check(a, b, (n - _binary_inter(a, b, dim)) / n, checked)


def matching_coefficient(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """SIMILARITY (a+d)/n — simple matching coefficient
    (sql/03_distance_metrics.sql:192)."""
    a, b = vec(a), vec(b)
    n = _binary_n(a, dim)
    return _dim_check(a, b, (n - _binary_diff(a, b, dim)) / n, checked)


def mahalanobis_distance(a, b, inv_diag, dim: int | None = None, checked: bool = True) -> Column:
    """Diagonal-covariance Mahalanobis: sqrt(sum w_i (a_i-b_i)^2)
    (vector_distance.c:545)."""
    a, b, w = vec(a), vec(b), vec(inv_diag)
    if dim is not None and dim <= UNROLL_DIM_MAX:
        s = None
        for i in range(1, dim + 1):
            d = F.element_at(a, i) - F.element_at(b, i)
            t = d * d * F.element_at(w, i)
            s = t if s is None else s + t
    else:
        diffs = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
        s = F.aggregate(
            F.zip_with(diffs, w, lambda d, wi: d * wi), F.lit(0.0), lambda s_, x: s_ + x
        )
    return _dim_check(a, b, F.sqrt(s), checked)


def bray_curtis_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """sum|a-b| / sum|a+b| — tested-but-absent metric
    (sql/03_distance_metrics.sql:128-175); optional surface."""
    a, b = vec(a), vec(b)
    num = _fold_sum(a, b, lambda x, y: F.abs(x - y), dim)
    den = _fold_sum(a, b, lambda x, y: F.abs(x + y), dim)
    return _dim_check(a, b, num / den, checked)


def canberra_distance(a, b, dim: int | None = None, checked: bool = True) -> Column:
    """sum |a-b| / (|a|+|b|), 0-denominator terms skipped
    (sql/03_distance_metrics.sql:128-175)."""
    a, b = vec(a), vec(b)
    term = lambda x, y: F.when(  # noqa: E731
        F.abs(x) + F.abs(y) == 0.0, F.lit(0.0)
    ).otherwise(F.abs(x - y) / (F.abs(x) + F.abs(y)))
    return _dim_check(a, b, _fold_sum(a, b, term, dim), checked)


_METRICS = {
    "l2": l2_distance,
    "euclidean": l2_distance,
    "squared_l2": squared_l2_distance,
    "ip": negative_inner_product,
    "inner_product": negative_inner_product,
    "cosine": cosine_distance,
    "l1": l1_distance,
    "cityblock": l1_distance,
    "manhattan": l1_distance,
    "hamming": hamming_distance,
    "jaccard": jaccard_distance,
    "dice": dice_distance,
    "braycurtis": bray_curtis_distance,
    "canberra": canberra_distance,
    "sokal_michener": sokal_michener_distance,
    "rogers_tanimoto": rogers_tanimoto_distance,
    "russell_rao": russell_rao_distance,
}


def distance(a, b, metric: str = "l2", dim: int | None = None, checked: bool = True, **kw) -> Column:
    """String-dispatch wrapper — neurondb.distance(a,b,metric)
    (neurondb--1.0.sql:5843-5893)."""
    m = metric.lower()
    if m == "chebyshev":
        return chebyshev_distance(a, b, checked=checked)
    if m == "minkowski":
        return minkowski_distance(a, b, kw.get("p", 2.0), dim=dim, checked=checked)
    if m not in _METRICS:
        raise ValueError(f"neurondb: unknown metric {metric!r}")
    return _METRICS[m](a, b, dim=dim, checked=checked)


def similarity(a, b, metric: str = "cosine", dim: int | None = None, checked: bool = True) -> Column:
    """neurondb.similarity (neurondb--1.0.sql:5843-5893): higher = closer."""
    m = metric.lower()
    if m == "cosine":
        return cosine_similarity(a, b, dim=dim, checked=checked)
    if m in ("ip", "inner_product", "dot"):
        return inner_product(a, b, dim=dim, checked=checked)
    if m in ("matching", "matching_coefficient"):
        return matching_coefficient(a, b, dim=dim, checked=checked)
    # similarity = 1 / (1 + distance) for metric distances (reference wrapper)
    return 1.0 / (1.0 + distance(a, b, m, dim=dim, checked=checked))
