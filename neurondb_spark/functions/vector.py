"""Vector constructors, casts, element-wise arithmetic and reductions.

Reference surface: SURVEY §2.1-2.2 —
constructors/casts NeuronDB/src/vector/vector_cast.c:55-525,
arithmetic NeuronDB/src/core/operators.c:270 + src/vector/vector_ops.c:32-776,
reductions src/vector/vector_advanced.c:78-445.

All functions return Catalyst Column expressions over ``array<double>``
(vectors stored as ``array<float>`` are cast up — float→double is exact, so
results are bit-identical to a double-precision oracle). No Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = "Column | str"


def vec(c: Column | str) -> Column:
    """Normalize a column-or-name to an ``array<double>`` Column."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("array<double>")


def parse_vector(c: Column | str) -> Column:
    """Parse the reference's text literal ``[1,2,3]`` into array<double>.

    Mirrors vector_in (neurondb--1.0.sql:55-76): brackets stripped,
    comma-separated floats. Empty vectors are rejected by the reference
    (sql/01_types_basic.sql:22-31); here they parse to an empty array and
    downstream checked ops raise.
    """
    col = F.col(c) if isinstance(c, str) else c
    cleaned = F.regexp_replace(F.trim(col), r"^\[|\]$", "")
    return F.transform(F.split(cleaned, r"\s*,\s*"), lambda x: x.cast("double"))


def vector_dims(c: Column | str) -> Column:
    """vector_dims (neurondb--1.0.sql:337) → array size."""
    return F.size(F.col(c) if isinstance(c, str) else c)


# --- element-wise arithmetic (operators.c:270; ops neurondb--1.0.sql:365-386)

def vector_add(a, b) -> Column:
    return F.zip_with(vec(a), vec(b), lambda x, y: x + y)


def vector_sub(a, b) -> Column:
    return F.zip_with(vec(a), vec(b), lambda x, y: x - y)


def vector_hadamard(a, b) -> Column:
    """Element-wise multiply (vector_ops.c:291)."""
    return F.zip_with(vec(a), vec(b), lambda x, y: x * y)


def vector_divide(a, b) -> Column:
    """Element-wise divide (vector_ops.c:323)."""
    return F.zip_with(vec(a), vec(b), lambda x, y: x / y)


def vector_mul_scalar(a, s) -> Column:
    s = F.lit(float(s)) if not isinstance(s, Column) else s
    return F.transform(vec(a), lambda x: x * s)


def vector_div_scalar(a, s) -> Column:
    s = F.lit(float(s)) if not isinstance(s, Column) else s
    return F.transform(vec(a), lambda x: x / s)


def vector_abs(a) -> Column:
    return F.transform(vec(a), F.abs)


def vector_square(a) -> Column:
    return F.transform(vec(a), lambda x: x * x)


def vector_sqrt(a) -> Column:
    return F.transform(vec(a), F.sqrt)


def vector_pow(a, p) -> Column:
    p = F.lit(float(p)) if not isinstance(p, Column) else p
    return F.transform(vec(a), lambda x: F.pow(x, p))


def vector_concat(a, b) -> Column:
    """vector_concat (neurondb--1.0.sql:352)."""
    return F.concat(vec(a), vec(b))


def vector_slice(a, start: int, length: int) -> Column:
    """1-indexed slice (vector_ops.c:32-154 family)."""
    return F.slice(vec(a), start, length)


def vector_append(a, x) -> Column:
    x = F.lit(float(x)) if not isinstance(x, Column) else x
    return F.concat(vec(a), F.array(x.cast("double")))


def vector_prepend(x, a) -> Column:
    x = F.lit(float(x)) if not isinstance(x, Column) else x
    return F.concat(F.array(x.cast("double")), vec(a))


def vector_get(a, i: int) -> Column:
    """1-indexed element access (vector_ops.c:32). Out-of-bounds → NULL
    (PostgreSQL array-subscript semantics; ANSI element_at would throw)."""
    return F.try_element_at(vec(a), F.lit(i))


def vector_set(a, i: int, x) -> Column:
    """Set element i (1-indexed here; the reference's vector_set takes a
    0-based index, vector_ops.c:32-154) to x, returning the new vector.
    Out-of-bounds index raises like the reference."""
    x = F.lit(float(x)) if not isinstance(x, Column) else x
    a = vec(a)
    return F.when(
        (F.lit(i) < 1) | (F.lit(i) > F.size(a)),
        F.raise_error(f"neurondb: vector_set index {i} out of bounds"),
    ).otherwise(
        F.transform(a, lambda e, idx: F.when(idx == i - 1, x.cast("double")).otherwise(e))
    )


# --- masked / affine ops (vector_advanced.c:259-445)

def vector_scale(a, factors) -> Column:
    """Element-wise multiply by a per-dimension factor array
    (vector_scale, vector_advanced.c:259-331)."""
    return F.zip_with(vec(a), vec(factors), lambda x, s: x * s)


def vector_translate(a, offsets) -> Column:
    """Element-wise add a per-dimension offset vector
    (vector_translate, vector_advanced.c:333-380)."""
    return F.zip_with(vec(a), vec(offsets), lambda x, o: x + o)


def vector_filter(a, mask) -> Column:
    """Keep elements where the boolean mask is true; the result is the
    (shorter) selected subvector (vector_filter, vector_advanced.c:382-445;
    an all-false mask raises there)."""
    mask = F.col(mask) if isinstance(mask, str) else mask
    pairs = F.zip_with(
        vec(a), mask, lambda x, m: F.struct(x.alias("v"), m.alias("m"))
    )
    kept = F.transform(
        F.filter(pairs, lambda s: s["m"]), lambda s: s["v"]
    )
    return F.when(
        F.size(kept) == 0,
        F.raise_error("neurondb: filter mask must have at least one true value"),
    ).otherwise(kept)


def vector_where(cond, value, else_value) -> Column:
    """Element-wise select: cond[i] != 0 ? value[i] : else_value
    (vector_where, vector_advanced.c:447-493)."""
    e = F.lit(float(else_value)) if not isinstance(else_value, Column) else else_value
    return F.zip_with(
        vec(cond), vec(value),
        lambda c, v: F.when(c != 0.0, v).otherwise(e.cast("double")),
    )


# --- intra-vector reductions (vector_ops.c:361-551, vector_advanced.c:78-171)

def vector_element_sum(a) -> Column:
    return F.aggregate(vec(a), F.lit(0.0), lambda s, x: s + x)


def vector_mean(a) -> Column:
    a = vec(a)
    return F.aggregate(a, F.lit(0.0), lambda s, x: s + x) / F.size(a)


def vector_min(a) -> Column:
    return F.array_min(vec(a))


def vector_max(a) -> Column:
    return F.array_max(vec(a))


def vector_variance(a) -> Column:
    """Population variance of the elements (vector_ops.c:361-551)."""
    a = vec(a)
    n = F.size(a)
    mean = F.aggregate(a, F.lit(0.0), lambda s, x: s + x) / n
    return F.aggregate(a, F.lit(0.0), lambda s, x: s + (x - mean) * (x - mean)) / n


def vector_stddev(a) -> Column:
    return F.sqrt(vector_variance(a))


def vector_median(a) -> Column:
    """Median via sort; even length averages the middle pair
    (vector_advanced.c:78-171)."""
    a = vec(a)
    s = F.sort_array(a)
    n = F.size(a)
    mid = (n / 2).cast("int")
    odd = F.element_at(s, mid + 1)
    even = (F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2.0
    return F.when(n % 2 == 1, odd).otherwise(even)


def vector_percentile(a, p: float) -> Column:
    """Percentile of the elements, nearest-rank-floor: sort ascending and
    take sorted[int(p·(dim−1))] — no interpolation (vector_percentile,
    vector_advanced.c:78-171)."""
    if not 0.0 <= p <= 1.0:
        raise ValueError("neurondb: percentile must be between 0 and 1")
    a = vec(a)
    idx = F.floor(F.lit(float(p)) * (F.size(a) - 1)).cast("int") + 1
    return F.element_at(F.sort_array(a), idx)


def vector_quantile(a, ps: list[float]) -> Column:
    """Multiple percentiles at once → array<double> (vector_quantile,
    vector_advanced.c:173-257; same nearest-rank-floor rule)."""
    for p in ps:
        if not 0.0 <= p <= 1.0:
            raise ValueError("neurondb: quantile must be between 0 and 1")
    a = vec(a)
    s = F.sort_array(a)
    n1 = F.size(a) - 1
    return F.array(
        *[
            F.element_at(s, F.floor(F.lit(float(p)) * n1).cast("int") + 1)
            for p in ps
        ]
    )


def vector_norm(a) -> Column:
    """L2 norm (src/core/neurondb.c:380-475)."""
    return F.sqrt(F.aggregate(vector_square(a), F.lit(0.0), lambda s, x: s + x))


def vector_normalize(a) -> Column:
    """Unit-normalize; zero vector raises (neurondb.c:380-475 rejects)."""
    a = vec(a)
    n = vector_norm(a)
    return F.when(
        n == 0.0, F.raise_error("neurondb: cannot normalize zero vector")
    ).otherwise(F.transform(a, lambda x: x / n))


def vector_clip(a, lo: float, hi: float) -> Column:
    """Clamp elements (vector_ops.c:676-776)."""
    lo_l, hi_l = F.lit(float(lo)), F.lit(float(hi))
    return F.transform(vec(a), lambda x: F.least(F.greatest(x, lo_l), hi_l))


def vector_standardize(a) -> Column:
    """(x - mean) / stddev per vector (vector_ops.c:676-776)."""
    a = vec(a)
    mean = vector_mean(a)
    sd = vector_stddev(a)
    return F.transform(a, lambda x: (x - mean) / sd)


def vector_minmax_normalize(a) -> Column:
    a = vec(a)
    lo, hi = F.array_min(a), F.array_max(a)
    return F.transform(a, lambda x: (x - lo) / (hi - lo))


def vector_cast_dimension(a, n: int) -> Column:
    """Pad with zeros / truncate to dimension n (vector_cast.c:348)."""
    a = vec(a)
    padded = F.concat(a, F.array_repeat(F.lit(0.0), n))
    return F.slice(padded, 1, n)


def vector_cross_product(a, b) -> Column:
    """3-D cross product (vector_advanced.c:30)."""
    a, b = vec(a), vec(b)
    ax, ay, az = (F.element_at(a, i) for i in (1, 2, 3))
    bx, by, bz = (F.element_at(b, i) for i in (1, 2, 3))
    return F.array(ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)
