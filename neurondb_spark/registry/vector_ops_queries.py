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


def _q_masked_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2 masked/affine surface (vector_advanced.c:259-445, 78-171;
    vector_ops.c:32-154): scale, translate, where, set, filter,
    percentile/quantile — one probe column each."""
    from neurondb_spark.functions.vector import (
        vector_element_sum,
        vector_filter,
        vector_percentile,
        vector_quantile,
        vector_scale,
        vector_set,
        vector_translate,
        vector_where,
    )

    emb = t(spark, sf_dir, "embeddings").where(F.col("vec_id") <= 100)
    q = qvec(spark, sf_dir)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    mask = F.transform(vec("embedding"), lambda x: x > 0)
    kept = vector_filter("embedding", mask)
    return emb.select(
        "vec_id",
        F.element_at(vector_scale("embedding", qlit), 4).alias("scale_e4"),
        F.element_at(vector_translate("embedding", qlit), 2).alias("trans_e2"),
        F.element_at(vector_where("embedding", qlit, 0.5), 7).alias("where_e7"),
        vector_element_sum(vector_set("embedding", 3, 1.5)).alias("set_sum"),
        F.size(kept).alias("filter_n"),
        F.element_at(kept, 1).alias("filter_e1"),
        vector_percentile("embedding", 0.25).alias("p25"),
        F.element_at(vector_quantile("embedding", [0.25, 0.75]), 2).alias("p75"),
    )


def _sql_masked_ops() -> str:
    e = "CAST(e.embedding[{i}] AS DOUBLE)"
    qv = "CAST(q.qe[{i}] AS DOUBLE)"
    set_terms = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(generate_series(1, " + str(EMB_DIM) + "), "
        "i -> CASE WHEN i = 3 THEN CAST(1.5 AS DOUBLE) "
        "ELSE CAST(e.embedding[i] AS DOUBLE) END)), (a, b) -> a + b)"
    )
    kept = (
        "list_filter(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), "
        "x -> x > 0)"
    )
    srt = "list_sort(list_transform(e.embedding, x -> CAST(x AS DOUBLE)))"
    p25_idx = "CAST(floor(0.25 * " + str(EMB_DIM - 1) + ") AS INTEGER) + 1"
    p75_idx = "CAST(floor(0.75 * " + str(EMB_DIM - 1) + ") AS INTEGER) + 1"
    return f"""{QVEC_CTE}
SELECT e.vec_id,
  ({e.format(i=4)}) * ({qv.format(i=4)}) AS scale_e4,
  ({e.format(i=2)}) + ({qv.format(i=2)}) AS trans_e2,
  (CASE WHEN ({e.format(i=7)}) <> 0.0 THEN ({qv.format(i=7)}) ELSE 0.5 END) AS where_e7,
  {set_terms} AS set_sum,
  CAST(len({kept}) AS INTEGER) AS filter_n,
  ({kept})[1] AS filter_e1,
  ({srt})[{p25_idx}] AS p25,
  ({srt})[{p75_idx}] AS p75
FROM embeddings e CROSS JOIN q WHERE e.vec_id <= 100"""


def _q_sparse_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sparsevec metric surface beyond the dot (vector_types.c:735-800,
    vector_sparse.c:45-230): l2/cosine/inner-product + norm over
    sparsified embeddings vs the sparsified query, top-12 by cosine
    distance. Rows whose sparsification empties (zero norm) are excluded
    (cosine of a zero sparse vector raises, as in the reference)."""
    from neurondb_spark.functions.sparse import (
        sparse_cosine_distance,
        sparse_inner_product,
        sparse_l2_distance,
        sparse_l2_norm,
        sparse_nnz,
        sparsify,
    )

    emb = t(spark, sf_dir, "embeddings")
    q = qvec(spark, sf_dir)
    # materialize the sparse struct ONCE per row: inlining sparsify()
    # into all five metric columns quintuples the filter+transform
    # subtree (2.0s -> 1.2s warm at sf0.1, and a 5x smaller plan)
    sparsed = emb.select("vec_id", sparsify("embedding", SPARSE_T).alias("sa"))
    sa = F.col("sa")
    # the query side is a literal: sparsify it in Python so the plan
    # carries an nnz-sized struct literal, not a 64-element filter tree
    qi = [i for i, x in enumerate(q, 1) if abs(x) >= SPARSE_T]
    sq = F.struct(
        F.lit(len(q)).alias("dim"),
        F.array(*[F.lit(i) for i in qi]).cast("array<int>").alias("indices"),
        F.array(*[F.lit(float(q[i - 1])) for i in qi]).alias("values"),
    )
    base = sparsed.select(
        "vec_id",
        sparse_nnz(sa).alias("nnz"),
        sparse_l2_norm(sa).alias("s_norm"),
        sparse_inner_product(sa, sq).alias("s_ip"),
        sparse_l2_distance(sa, sq).alias("s_l2"),
        F.when(sparse_l2_norm(sa) > 0.0, sparse_cosine_distance(sa, sq))
        .otherwise(F.lit(None))
        .alias("s_cos_dist"),
    )
    return (
        base.where(F.col("s_norm") > 0.0)
        .orderBy(F.col("s_cos_dist").asc(), F.col("vec_id").asc())
        .limit(12)
    )


def _sql_sparse_metrics() -> str:
    ak = (
        f"list_filter(generate_series(1, {EMB_DIM}), "
        f"k -> abs(CAST(e.embedding[k] AS DOUBLE)) >= {SPARSE_T!r})"
    )
    qk = (
        f"list_filter(generate_series(1, {EMB_DIM}), "
        f"k -> abs(CAST(q.qe[k] AS DOUBLE)) >= {SPARSE_T!r})"
    )
    av = "CASE WHEN abs(CAST(s.embedding[k] AS DOUBLE)) >= " + repr(SPARSE_T) + \
         " THEN CAST(s.embedding[k] AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    qv = "CASE WHEN abs(CAST(s.qe[k] AS DOUBLE)) >= " + repr(SPARSE_T) + \
         " THEN CAST(s.qe[k] AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    fold = "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), (a, b) -> a + b)"
    ip = fold.format(
        terms=f"list_transform(list_sort(list_filter(s.ak, k -> list_contains(s.qk, k))), "
        f"k -> ({av}) * ({qv}))"
    )
    l2 = fold.format(
        terms=f"list_transform(list_sort(list_distinct(s.ak || s.qk)), "
        f"k -> (({av}) - ({qv})) * (({av}) - ({qv})))"
    )
    norm = fold.format(
        terms=f"list_transform(s.ak, k -> ({av}) * ({av}))"
    )
    qnorm = fold.format(
        terms=f"list_transform(s.qk, k -> ({qv}) * ({qv}))"
    )
    return f"""{QVEC_CTE},
s AS MATERIALIZED (
  SELECT e.vec_id, e.embedding, q.qe, {ak} AS ak, {qk} AS qk
  FROM embeddings e CROSS JOIN q),
m AS (
  SELECT s.vec_id,
    CAST(len(s.ak) AS INTEGER) AS nnz,
    sqrt({norm}) AS s_norm,
    {ip} AS s_ip,
    sqrt({l2}) AS s_l2,
    ({ip}) / (sqrt({norm}) * sqrt({qnorm})) AS cos_sim
  FROM s)
SELECT vec_id, nnz, s_norm, s_ip, s_l2, (1.0 - cos_sim) AS s_cos_dist
FROM m WHERE s_norm > 0.0
ORDER BY s_cos_dist ASC, vec_id ASC LIMIT 12"""


def _q_vector_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/square/sqrt/median/element_sum/element min-max (vector_ops.c
    §2.2 family) — the r3-pytest-only tail graduated to the gate. All
    element picks + an unrolled in-row sum; every op is IEEE-exact (pow
    deliberately excluded: Math.pow vs DuckDB pow differ in last ulp —
    vector_pow stays pytest-covered)."""
    from neurondb_spark.functions.vector import (
        vector_abs,
        vector_element_sum,
        vector_max,
        vector_median,
        vector_min,
        vector_sqrt,
        vector_square,
    )

    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.element_at(vector_abs("embedding"), 1).alias("abs_e1"),
        F.element_at(vector_square("embedding"), 2).alias("sq_e2"),
        F.element_at(vector_sqrt(vector_abs("embedding")), 3).alias("sqrt_abs_e3"),
        vector_median("embedding").alias("median_val"),
        vector_element_sum("embedding").alias("elem_sum"),
        vector_min("embedding").alias("elem_min"),
        vector_max("embedding").alias("elem_max"),
    )


def _sql_vector_math() -> str:
    e = lambda i: O.elem("embedding", i)  # noqa: E731
    srt = "list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))"
    chain = " + ".join(f"({e(i)})" for i in range(1, EMB_DIM + 1))
    return f"""SELECT vec_id,
  abs({e(1)}) AS abs_e1,
  ({e(2)}) * ({e(2)}) AS sq_e2,
  sqrt(abs({e(3)})) AS sqrt_abs_e3,
  (({srt})[32] + ({srt})[33]) / 2.0 AS median_val,
  ({chain}) AS elem_sum,
  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS elem_min,
  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS elem_max
FROM embeddings"""


def _q_vector_var_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vector_variance / vector_stddev (vector_ops.c:361-551): population
    variance over the elements — two left-assoc folds (sum, then squared
    deviations), both replayed in order by the oracle's list_reduce."""
    from neurondb_spark.functions.vector import vector_stddev, vector_variance

    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        vector_variance("embedding").alias("var_val"),
        vector_stddev("embedding").alias("std_val"),
    )


def _sql_vector_var_std() -> str:
    darr = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    mean = f"(list_reduce({darr}, (a, b) -> a + b) / {EMB_DIM})"
    var = (
        f"(list_reduce(list_transform({darr}, "
        f"x -> (x - m.mean) * (x - m.mean)), (a, b) -> a + b) / {EMB_DIM})"
    )
    return f"""WITH m AS (SELECT vec_id, embedding, {mean} AS mean FROM embeddings)
SELECT vec_id, {var} AS var_val, sqrt({var}) AS std_val FROM m"""


def _q_vector_preprocess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """neurondb.preprocess dispatcher (neurondb--1.0.sql:6091-6118) —
    all four routes under the hash gate: standardize ((x−mean)/sd with
    the ordered-fold mean/variance), minmax, clip to [−1,1], l2
    normalize. One representative element per route keeps the output
    scalar-typed."""
    from neurondb_spark.functions.nlp import preprocess

    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.element_at(preprocess("embedding", "standardize"), 1).alias("std_e1"),
        F.element_at(preprocess("embedding", "minmax"), 2).alias("mm_e2"),
        F.element_at(preprocess("embedding", "clip"), 3).alias("clip_e3"),
        F.element_at(preprocess("embedding", "l2"), 4).alias("l2_e4"),
    )


def _sql_vector_preprocess() -> str:
    e = lambda i: O.elem("embedding", i)  # noqa: E731
    darr = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    mean = f"(list_reduce({darr}, (a, b) -> a + b) / {EMB_DIM})"
    var = (
        f"(list_reduce(list_transform({darr}, "
        f"x -> (x - m.mean) * (x - m.mean)), (a, b) -> a + b) / {EMB_DIM})"
    )
    sumsq = " + ".join(f"({e(i)}) * ({e(i)})" for i in range(1, EMB_DIM + 1))
    lo = "CAST(list_aggregate(embedding, 'min') AS DOUBLE)"
    hi = "CAST(list_aggregate(embedding, 'max') AS DOUBLE)"
    return f"""WITH m AS (SELECT vec_id, embedding, {mean} AS mean FROM embeddings),
m2 AS (SELECT vec_id, embedding, mean, sqrt({var}) AS sd FROM m)
SELECT vec_id,
  (({e(1)}) - mean) / sd AS std_e1,
  (({e(2)}) - {lo}) / ({hi} - {lo}) AS mm_e2,
  least(greatest({e(3)}, -1.0), 1.0) AS clip_e3,
  ({e(4)}) / sqrt({sumsq}) AS l2_e4
FROM m2"""


def _q_vector_sum_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vector_sum + element-wise min/max over rows (aggregates.c §2.4 —
    the ✔-only tail of the aggregate family): three vector_agg_exploded
    passes joined on (label, pos); the sum routes through decimal (exact
    in any partitioning/order, same as the oracle's DECIMAL(38,6) sum)."""
    from neurondb_spark.functions.aggregates import vector_agg_exploded

    emb = t(spark, sf_dir, "embeddings")
    s = vector_agg_exploded(emb, "embedding", ["label"], op="sum", out_col="sum_val")
    mn = vector_agg_exploded(emb, "embedding", ["label"], op="min", out_col="min_val")
    mx = vector_agg_exploded(emb, "embedding", ["label"], op="max", out_col="max_val")
    return s.join(mn, ["label", "pos"]).join(mx, ["label", "pos"])


def _sql_vector_sum_minmax() -> str:
    return f"""WITH ex AS (
  SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS p
  FROM embeddings)
SELECT label, CAST(p AS INTEGER) AS pos, {O.dsum('v')} AS sum_val,
       MIN(v) AS min_val, MAX(v) AS max_val
FROM ex GROUP BY label, p"""


def _q_vector_cross3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vector_cross_product (vector_advanced.c:30): 3-D cross product of
    each embedding's first three components with the query vector's —
    two products + one subtraction per component, IEEE-exact."""
    from neurondb_spark.functions.vector import vector_cross_product

    emb = t(spark, sf_dir, "embeddings")
    q3 = qvec(spark, sf_dir)[:3]
    qcol = F.array(*[F.lit(float(x)) for x in q3])
    cr = vector_cross_product("embedding", qcol)
    return emb.select(
        "vec_id",
        F.element_at(cr, 1).alias("cx"),
        F.element_at(cr, 2).alias("cy"),
        F.element_at(cr, 3).alias("cz"),
    )


def _sql_vector_cross3() -> str:
    e = lambda i: O.elem("embedding", i)  # noqa: E731
    q = lambda i: f"(SELECT CAST(qe[{i}] AS DOUBLE) FROM q)"  # noqa: E731
    return f"""{QVEC_CTE}
SELECT vec_id,
  ({e(2)}) * {q(3)} - ({e(3)}) * {q(2)} AS cx,
  ({e(3)}) * {q(1)} - ({e(1)}) * {q(3)} AS cy,
  ({e(1)}) * {q(2)} - ({e(2)}) * {q(1)} AS cz
FROM embeddings"""


def _q_vector_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vector_in text-literal parsing under the hash gate
    (functions/vector.parse_vector; vector_in per
    neurondb--1.0.sql:55-76): synthesize ``[a,b,c]`` literals from
    integer-valued columns (integer→string is cross-engine exact,
    unlike double→string), parse, and check dims / element access /
    fold-sum of the parsed array."""
    from neurondb_spark.functions.vector import parse_vector, vector_dims

    orders = t(spark, sf_dir, "orders")
    lit = F.concat(
        F.lit("["), (F.col("o_orderkey") % 7).cast("long").cast("string"),
        F.lit(","), (F.col("o_orderkey") % 13).cast("long").cast("string"),
        F.lit(","), (F.col("o_orderkey") % 29).cast("long").cast("string"),
        F.lit("]"),
    )
    v = parse_vector(lit)
    return orders.select(
        "o_orderkey",
        vector_dims(v).alias("dims"),
        v.getItem(1).alias("v2"),
        F.aggregate(v, F.lit(0.0), lambda a, x: a + x).alias("vsum"),
    )


def _sql_vector_parse() -> str:
    lit = ("('[' || CAST(o_orderkey % 7 AS VARCHAR) || ',' "
           "|| CAST(o_orderkey % 13 AS VARCHAR) || ',' "
           "|| CAST(o_orderkey % 29 AS VARCHAR) || ']')")
    parsed = (f"list_transform(string_split(regexp_replace(trim({lit}), "
              f"'^\\[|\\]$', '', 'g'), ','), x -> CAST(x AS DOUBLE))")
    return f"""WITH p AS (SELECT o_orderkey, {parsed} AS v FROM orders)
SELECT o_orderkey,
       CAST(len(v) AS INTEGER) AS dims,
       v[2] AS v2,
       list_reduce(list_prepend(0.0, v), (a, x) -> a + x) AS vsum
FROM p"""


QUERIES = {
    "vector_arith_ops": (_q_vector_arith, _sql_vector_arith()),
    "vector_parse_roundtrip": (_q_vector_parse, _sql_vector_parse()),
    "vector_math_ops": (_q_vector_math, _sql_vector_math()),
    "sparse_vector_dot": (_q_sparse_dot, _sql_sparse_dot()),
    "vector_masked_ops": (_q_masked_ops, _sql_masked_ops()),
    "sparse_metrics_knn": (_q_sparse_metrics, _sql_sparse_metrics()),
    "vector_variance_stddev": (_q_vector_var_std, _sql_vector_var_std()),
    "vector_preprocess_ops": (_q_vector_preprocess, _sql_vector_preprocess()),
    "vector_sum_minmax_by_label": (_q_vector_sum_minmax, _sql_vector_sum_minmax()),
    "vector_cross_product3": (_q_vector_cross3, _sql_vector_cross3()),
}
