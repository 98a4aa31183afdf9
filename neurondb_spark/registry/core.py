"""Core queries: distance kernels (kNN family), vector scalars/aggregates,
relational substrate (SURVEY §2.0, §2.3-2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from neurondb_spark import oracle as O
from neurondb_spark.functions.aggregates import davg, dsum, vector_agg_exploded
from neurondb_spark.functions.vector import vec, vector_norm
from neurondb_spark.operators.knn import (
    faceted_vector_search,
    knn,
    multi_vector_search,
    vec_window_rank,
)
from neurondb_spark.registry.common import COMPILE_DIM, EMB_DIM, QVEC_CTE, qvec, t


def _mk_knn(metric: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        emb = t(spark, sf_dir, "embeddings")
        q = qvec(spark, sf_dir)
        return knn(
            emb, "embedding", q, k=10, metric=metric, dim=COMPILE_DIM,
            tiebreak=["vec_id"],
        ).select("vec_id", "label", "distance")

    return run


def _sql_knn(metric: str) -> str:
    d = O.sql_distance("e.embedding", "q.qe", metric, EMB_DIM)
    return f"""{QVEC_CTE}
SELECT e.vec_id, e.label, {d} AS distance
FROM embeddings e CROSS JOIN q
ORDER BY distance ASC, e.vec_id ASC LIMIT 10"""


def _q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        vector_norm("embedding").alias("l2_norm"),
        F.aggregate(vec("embedding"), F.lit(0.0), lambda s, x: s + x).alias("elem_sum"),
        F.array_min(vec("embedding")).alias("elem_min"),
        F.array_max(vec("embedding")).alias("elem_max"),
    )


def _sql_vector_norms() -> str:
    sq = " + ".join(
        f"({O.elem('embedding', i)}) * ({O.elem('embedding', i)})"
        for i in range(1, EMB_DIM + 1)
    )
    es = " + ".join(f"({O.elem('embedding', i)})" for i in range(1, EMB_DIM + 1))
    mins = ", ".join(O.elem("embedding", i) for i in range(1, EMB_DIM + 1))
    return f"""SELECT vec_id, sqrt({sq}) AS l2_norm, {es} AS elem_sum,
least({mins}) AS elem_min, greatest({mins}) AS elem_max
FROM embeddings"""


def _q_vector_avg_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return vector_agg_exploded(emb, "embedding", ["label"], op="avg")


_SQL_VECTOR_AVG_BY_LABEL = f"""WITH ex AS (
  SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS p
  FROM embeddings)
SELECT label, CAST(p AS INTEGER) AS pos, {O.davg('v')} AS val
FROM ex GROUP BY label, p"""


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    charge = disc_price * (1.0 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_SQL_TPCH_Q1 = f"""SELECT l_returnflag, l_linestatus,
  {O.dsum('l_quantity')} AS sum_qty,
  {O.dsum('l_extendedprice')} AS sum_base_price,
  {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
  {O.dsum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')} AS sum_charge,
  {O.davg('l_quantity')} AS avg_qty,
  {O.davg('l_extendedprice')} AS avg_price,
  {O.davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""


def _q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority, adapted to the testdata schema —
    orders has no o_shippriority column): unshipped-revenue top 10 for
    one market segment. Exercises the 3-way join with a broadcast-able
    dimension filter + aggregate + global top-k — the canonical
    relational plan Catalyst must get right (§2.0)."""
    cust = t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


_SQL_TPCH_Q3 = f"""SELECT l_orderkey, o_orderdate,
  {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""


def _q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): one tight filter + one
    aggregate — the pushdown benchmark; the executed plan must show
    PushedFilters on the parquet scan and a 2-column ReadSchema."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"))
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_SQL_TPCH_Q6 = f"""SELECT
  {O.dsum('l_extendedprice * l_discount')} AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= {O.dlit(0.05)} AND l_discount <= {O.dlit(0.07)}
  AND l_quantity < 24"""


def _q_top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(10)
    )


_SQL_TOP_REVENUE_CUSTOMERS = f"""SELECT c.c_custkey, c.c_name, c.c_mktsegment,
  {O.dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
ORDER BY revenue DESC, c.c_custkey ASC LIMIT 10"""


def _q_orders_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn"))
    )


_SQL_ORDERS_TOPK_PER_SEGMENT = """SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey)
WHERE rn <= 5"""


def _q_faceted_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = qvec(spark, sf_dir)
    return faceted_vector_search(
        emb, "embedding", q, facet_col="label", per_facet_k=3,
        metric="l2", dim=COMPILE_DIM, tiebreak=["vec_id"],
    ).select("label", "vec_id", "distance", F.col("facet_rank").cast("int").alias("facet_rank"))


def _sql_faceted_search() -> str:
    d = O.sql_l2("e.embedding", "q.qe", EMB_DIM)
    return f"""{QVEC_CTE}
SELECT label, vec_id, distance, CAST(facet_rank AS INTEGER) AS facet_rank FROM (
  SELECT e.label, e.vec_id, {d} AS distance,
         ROW_NUMBER() OVER (PARTITION BY e.label ORDER BY {d} ASC, e.vec_id ASC) AS facet_rank
  FROM embeddings e CROSS JOIN q)
WHERE facet_rank <= 3"""


def _q_multi_vector_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q1 = qvec(spark, sf_dir, 1)
    q2 = qvec(spark, sf_dir, 2)
    return multi_vector_search(
        emb, "embedding", [q1, q2], k=10, metric="l2", agg="min",
        dim=COMPILE_DIM, tiebreak=["vec_id"],
    ).select("vec_id", "distance")


def _sql_multi_vector_search() -> str:
    d1 = O.sql_l2("e.embedding", "q1.qe", EMB_DIM)
    d2 = O.sql_l2("e.embedding", "q2.qe", EMB_DIM)
    return f"""WITH q1 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
q2 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 2)
SELECT e.vec_id, least({d1}, {d2}) AS distance
FROM embeddings e CROSS JOIN q1 CROSS JOIN q2
ORDER BY distance ASC, e.vec_id ASC LIMIT 10"""


def _q_vec_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = qvec(spark, sf_dir)
    out = vec_window_rank(
        emb, "embedding", q, partition_col="label", metric="cosine",
        dim=COMPILE_DIM, tiebreak=["vec_id"],
    )
    return out.where(F.col("vrank") <= 5).select(
        "label", "vec_id", "distance", F.col("vrank").cast("int").alias("vrank")
    )


def _sql_vec_window_rank() -> str:
    d = O.sql_cosine_distance("e.embedding", "q.qe", EMB_DIM)
    return f"""{QVEC_CTE}
SELECT label, vec_id, distance, CAST(vrank AS INTEGER) AS vrank FROM (
  SELECT e.label, e.vec_id, {d} AS distance,
         RANK() OVER (PARTITION BY e.label ORDER BY {d} ASC, e.vec_id ASC) AS vrank
  FROM embeddings e CROSS JOIN q)
WHERE vrank <= 5"""


def _q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking, adapted: the testdata schema
    has no l_commitdate, so 'late' = a lineitem shipped after the order
    date): count 1996 orders per priority having at least one late
    line. Exercises the correlated-EXISTS → LEFT SEMI join plan (§2.0);
    the orders-side date range pushes to the scan, the semi join
    shuffles on orderkey only and carries no lineitem payload."""
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_SQL_TPCH_Q4 = """SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority"""


def _q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): revenue by nation where the
    customer and supplier share a nation, one region, one order year.
    The canonical 6-way join (§2.0): lineitem⋈orders⋈customer shuffle
    on keys; supplier/nation/region are dimension-sized and broadcast;
    the c_nationkey = s_nationkey colocation predicate rides the
    supplier join so no extra shuffle is added."""
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(
            F.broadcast(asia_nations),
            supp.s_nationkey == F.col("n_nationkey"),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


_SQL_TPCH_Q5 = f"""SELECT n_name,
  {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name"""


def _q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, adapted to the testdata part
    schema): revenue over an OR of three (brand, size-range,
    quantity-range) conjunct groups — the canonical DISJUNCTIVE
    predicate (§2.0). Catalyst extracts the common l_partkey join and
    pushes the brand/size disjunction to the part scan; the per-brand
    quantity windows apply post-join. Output grouped by brand so the
    row is verifiable per arm."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    arms = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & q.between(20, 30))
    )
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(arms)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(rev).alias("revenue"),
        )
        .orderBy("p_brand")
    )


_SQL_TPCH_Q19 = f"""SELECT p_brand, COUNT(*) AS n_lines,
  {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
ORDER BY p_brand"""


def _q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping priority classes, adapted: no l_shipmode in
    the testdata schema, so the class split keys on o_orderpriority):
    per returnflag, lines from high- vs low-priority orders shipped in
    1996. The canonical conditional-aggregation (CASE-sum pivot) over
    one keyed shuffle (§2.0)."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        joined.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("high_line_count"),
            F.sum(F.when(~high, F.lit(1)).otherwise(F.lit(0)))
            .cast("long").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_SQL_TPCH_Q12 = """SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag"""


def _q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue, adapted: no p_container
    in the testdata schema, so the part filter is brand-only): yearly
    revenue lost if orders below 20% of a part's average quantity were
    dropped. THE nested-subquery shape — a correlated scalar subquery
    over an aggregate in the WHERE clause (r9 verdict stretch #8; the
    last §2.0 plan family without a gate row) — decorrelated the way
    Catalyst itself would: the brand slice of part broadcasts into
    lineitem, the per-partkey threshold is ONE map-side-combined
    aggregate over that already-filtered frame, and the threshold join
    is co-keyed on l_partkey with the aggregate it consumes (at 100 TB:
    one broadcast + one keyed shuffle reused by agg and join, never a
    re-scan per outer row). Cross-row double aggregates go through the
    exact-decimal helpers for engine-order independence."""
    li = t(spark, sf_dir, "lineitem")
    part_b = (
        t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    li_b = li.join(
        F.broadcast(part_b), li.l_partkey == part_b.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    thresh = li_b.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg("l_quantity")).alias("q_thresh")
    )
    return (
        li_b.join(thresh, "l_partkey")
        .where(F.col("l_quantity") < F.col("q_thresh"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


_SQL_TPCH_Q17 = f"""SELECT {O.dsum('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * {O.davg('l2.l_quantity')}
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)"""


def _q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade revenue between two
    nations by ship year — the canonical SELF-JOINED-DIMENSION shape
    (nation joins twice, once through supplier and once through
    customer) plus a symmetric pair predicate. At 100 TB: nation
    broadcasts twice (KB-scale), supplier broadcasts (the small side of
    its fact join), and the lineitem⋈orders⋈customer chain shuffles
    co-keyed on orderkey/custkey — the only big exchanges. The year
    extraction stays a pure expression so the grouped agg is one
    map-side-combined shuffle."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    vol = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(vol).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_SQL_TPCH_Q7 = f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  EXTRACT(year FROM l_shipdate) AS l_year,
  {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3"""


def _q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share, adapted to the testdata part
    schema: p_type is a single word): a target nation's share of ASIA's
    PROMO-part order volume by order year — the RATIO-OF-CONDITIONAL-
    AGGREGATES shape over a 7-table join. Both numerator and denominator
    ride ONE grouped aggregate (CASE-sum over the same shuffle); the
    share division happens after both exact-decimal sums, so engine
    summation order cannot move the ratio."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select("p_partkey")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA").select(
        "r_regionkey"
    )
    vol = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    target_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(target_vol) / dsum(vol)).alias("mkt_share"))
        .orderBy("o_year")
    )


_SQL_TPCH_Q8 = f"""SELECT EXTRACT(year FROM o_orderdate) AS o_year,
  {O.dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
  / {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS mkt_share
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = c_nationkey
JOIN region ON r_regionkey = n1.n_regionkey
JOIN nation n2 ON n2.n_nationkey = s_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1"""


def _q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one quarter — the GROUP-BY-WIDE-KEY + global
    top-k shape. The grouped agg shuffles once on the customer grain;
    the final top-20 is TakeOrdered (per-partition heaps merged on the
    driver, never a global sort). Deterministic LIMIT via the c_custkey
    tiebreak in both engines."""
    li = t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


_SQL_TPCH_Q10 = f"""SELECT c_custkey, c_name, c_acctbal, n_name,
  {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20"""


def _q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): the DOUBLE-
    AGGREGATION shape — count orders per customer through a LEFT join
    (customers with zero orders must appear), then histogram the counts.
    At 100 TB: one custkey-keyed shuffle serves both the outer join and
    the first aggregate (same key); the second aggregate's domain is
    |distinct counts| — trivially small."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_SQL_TPCH_Q13 = """SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey) cc
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC"""


def _q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO parts — a global (group-less) ratio of conditional
    exact-decimal aggregates over a date-pruned broadcast join. The
    shipdate filter reaches the lineitem scan (PushedFilters), part
    broadcasts, and both sums ride one map-side-combined aggregate; the
    ratio is computed after both sums so summation order cannot move
    it."""
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg((F.lit(100.0) * dsum(promo) / dsum(rev)).alias("promo_revenue"))
    )


_SQL_TPCH_Q14 = f"""SELECT 100.0 *
  {O.dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END")}
  / {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'"""


def _q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the AGGREGATE-OF-AGGREGATE shape — a
    revenue view per supplier, filtered to the rows equal to the view's
    own MAX (a scalar subquery over the aggregate). The max rides a
    broadcast join of a 1-row frame, so the plan stays declarative;
    revenue equality is exact because both engines sum through the same
    decimal grid. At 100 TB the revenue view is one suppkey-keyed
    map-side-combined shuffle; supplier broadcasts."""
    rev = (
        t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(
            F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
        ).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_SQL_TPCH_Q15 = f"""WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey"""


def _q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): the HAVING-driven IN-subquery
    shape — orders whose total line quantity exceeds a threshold, joined
    back to customer. Decorrelated the way Catalyst would: the
    per-orderkey quantity sum is computed ONCE (it is both the HAVING
    filter and the output column, orderkey → custkey being functional),
    then joins orders and broadcast-sized customer. Deterministic top-100
    via the orderkey tiebreak."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250.0)
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


_SQL_TPCH_Q18 = f"""SELECT c_custkey, c_name, o_orderkey,
  {O.dsum('l_quantity')} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING {O.dsum('l_quantity')} > 250.0)
GROUP BY c_custkey, c_name, o_orderkey
ORDER BY total_qty DESC, o_orderkey ASC
LIMIT 100"""


_Q20_NATIONS = ["NATION_3", "NATION_8", "NATION_13", "NATION_21", "NATION_24"]


def _q_tpch_q20_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-lite (r10 verdict #6): Q20's partsupp half is
    data-blocked (no partsupp table in the testdata), but its INNER
    shape — an IN-subquery over an aggregate-filtered slice (GROUP BY +
    HAVING under a date window), semi-joined to nation-filtered
    suppliers — has a lineitem-only analog: suppliers who shipped any
    (supplier, part) group totalling > 60 units in 1996-97, restricted
    to a nation set. Spark plan: the HAVING aggregate shuffles once on
    the composite key, projects the distinct suppkeys (grouped-key
    distinct is a no-shuffle second agg under AQE), then LEFT SEMI joins
    supplier (broadcast-sized) and broadcast-joins nation. At 100 TB
    the only big shuffle is the lineitem aggregate; everything after
    operates on supplier-cardinality rows."""
    li = t(spark, sf_dir, "lineitem")
    hot = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum("l_quantity").alias("qty"))
        .where(F.col("qty") > 60.0)
        .select("l_suppkey")
        .distinct()
    )
    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = t(spark, sf_dir, "nation").where(
        F.col("n_name").isin(_Q20_NATIONS)
    )
    return (
        sup.join(hot, sup.s_suppkey == hot.l_suppkey, "left_semi")
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy(F.col("s_name").asc(), F.col("s_suppkey").asc())
    )


_SQL_TPCH_Q20_LITE = f"""SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ({', '.join(repr(n) for n in _Q20_NATIONS)})
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING {O.dsum('l_quantity')} > 60.0)
ORDER BY s_name ASC, s_suppkey ASC"""


def _q_tpch_q2_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-lite: Q2's defining shape — a correlated scalar MIN
    subquery joined back to recover the rows achieving the minimum —
    with lineitem standing in for partsupp as the part×supplier price
    list (ps_supplycost is data-blocked). Decorrelated the way Catalyst
    would: the regional slice is computed ONCE, its per-part MIN is one
    grouped aggregate, and the join-back on (partkey, price = min)
    recovers every tying supplier. MIN over doubles is exact, so the
    equality join-back is cross-engine deterministic. At 100 TB the
    slice and its aggregate share the l_partkey shuffle key; part and
    the region chain broadcast."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    sup = t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    reg_dim = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    reg = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg_dim), nat.n_regionkey == reg_dim.r_regionkey)
        .select("l_partkey", "l_extendedprice", "s_name")
    )
    mins = reg.groupBy(
        F.col("l_partkey").alias("m_partkey")
    ).agg(F.min("l_extendedprice").alias("min_price"))
    small = t(spark, sf_dir, "part").where(F.col("p_size") <= 10).select(
        "p_partkey", "p_name"
    )
    return (
        reg.join(
            mins,
            (reg.l_partkey == mins.m_partkey)
            & (reg.l_extendedprice == mins.min_price),
        )
        .join(F.broadcast(small), reg.l_partkey == small.p_partkey)
        .select("p_partkey", "p_name", "s_name", "min_price")
        .distinct()
        .orderBy(
            F.col("min_price").asc(), F.col("p_partkey").asc(),
            F.col("s_name").asc(),
        )
        .limit(100)
    )


_SQL_TPCH_Q2_LITE = """WITH reg AS (
  SELECT l_partkey, l_extendedprice, s_name FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
SELECT DISTINCT p_partkey, p_name, s_name,
  l_extendedprice AS min_price
FROM reg JOIN part ON l_partkey = p_partkey
WHERE p_size <= 10 AND l_extendedprice = (
  SELECT MIN(r2.l_extendedprice) FROM reg r2
  WHERE r2.l_partkey = reg.l_partkey)
ORDER BY min_price ASC, p_partkey ASC, s_name ASC
LIMIT 100"""


def _q_tpch_q9_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-lite (product-type profit by nation and year, minus the
    data-blocked ps_supplycost term): revenue over a 5-table join for
    name-matched parts, grouped by supplier nation × order year — Q9's
    shape is the multi-dimension join tree whose group keys come from
    two different dimension arms. The only big shuffle is the final
    two-key aggregate (map-side combined); part/supplier/nation
    broadcast and the LIKE filter prunes before the orders join."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    widget = t(spark, sf_dir, "part").where(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        li.join(F.broadcast(widget), li.l_partkey == widget.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(rev).alias("revenue"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


_SQL_TPCH_Q9_LITE = f"""SELECT n_name AS nation,
  year(o_orderdate) AS o_year,
  {O.dsum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation ASC, o_year DESC"""


_Q11_NATIONS = ["NATION_1", "NATION_2", "NATION_3"]
_Q11_MULT = 2.0


def _q_tpch_q11_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-lite (important stock, lineitem standing in for the
    data-blocked partsupp): per-part value within a nation set, keeping
    parts whose value exceeds a multiple of the MEAN per-part value —
    Q11's grouped-agg-vs-uncorrelated-scalar-subquery shape, with the
    threshold made scale-invariant (Q11's own 0.0001/SF fraction scales
    with SF for the same reason; a fixed fraction of the global total
    empties at sf0.1). The threshold is a 1-row broadcast (never a
    driver round-trip in the plan); the per-part sums and their mean
    both ride the exact-decimal grid, so the comparison sees identical
    doubles in both engines."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = t(spark, sf_dir, "nation").where(
        F.col("n_name").isin(_Q11_NATIONS)
    ).select("n_nationkey")
    pv = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice").alias("part_value"))
    )
    thr = pv.agg(davg("part_value").alias("_avg"))
    return (
        pv.crossJoin(F.broadcast(thr))
        .where(F.col("part_value") > F.col("_avg") * _Q11_MULT)
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


_SQL_TPCH_Q11_LITE = f"""WITH pv AS (
  SELECT l_partkey, {O.dsum('l_extendedprice')} AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ({', '.join(repr(n) for n in _Q11_NATIONS)})
  GROUP BY l_partkey)
SELECT l_partkey, part_value
FROM pv
WHERE part_value > (SELECT {O.davg('part_value')} FROM pv) * {_Q11_MULT}
ORDER BY part_value DESC, l_partkey ASC"""


def _q_tpch_q16_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-lite (parts/supplier relationship, lineitem standing in
    for the data-blocked partsupp; negative account balance standing in
    for the complaints LIKE filter): distinct-supplier counts per part
    attribute pair, EXCLUDING a supplier set via anti-join — Q16's
    distinct-count-with-exclusion shape. The anti-join side is
    broadcast-sized; the count-distinct shuffles once on the composite
    attribute key (Spark plans distinct-agg as a two-phase expand)."""
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    pt = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bad = t(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
            F.col("p_size").asc(),
        )
    )


_SQL_TPCH_Q16_LITE = """SELECT p_brand, p_size,
  COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_size ASC"""


def _q_tpch_q21_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-lite (suppliers who kept orders waiting; late =
    l_shipdate > o_orderdate + 60 days, standing in for the data-blocked
    receipt/commit dates): count, per supplier, the late lines in
    multi-supplier orders where that supplier was the ONLY late one —
    Q21's semi + anti SELF-JOIN shape on the fact table. Spark plan:
    the late slice is computed once and reused for both sides; the
    EXISTS is a left-semi and the NOT-EXISTS a left-anti, each an
    equi-join on l_orderkey with the supplier-inequality as a residual
    condition — at 100 TB all three legs share the orderkey shuffle
    key, and supplier broadcasts for the name lookup."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey",
                                             "l_shipdate")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l1 = late.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = late.alias("l3")
    sup = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(sup), F.col("l1.l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


_SQL_TPCH_Q21_LITE = """WITH late AS (
  SELECT l_orderkey, l_suppkey FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY)
SELECT s_name, COUNT(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100"""


def _q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity, adapted: no phone prefixes
    in the testdata schema, so the anti-join keys on urgent orders):
    customers with above-global-average positive balance and NO urgent
    order — the UNCORRELATED-SCALAR-SUBQUERY + ANTI-JOIN shape. The
    global average is a 1-row broadcast (never a driver round-trip in
    the plan), the anti-join is a left_anti on custkey, and both
    cross-row double aggregates ride the exact-decimal grid."""
    cust = t(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("_avg")
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


_SQL_TPCH_Q22 = f"""SELECT COUNT(*) AS numcust,
  {O.dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT {O.davg('c_acctbal')} FROM customer
                   WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')"""


QUERIES = {
    "knn_l2": (_mk_knn("l2"), _sql_knn("l2")),
    "knn_cosine": (_mk_knn("cosine"), _sql_knn("cosine")),
    "knn_ip": (_mk_knn("ip"), _sql_knn("ip")),
    "knn_l1": (_mk_knn("l1"), _sql_knn("l1")),
    "knn_chebyshev": (_mk_knn("chebyshev"), _sql_knn("chebyshev")),
    "knn_squared_l2": (_mk_knn("squared_l2"), _sql_knn("squared_l2")),
    "knn_hamming": (_mk_knn("hamming"), _sql_knn("hamming")),
    "vector_norms": (_q_vector_norms, _sql_vector_norms()),
    "vector_avg_by_label": (_q_vector_avg_by_label, _SQL_VECTOR_AVG_BY_LABEL),
    "tpch_q1": (_q_tpch_q1, _SQL_TPCH_Q1),
    "tpch_q3_shipping": (_q_tpch_q3, _SQL_TPCH_Q3),
    "tpch_q4_priority": (_q_tpch_q4, _SQL_TPCH_Q4),
    "tpch_q5_local_supplier": (_q_tpch_q5, _SQL_TPCH_Q5),
    "tpch_q6_forecast": (_q_tpch_q6, _SQL_TPCH_Q6),
    "tpch_q7_volume_shipping": (_q_tpch_q7, _SQL_TPCH_Q7),
    "tpch_q8_market_share": (_q_tpch_q8, _SQL_TPCH_Q8),
    "tpch_q10_returned_items": (_q_tpch_q10, _SQL_TPCH_Q10),
    "tpch_q12_priority_classes": (_q_tpch_q12, _SQL_TPCH_Q12),
    "tpch_q13_customer_distribution": (_q_tpch_q13, _SQL_TPCH_Q13),
    "tpch_q14_promo_effect": (_q_tpch_q14, _SQL_TPCH_Q14),
    "tpch_q15_top_supplier": (_q_tpch_q15, _SQL_TPCH_Q15),
    "tpch_q17_small_qty": (_q_tpch_q17, _SQL_TPCH_Q17),
    "tpch_q18_large_volume": (_q_tpch_q18, _SQL_TPCH_Q18),
    "tpch_q19_disjunctive": (_q_tpch_q19, _SQL_TPCH_Q19),
    "tpch_q2_lite_min_price": (_q_tpch_q2_lite, _SQL_TPCH_Q2_LITE),
    "tpch_q9_lite_nation_profit": (_q_tpch_q9_lite, _SQL_TPCH_Q9_LITE),
    "tpch_q11_lite_important_parts": (_q_tpch_q11_lite, _SQL_TPCH_Q11_LITE),
    "tpch_q16_lite_supplier_counts": (_q_tpch_q16_lite, _SQL_TPCH_Q16_LITE),
    "tpch_q20_lite_hot_parts": (_q_tpch_q20_lite, _SQL_TPCH_Q20_LITE),
    "tpch_q21_lite_waiting_orders": (_q_tpch_q21_lite, _SQL_TPCH_Q21_LITE),
    "tpch_q22_sales_opportunity": (_q_tpch_q22, _SQL_TPCH_Q22),
    "top_revenue_customers": (_q_top_revenue_customers, _SQL_TOP_REVENUE_CUSTOMERS),
    "orders_topk_per_segment": (_q_orders_topk_per_segment, _SQL_ORDERS_TOPK_PER_SEGMENT),
    "faceted_vector_search": (_q_faceted_search, _sql_faceted_search()),
    "multi_vector_search": (_q_multi_vector_search, _sql_multi_vector_search()),
    "vec_window_rank": (_q_vec_window_rank, _sql_vec_window_rank()),
}
