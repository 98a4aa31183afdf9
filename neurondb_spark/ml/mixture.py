"""Exact fixed-iteration mixture-model EM under the hash gate.

The reference trains Gaussian mixtures with classic EM
(``NeuronDB/src/ml/ml_gmm.c:130`` ``cluster_gmm``: E-step
responsibilities at :262-273, M-step soft counts / weighted means at
:293-328).  Its Gaussian pdf (``gaussian_pdf`` :83) is transcendental
(exp), which cannot be made bit-identical across engines, so — like
``kmeans_fixed_lloyd`` twins the seeded MLlib trainer — this module
runs the SAME E/M alternation with a rational inverse-polynomial
(Student-t-family) kernel ``w_k / (c + ||x-mu_k||^2)^p`` in place of
the Gaussian: every step is +,-,*,/ over doubles plus
order-independent ``bsum`` aggregates, so the full TRAINING LOOP (not
just a frozen model) is reproduced bit-exactly by the DuckDB oracle
and sits under the hash gate next to the rows-only MLlib
``gmm_cluster_sizes``.  The kernel power is applied by nested exact
squarings (p a power of two) so both engines evaluate the identical
floating-point expression tree.

Scale: each EM round is one n·d·k exploded-join distance shuffle (the
same flops MLlib's dense GMM pays), one k-row parameter reduction, and
one n·d·k weighted re-aggregation — all map-side combined; the model
(k weights + k·d means) never exceeds a broadcast, and nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from neurondb_spark.functions.aggregates import bsum, davg
from neurondb_spark.ml.stats import _explode_vec


def _pow2_square(base: Column, power: int) -> Column:
    """base**power for power a power of two, by nested squaring —
    the exact expression tree the SQL twin builds."""
    out = base
    for _ in range(power.bit_length() - 1):
        out = out * out
    return out


def mixture_em_exact(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str = "label",
    k: int = 3,
    iters: int = 2,
    c: float = 0.25,
    power: int = 8,
) -> DataFrame:
    """Deterministic distributed EM for a rational-kernel mixture.

    Init: component means = the exact per-label decimal means of the k
    lowest labels (component number = label — the seeded-init analog of
    the reference's kmeans-initialised GMM), weights = 1/k.  Each
    round: E-step responsibilities ``r_ik = num_ik / sum_j num_ij``
    with ``num_ik = w_k/(c + d_ik)^p`` and ``d_ik`` the bsum-exact
    squared L2; M-step soft counts ``sw_k = bsum(r_ik)``, means
    ``bsum(r_ik·x_i)/sw_k``, weights ``sw_k/n``.  Returns the hard
    assignment (id, cluster) = argmax_k r_ik after the final E-step,
    ties to the lower component.
    """
    assert power & (power - 1) == 0, "power must be a power of two"
    ex = _explode_vec(df, vec_col, [id_col])
    seed = df.where(F.col(label_col) < k)
    cent = (
        seed.select(F.col(label_col).cast("int").alias("cluster"), id_col)
        .join(ex, id_col)
        .groupBy("cluster", "pos")
        .agg(davg("val").alias("cval"))
    )
    wts = (
        seed.select(F.col(label_col).cast("int").alias("cluster"))
        .distinct()
        .select("cluster", F.lit(1.0 / k).alias("w"))
    )
    n_df = df.agg(F.count(F.lit(1)).cast("double").alias("n"))
    resp = None
    for it in range(iters):
        d = (
            ex.join(cent, "pos")
            .groupBy(id_col, "cluster")
            .agg(bsum((F.col("val") - F.col("cval"))
                      * (F.col("val") - F.col("cval"))).alias("dist"))
        )
        kern = _pow2_square(F.lit(float(c)) + F.col("dist"), power)
        num = d.join(wts, "cluster").withColumn("num", F.col("w") / kern)
        den = num.groupBy(id_col).agg(bsum("num").alias("den"))
        resp = num.join(den, id_col).withColumn(
            "r", F.col("num") / F.col("den")
        )
        if it < iters - 1:
            sw = resp.groupBy("cluster").agg(bsum("r").alias("sw"))
            sxw = (
                resp.join(ex, id_col)
                .groupBy("cluster", "pos")
                .agg(bsum(F.col("r") * F.col("val")).alias("sxw"))
            )
            cent = sxw.join(sw, "cluster").select(
                "cluster", "pos", (F.col("sxw") / F.col("sw")).alias("cval")
            )
            wts = sw.crossJoin(n_df).select(
                "cluster", (F.col("sw") / F.col("n")).alias("w")
            )
    w_rank = W.partitionBy(id_col).orderBy(
        F.col("r").desc(), F.col("cluster").asc()
    )
    return (
        resp.withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") == 1)
        .select(id_col, "cluster")
    )


def sql_mixture_em_exact(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 3,
    iters: int = 2,
    c: float = 0.25,
    power: int = 8,
) -> str:
    """DuckDB twin of :func:`mixture_em_exact` — identically-unrolled
    CTE chain (one d/num/den/r block per E-step, sw/sxw/c/w between)."""
    from neurondb_spark import oracle as O

    assert power & (power - 1) == 0
    dist = O.bsum("(ex.val - c.cval) * (ex.val - c.cval)")
    kern = f"({c!r} + d.dist)"
    for _ in range(power.bit_length() - 1):
        kern = f"({kern} * {kern})"
    steps = []
    prev_cent, prev_w = "c0", "w0"
    for it in range(1, iters + 1):
        steps.append(f"""d{it} AS (
  SELECT ex.{id_col}, c.cluster, {dist} AS dist
  FROM ex JOIN {prev_cent} c ON ex.pos = c.pos
  GROUP BY ex.{id_col}, c.cluster),
num{it} AS (
  SELECT d.{id_col}, d.cluster, w.w / {kern} AS num
  FROM d{it} d JOIN {prev_w} w ON w.cluster = d.cluster),
den{it} AS (
  SELECT {id_col}, {O.bsum('num')} AS den FROM num{it} GROUP BY {id_col}),
r{it} AS (
  SELECT n.{id_col}, n.cluster, n.num / dd.den AS r
  FROM num{it} n JOIN den{it} dd ON dd.{id_col} = n.{id_col})""")
        if it < iters:
            steps.append(f"""sw{it} AS (
  SELECT cluster, {O.bsum('r')} AS sw FROM r{it} GROUP BY cluster),
sxw{it} AS (
  SELECT r.cluster, e.pos, {O.bsum('r.r * e.val')} AS sxw
  FROM r{it} r JOIN ex e ON e.{id_col} = r.{id_col}
  GROUP BY r.cluster, e.pos),
c{it} AS (
  SELECT x.cluster, x.pos, x.sxw / s.sw AS cval
  FROM sxw{it} x JOIN sw{it} s ON s.cluster = x.cluster),
w{it} AS (
  SELECT s.cluster, s.sw / nn.n AS w FROM sw{it} s, nn)""")
        prev_cent, prev_w = f"c{it}", f"w{it}"
    return f"""WITH ex AS MATERIALIZED (
  SELECT {id_col},
         CAST(generate_subscripts({vec_col}, 1) AS INTEGER) AS pos,
         CAST(unnest({vec_col}) AS DOUBLE) AS val
  FROM {table}),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM {table}),
c0 AS (
  SELECT CAST(e.{label_col} AS INTEGER) AS cluster, x.pos,
         {O.davg('x.val')} AS cval
  FROM {table} e JOIN ex x ON x.{id_col} = e.{id_col}
  WHERE e.{label_col} < {k}
  GROUP BY e.{label_col}, x.pos),
w0 AS (
  SELECT DISTINCT CAST({label_col} AS INTEGER) AS cluster, (1.0 / {k}) AS w
  FROM {table} WHERE {label_col} < {k}),
{', '.join(steps)}
SELECT {id_col}, cluster FROM (
  SELECT {id_col}, cluster,
         ROW_NUMBER() OVER (PARTITION BY {id_col}
                            ORDER BY r DESC, cluster ASC) AS rn
  FROM r{iters}) WHERE rn = 1"""
