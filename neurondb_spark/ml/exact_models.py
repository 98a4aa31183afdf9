"""Closed-form / exact-arithmetic model trainers that graduate ML
families from pytest-only to hash-checked oracles (reference records
exact model metrics the same way, e.g.
NeuronDB/tests/sql/basic/001_linreg_basic.sql and the ridge/NB paths of
NeuronDB/src/ml/ml_catalog.c — here re-derived as pure SQL-replayable
arithmetic so a DuckDB oracle can replay training bit-for-bit).

Every formula below uses only +,-,*,/ on IEEE doubles (plus
decimal-exact `dsum` input sums), evaluated in an identical association
order by Spark and the oracle — no libm transcendentals, so the hash
gate can check the full training loop, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from neurondb_spark.functions.aggregates import dsum
from neurondb_spark.functions.text import sql_tokenize, tokenize


def ridge_closed_form(
    df: DataFrame, x1_col: str, x2_col: str, y_col: str, lam: float = 1.0
) -> DataFrame:
    """Ridge regression for y ~ 1 + x1 + x2 via the normal equations
    (X'X + λI)β = X'y, solved with an explicit 3×3 cofactor inverse.

    λ penalizes all three coefficients including the intercept (the
    symmetric form keeps the algebra engine-replayable; reference ridge
    is ml_catalog's L2 path). Sums are decimal-exact (`dsum`) then cast
    to double; the cofactor arithmetic is a fixed expression tree, so
    any engine computing the same tree returns bit-identical betas.

    Scale: ONE aggregation pass over the fact table (map-side combined)
    produces the 9 sufficient statistics; the solve is O(1) on those.
    This is the textbook sufficient-statistics shape — at 100 TB the
    only cost is the scan.
    """
    x1, x2, y = F.col(x1_col), F.col(x2_col), F.col(y_col)
    agg = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(x1).alias("sx1"),
        dsum(x2).alias("sx2"),
        dsum(y).alias("sy"),
        dsum(x1 * x1).alias("sx11"),
        dsum(x1 * x2).alias("sx12"),
        dsum(x2 * x2).alias("sx22"),
        dsum(x1 * y).alias("sx1y"),
        dsum(x2 * y).alias("sx2y"),
    )
    L = F.lit(float(lam))
    # A = [[n+λ, sx1, sx2], [sx1, sx11+λ, sx12], [sx2, sx12, sx22+λ]]
    stage = agg.select(
        (F.col("n") + L).alias("a"),
        F.col("sx1").alias("b"),
        F.col("sx2").alias("c"),
        (F.col("sx11") + L).alias("d"),
        F.col("sx12").alias("e"),
        (F.col("sx22") + L).alias("f"),
        F.col("sy").alias("p"),
        F.col("sx1y").alias("q"),
        F.col("sx2y").alias("r"),
    )
    cof = stage.select(
        "*",
        (F.col("d") * F.col("f") - F.col("e") * F.col("e")).alias("c11"),
        (F.col("c") * F.col("e") - F.col("b") * F.col("f")).alias("c12"),
        (F.col("b") * F.col("e") - F.col("c") * F.col("d")).alias("c13"),
        (F.col("a") * F.col("f") - F.col("c") * F.col("c")).alias("c22"),
        (F.col("b") * F.col("c") - F.col("a") * F.col("e")).alias("c23"),
        (F.col("a") * F.col("d") - F.col("b") * F.col("b")).alias("c33"),
    )
    det = (
        F.col("a") * F.col("c11")
        + F.col("b") * F.col("c12")
        + F.col("c") * F.col("c13")
    )
    out = cof.select(
        "*",
        det.alias("det"),
    )
    return out.select(
        F.lit(float(lam)).alias("lam"),
        (
            (F.col("c11") * F.col("p") + F.col("c12") * F.col("q")
             + F.col("c13") * F.col("r")) / F.col("det")
        ).alias("beta0"),
        (
            (F.col("c12") * F.col("p") + F.col("c22") * F.col("q")
             + F.col("c23") * F.col("r")) / F.col("det")
        ).alias("beta1"),
        (
            (F.col("c13") * F.col("p") + F.col("c23") * F.col("q")
             + F.col("c33") * F.col("r")) / F.col("det")
        ).alias("beta2"),
    )


def sql_ridge_closed_form(
    table: str, x1: str, x2: str, y: str, lam: float, dsum_sql
) -> str:
    """DuckDB oracle replaying :func:`ridge_closed_form`'s exact tree.

    λ is emitted as a string-cast double literal (``CAST('…' AS DOUBLE)``)
    — DuckDB parses bare decimals as DECIMAL, which would diverge from
    Spark's double literal."""
    lam = f"CAST('{float(lam)!r}' AS DOUBLE)"
    return f"""WITH s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql(x1)} AS sx1, {dsum_sql(x2)} AS sx2, {dsum_sql(y)} AS sy,
         {dsum_sql(f'{x1} * {x1}')} AS sx11,
         {dsum_sql(f'{x1} * {x2}')} AS sx12,
         {dsum_sql(f'{x2} * {x2}')} AS sx22,
         {dsum_sql(f'{x1} * {y}')} AS sx1y,
         {dsum_sql(f'{x2} * {y}')} AS sx2y
  FROM {table}),
m AS (
  SELECT n + {lam} AS a, sx1 AS b, sx2 AS c,
         sx11 + {lam} AS d, sx12 AS e, sx22 + {lam} AS f,
         sy AS p, sx1y AS q, sx2y AS r
  FROM s),
cf AS (
  SELECT *,
         d * f - e * e AS c11,
         c * e - b * f AS c12,
         b * e - c * d AS c13,
         a * f - c * c AS c22,
         b * c - a * e AS c23,
         a * d - b * b AS c33
  FROM m),
dt AS (SELECT *, a * c11 + b * c12 + c * c13 AS det FROM cf)
SELECT {lam} AS lam,
       (c11 * p + c12 * q + c13 * r) / det AS beta0,
       (c12 * p + c22 * q + c23 * r) / det AS beta1,
       (c13 * p + c23 * q + c33 * r) / det AS beta2
FROM dt"""


def bernoulli_nb_predict(
    df: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    features: list[str],
) -> DataFrame:
    """Bernoulli Naive Bayes over token-presence features, trained and
    applied in one plan (resubstitution predict, the reference's
    train+predict demo shape). Laplace-smoothed:

        p(f|c)   = (present_c + 1) / (n_c + 2)
        score(c) = (n_c / N) · Π_f [p(f|c) if present else 1 − p(f|c)]

    The product folds in the FIXED feature order with left association;
    every factor is an exact small-integer ratio, so both engines
    produce bit-identical doubles and the argmax (tie → lexicographic
    class) is hash-checkable — no libm log anywhere.

    Scale: training is one groupBy(label) with map-side combine (per
    class: count + one presence-sum per feature); the model is
    classes×features scalars → broadcast; predict is a codegen'd
    expression per row + a per-row argmax window over |classes| rows.
    """
    present = [
        F.array_contains(tokenize(text_col), w).cast("int").alias(f"_p{i}")
        for i, w in enumerate(features)
    ]
    base = df.select(F.col(id_col), F.col(label_col), *present)
    model = base.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("n_c"),
        *[F.sum(f"_p{i}").alias(f"_c{i}") for i in range(len(features))],
    )
    n_total = df.count()
    scored = base.drop(label_col).crossJoin(
        F.broadcast(model.withColumnRenamed(label_col, "cls"))
    )
    score = F.col("n_c").cast("double") / F.lit(float(n_total))
    for i in range(len(features)):
        cnt = F.col(f"_c{i}").cast("double")
        den = (F.col("n_c") + 2).cast("double")
        pf = (cnt + 1.0) / den
        qf = ((F.col("n_c").cast("double") - cnt) + 1.0) / den
        score = score * F.when(F.col(f"_p{i}") == 1, pf).otherwise(qf)
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    return (
        scored.select(F.col(id_col), F.col("cls"), score.alias("score"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("cls").alias("predicted"),
            F.col("score").alias("posterior_score"),
        )
    )


def sql_bernoulli_nb_predict(
    table: str, text: str, label: str, id_col: str, features: list[str]
) -> str:
    """DuckDB oracle replaying :func:`bernoulli_nb_predict` exactly."""
    toks = sql_tokenize(text)
    pres_cols = ",\n         ".join(
        f"CAST(list_contains({toks}, '{w}') AS INT) AS _p{i}"
        for i, w in enumerate(features)
    )
    cnt_cols = ",\n         ".join(
        f"SUM(_p{i}) AS _c{i}" for i in range(len(features))
    )
    factors = ""
    for i in range(len(features)):
        pf = f"(CAST(_c{i} AS DOUBLE) + 1.0) / CAST(n_c + 2 AS DOUBLE)"
        qf = (f"((CAST(n_c AS DOUBLE) - CAST(_c{i} AS DOUBLE)) + 1.0)"
              f" / CAST(n_c + 2 AS DOUBLE)")
        factors += (f" * (CASE WHEN _p{i} = 1 THEN {pf} ELSE {qf} END)")
    return f"""WITH base AS (
  SELECT {id_col}, {label},
         {pres_cols}
  FROM {table}),
model AS (
  SELECT {label} AS cls, COUNT(*) AS n_c,
         {cnt_cols}
  FROM base GROUP BY {label}),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM {table}),
scored AS (
  SELECT b.{id_col} AS {id_col}, m.cls,
         ((CAST(m.n_c AS DOUBLE) / t.n){factors}) AS score
  FROM base b CROSS JOIN model m CROSS JOIN tot t),
ranked AS (
  SELECT {id_col}, cls, score,
         ROW_NUMBER() OVER (PARTITION BY {id_col}
                            ORDER BY score DESC, cls ASC) AS _rn
  FROM scored)
SELECT {id_col}, cls AS predicted, score AS posterior_score
FROM ranked WHERE _rn = 1"""


def regression_eval_exact(
    df: DataFrame, y_col: str, yhat_col: str
) -> DataFrame:
    """Exact regression evaluation metrics (the reference's
    evaluate_*_by_model_id metric set, ml_linear_regression.c:3082):
    mse / rmse / mae / r² over (y, ŷ) pairs, all from decimal-exact
    sufficient sums — one aggregation pass, engine-replayable.

    r² = 1 − ss_res/ss_tot with ss_tot = Σy² − (Σy)²/n (computational
    form — identical association in the oracle)."""
    y, yh = F.col(y_col), F.col(yhat_col)
    res = y - yh
    agg = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(res * res).alias("ss_res"),
        dsum(F.abs(res)).alias("s_abs"),
        dsum(y).alias("sy"),
        dsum(y * y).alias("syy"),
    )
    mse = F.col("ss_res") / F.col("n")
    ss_tot = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        mse.alias("mse"),
        F.sqrt(mse).alias("rmse"),
        (F.col("s_abs") / F.col("n")).alias("mae"),
        (1.0 - F.col("ss_res") / ss_tot).alias("r2"),
    )


def sql_regression_eval_exact(
    pred_cte: str, y: str, yhat: str, dsum_sql
) -> str:
    """DuckDB oracle for :func:`regression_eval_exact`; ``pred_cte`` is a
    WITH-body fragment producing the (y, yhat) relation named ``pred``."""
    return f"""WITH {pred_cte},
ag AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         {dsum_sql(f'({y} - {yhat}) * ({y} - {yhat})')} AS ss_res,
         {dsum_sql(f'abs({y} - {yhat})')} AS s_abs,
         {dsum_sql(y)} AS sy,
         {dsum_sql(f'{y} * {y}')} AS syy
  FROM pred)
SELECT CAST(n AS BIGINT) AS n,
       ss_res / n AS mse,
       sqrt(ss_res / n) AS rmse,
       s_abs / n AS mae,
       (1.0 - ss_res / (syy - sy * sy / n)) AS r2
FROM ag"""


def classification_eval_exact(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """Exact per-class classification metrics (the reference's
    accuracy/precision/recall/f1 evaluation set): for every true class,
    tp / fp / fn counts and the derived ratios, with the reference's
    1e-10 zero-guard on f1 (ml_recall_metrics.c:192-254). Integer counts
    + IEEE division → bit-replayable.

    Scale: two small groupBy passes over (label, pred) count cells —
    map-side combined; output is |classes| rows."""
    cells = df.groupBy(label_col, pred_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    tp = (
        cells.where(F.col(label_col) == F.col(pred_col))
        .select(F.col(label_col).alias("cls"), F.col("_c").alias("tp"))
    )
    actual = cells.groupBy(label_col).agg(F.sum("_c").alias("n_actual"))
    predicted = cells.groupBy(pred_col).agg(F.sum("_c").alias("n_pred"))
    base = (
        actual.select(F.col(label_col).alias("cls"), "n_actual")
        .join(predicted.select(F.col(pred_col).alias("cls"), "n_pred"), "cls",
              "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            F.coalesce(F.col("n_actual"), F.lit(0)).alias("n_actual"),
            F.coalesce(F.col("n_pred"), F.lit(0)).alias("n_pred"),
        )
    )
    prec = F.when(F.col("n_pred") == 0, F.lit(0.0)).otherwise(
        F.col("tp").cast("double") / F.col("n_pred").cast("double")
    )
    rec = F.when(F.col("n_actual") == 0, F.lit(0.0)).otherwise(
        F.col("tp").cast("double") / F.col("n_actual").cast("double")
    )
    out = base.select(
        "cls", "tp", "n_actual", "n_pred",
        prec.alias("precision"), rec.alias("recall"),
    )
    f1 = F.when(
        F.col("precision") + F.col("recall") < 1e-10, F.lit(0.0)
    ).otherwise(
        2.0 * (F.col("precision") * F.col("recall"))
        / (F.col("precision") + F.col("recall"))
    )
    return out.select("*", f1.alias("f1"))


def sql_classification_eval_exact(pred_cte: str, label: str, pred: str) -> str:
    """DuckDB oracle for :func:`classification_eval_exact`; ``pred_cte``
    produces the (label, pred) relation named ``pred_rel``."""
    return f"""WITH {pred_cte},
cells AS (
  SELECT {label} AS lbl, {pred} AS prd, COUNT(*) AS _c
  FROM pred_rel GROUP BY 1, 2),
tp AS (SELECT lbl AS cls, _c AS tp FROM cells WHERE lbl = prd),
act AS (SELECT lbl AS cls, CAST(SUM(_c) AS BIGINT) AS n_actual
        FROM cells GROUP BY 1),
prd AS (SELECT prd AS cls, CAST(SUM(_c) AS BIGINT) AS n_pred
        FROM cells GROUP BY 1),
base AS (
  SELECT COALESCE(a.cls, p.cls) AS cls,
         COALESCE(t.tp, 0) AS tp,
         COALESCE(a.n_actual, 0) AS n_actual,
         COALESCE(p.n_pred, 0) AS n_pred
  FROM act a FULL OUTER JOIN prd p ON a.cls = p.cls
  LEFT JOIN tp t ON COALESCE(a.cls, p.cls) = t.cls),
m AS (
  SELECT cls, tp, n_actual, n_pred,
         CASE WHEN n_pred = 0 THEN 0.0
              ELSE CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS precision,
         CASE WHEN n_actual = 0 THEN 0.0
              ELSE CAST(tp AS DOUBLE) / CAST(n_actual AS DOUBLE) END AS recall
  FROM base)
SELECT cls, tp, n_actual, n_pred, precision, recall,
       CASE WHEN precision + recall < 1e-10 THEN 0.0
            ELSE 2.0 * (precision * recall) / (precision + recall) END AS f1
FROM m"""


def silhouette_simplified(
    df: DataFrame, vec_col: str, id_col: str, k: int = 4, iters: int = 2
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster over the
    oracle-exact Lloyd assignments: a(i) = ||x_i − c_own||,
    b(i) = min over other clusters ||x_i − c||, s = (b−a)/max(a,b)
    (0 when both are 0). Returns (cluster, n_points, avg_silhouette)
    with a decimal-exact mean — the clustering-quality metric family
    next to davies_bouldin (reference ClusteringEvaluator analog, the
    O(n·k) variant every engine uses at scale instead of O(n²) exact
    silhouette).

    Scale: distances come from one exploded join against the k·d
    centroid frame (broadcast), grouped per (row, cluster) — same
    allreduce shape as the Lloyd iteration itself."""
    from neurondb_spark.functions.aggregates import bsum, davg
    from neurondb_spark.ml.stats import _explode_vec, kmeans_lloyd_exact

    assign = kmeans_lloyd_exact(df, vec_col, id_col, k=k, iters=iters)
    ex = _explode_vec(df, vec_col, [id_col])
    cent = (
        assign.join(ex, id_col)
        .groupBy("cluster", "pos")
        .agg(davg("val").alias("cval"))
    )
    d = (
        ex.join(cent.withColumnRenamed("cluster", "cl"), "pos")
        .groupBy(id_col, "cl")
        .agg(bsum((F.col("val") - F.col("cval"))
                  * (F.col("val") - F.col("cval"))).alias("sq"))
        .select(id_col, "cl", F.sqrt(F.col("sq")).alias("dist"))
    )
    j = d.join(assign, id_col)
    own = j.where(F.col("cl") == F.col("cluster")).select(
        id_col, "cluster", F.col("dist").alias("a")
    )
    other = (
        j.where(F.col("cl") != F.col("cluster"))
        .groupBy(id_col)
        .agg(F.min("dist").alias("b"))
    )
    mx = F.greatest(F.col("a"), F.col("b"))
    s = own.join(other, id_col).select(
        "cluster",
        F.when(mx == 0.0, F.lit(0.0))
        .otherwise((F.col("b") - F.col("a")) / mx)
        .alias("s"),
    )
    return s.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        davg("s").alias("avg_silhouette"),
    )


def sql_silhouette_simplified(kmeans_sql: str, davg_sql, bsum_sql) -> str:
    """DuckDB oracle replaying :func:`silhouette_simplified`.

    ``kmeans_sql`` is the full oracle statement for the assignments,
    ending in ``SELECT vec_id, cluster FROM a2``; its final SELECT is
    spliced off and the silhouette CTEs are appended to the SAME WITH
    chain (DuckDB rejects a nested WITH that redefines the outer ``ex``
    CTE, and reusing the chain also shares the exploded frame)."""
    prefix, final = kmeans_sql.rsplit("\nSELECT", 1)
    assert final.strip() == "vec_id, cluster FROM a2", final
    sq = bsum_sql("(ex.val - c.cval) * (ex.val - c.cval)")
    return f"""{prefix},
asg AS (SELECT vec_id, cluster FROM a2),
c2 AS (
  SELECT a.cluster, e.pos, {davg_sql('e.val')} AS cval
  FROM asg a JOIN ex e ON e.vec_id = a.vec_id
  GROUP BY a.cluster, e.pos),
dall AS (
  SELECT ex.vec_id, c.cluster AS cl, sqrt({sq}) AS dist
  FROM ex JOIN c2 c ON ex.pos = c.pos
  GROUP BY ex.vec_id, c.cluster),
own AS (
  SELECT d.vec_id, g.cluster, d.dist AS a
  FROM dall d JOIN asg g ON d.vec_id = g.vec_id AND d.cl = g.cluster),
oth AS (
  SELECT d.vec_id, MIN(d.dist) AS b
  FROM dall d JOIN asg g ON d.vec_id = g.vec_id AND d.cl <> g.cluster
  GROUP BY d.vec_id),
sil AS (
  SELECT o.cluster,
         CASE WHEN greatest(o.a, t.b) = 0.0 THEN 0.0
              ELSE (t.b - o.a) / greatest(o.a, t.b) END AS s
  FROM own o JOIN oth t USING (vec_id))
SELECT cluster, COUNT(*) AS n_points, {davg_sql('s')} AS avg_silhouette
FROM sil GROUP BY cluster"""
