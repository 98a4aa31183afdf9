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

from neurondb_spark.functions.aggregates import bsum, dsum
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
    form — identical association in the oracle).

    Residual sums use NORMALIZED binary fixed-point (`bsum` of res²/n):
    raw Σres² at price-scale magnitudes needs ~15-16 significant
    decimal digits, where the decimal(38,6) cast paths of the two
    engines can disagree by one grid unit (observed at sf0.001). Per-row
    division by n is engine-identical IEEE, keeps every addend at the
    magnitude of the FINAL metric (so the fixed-point range holds at
    any scale factor), and the power-of-two bsum grid has no
    cross-engine rounding ambiguity. y-term sums keep the proven dsum
    path (same construction as the long-green linreg oracle)."""
    y, yh = F.col(y_col), F.col(yhat_col)
    res = y - yh
    n_rows = float(df.count())
    nlit = F.lit(n_rows)
    agg = df.agg(
        bsum(res * res / nlit, bits=28).alias("mse"),
        bsum(F.abs(res) / nlit, bits=28).alias("mae"),
        dsum(y).alias("sy"),
        dsum(y * y).alias("syy"),
    )
    n = F.lit(n_rows)
    ss_tot = F.col("syy") - F.col("sy") * F.col("sy") / n
    return agg.select(
        n.cast("bigint").alias("n"),
        F.col("mse").alias("mse"),
        F.sqrt(F.col("mse")).alias("rmse"),
        F.col("mae").alias("mae"),
        (1.0 - F.col("mse") * n / ss_tot).alias("r2"),
    )


def sql_regression_eval_exact(
    pred_cte: str, y: str, yhat: str, dsum_sql
) -> str:
    """DuckDB oracle for :func:`regression_eval_exact`; ``pred_cte`` is a
    WITH-body fragment producing the (y, yhat) relation named ``pred``."""
    from neurondb_spark.oracle import bsum as bsum_sql

    return f"""WITH {pred_cte},
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM pred),
ag AS (
  SELECT
    {bsum_sql(f'(({y} - {yhat}) * ({y} - {yhat})) / (SELECT n FROM nn)', bits=28)} AS mse,
    {bsum_sql(f'abs({y} - {yhat}) / (SELECT n FROM nn)', bits=28)} AS mae,
    {dsum_sql(y)} AS sy,
    {dsum_sql(f'{y} * {y}')} AS syy
  FROM pred)
SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n,
       mse,
       sqrt(mse) AS rmse,
       mae,
       (1.0 - mse * (SELECT n FROM nn)
              / (syy - sy * sy / (SELECT n FROM nn))) AS r2
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
    # (r15) assign is consumed by the centroid rebuild AND the silhouette
    # join; persist (not localCheckpoint) dedupes the Lloyd chain while
    # keeping catalyst stats, so the small frame still broadcasts
    assign = assign.persist()
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
        .persist()  # (r15) own-distance and min-other both consume d
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
    out = s.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_points"),
        davg("s").alias("avg_silhouette"),
    )
    # (r16) the result is k rows: materialize it here so both persisted
    # frames can be released before returning — no cached partitions
    # outlive the query on a long-lived session (same total work; the
    # caller's action replays the checkpointed rows)
    try:
        out = out.localCheckpoint(eager=True)
    finally:
        d.unpersist()
        assign.unpersist()
    return out


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


def _with_cofactor_betas(df: DataFrame) -> DataFrame:
    """Append beta0/beta1/beta2 to a frame carrying the normal-equation
    matrix columns (a,b,c,d,e,f = packed symmetric X'X+λI; p,q,r = X'y)
    via the explicit 3×3 cofactor inverse — the shared solve for ridge,
    grid search, and CV. Fixed expression tree → engine-replayable."""
    cof = df.select(
        "*",
        (F.col("d") * F.col("f") - F.col("e") * F.col("e")).alias("c11"),
        (F.col("c") * F.col("e") - F.col("b") * F.col("f")).alias("c12"),
        (F.col("b") * F.col("e") - F.col("c") * F.col("d")).alias("c13"),
        (F.col("a") * F.col("f") - F.col("c") * F.col("c")).alias("c22"),
        (F.col("b") * F.col("c") - F.col("a") * F.col("e")).alias("c23"),
        (F.col("a") * F.col("d") - F.col("b") * F.col("b")).alias("c33"),
    )
    dt = cof.select(
        "*",
        (F.col("a") * F.col("c11") + F.col("b") * F.col("c12")
         + F.col("c") * F.col("c13")).alias("det"),
    )
    return dt.select(
        "*",
        ((F.col("c11") * F.col("p") + F.col("c12") * F.col("q")
          + F.col("c13") * F.col("r")) / F.col("det")).alias("beta0"),
        ((F.col("c12") * F.col("p") + F.col("c22") * F.col("q")
          + F.col("c23") * F.col("r")) / F.col("det")).alias("beta1"),
        ((F.col("c13") * F.col("p") + F.col("c23") * F.col("q")
          + F.col("c33") * F.col("r")) / F.col("det")).alias("beta2"),
    )


_SQL_COF = """cf AS (
  SELECT *,
         d * f - e * e AS c11,
         c * e - b * f AS c12,
         b * e - c * d AS c13,
         a * f - c * c AS c22,
         b * c - a * e AS c23,
         a * d - b * b AS c33
  FROM m),
dt AS (SELECT *, a * c11 + b * c12 + c * c13 AS det FROM cf),
bt AS (
  SELECT *,
         (c11 * p + c12 * q + c13 * r) / det AS beta0,
         (c12 * p + c22 * q + c23 * r) / det AS beta1,
         (c13 * p + c23 * q + c33 * r) / det AS beta2
  FROM dt)"""


def _ss_res_expansion():
    """Σ(y − β0 − β1x1 − β2x2)² expanded in the 9 sufficient statistics
    (columns sn, ssy, ssyy, ssx1, ssx2, ssx11, ssx12, ssx22, ssx1y,
    ssx2y) — residual sum of squares WITHOUT a second data pass. One
    fixed left-assoc chain, replayed verbatim by the SQL twin."""
    b0, b1, b2 = F.col("beta0"), F.col("beta1"), F.col("beta2")
    return (
        F.col("ssyy")
        + b0 * b0 * F.col("sn")
        + b1 * b1 * F.col("ssx11")
        + b2 * b2 * F.col("ssx22")
        - 2.0 * b0 * F.col("ssy")
        - 2.0 * b1 * F.col("ssx1y")
        - 2.0 * b2 * F.col("ssx2y")
        + 2.0 * b0 * b1 * F.col("ssx1")
        + 2.0 * b0 * b2 * F.col("ssx2")
        + 2.0 * b1 * b2 * F.col("ssx12")
    )


_SQL_SS_RES = """(ssyy
  + beta0 * beta0 * sn
  + beta1 * beta1 * ssx11
  + beta2 * beta2 * ssx22
  - 2.0 * beta0 * ssy
  - 2.0 * beta1 * ssx1y
  - 2.0 * beta2 * ssx2y
  + 2.0 * beta0 * beta1 * ssx1
  + 2.0 * beta0 * beta2 * ssx2
  + 2.0 * beta1 * beta2 * ssx12)"""


def _ridge_stats(df: DataFrame, x1_col: str, x2_col: str, y_col: str,
                 group: list[str] | None = None) -> DataFrame:
    """The 10 ridge sufficient statistics (optionally per group)."""
    x1, x2, y = F.col(x1_col), F.col(x2_col), F.col(y_col)
    aggs = [
        F.count(F.lit(1)).cast("double").alias("sn"),
        dsum(x1).alias("ssx1"), dsum(x2).alias("ssx2"), dsum(y).alias("ssy"),
        dsum(x1 * x1).alias("ssx11"), dsum(x1 * x2).alias("ssx12"),
        dsum(x2 * x2).alias("ssx22"), dsum(x1 * y).alias("ssx1y"),
        dsum(x2 * y).alias("ssx2y"), dsum(y * y).alias("ssyy"),
    ]
    return df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)


def _sql_ridge_stats(table: str, x1: str, x2: str, y: str, dsum_sql,
                     group: str | None = None, prefix: str = "s") -> str:
    g = f"{group}, " if group else ""
    body = f"""SELECT {g}CAST(COUNT(*) AS DOUBLE) AS {prefix}n,
         {dsum_sql(x1)} AS {prefix}sx1, {dsum_sql(x2)} AS {prefix}sx2,
         {dsum_sql(y)} AS {prefix}sy,
         {dsum_sql(f'{x1} * {x1}')} AS {prefix}sx11,
         {dsum_sql(f'{x1} * {x2}')} AS {prefix}sx12,
         {dsum_sql(f'{x2} * {x2}')} AS {prefix}sx22,
         {dsum_sql(f'{x1} * {y}')} AS {prefix}sx1y,
         {dsum_sql(f'{x2} * {y}')} AS {prefix}sx2y,
         {dsum_sql(f'{y} * {y}')} AS {prefix}syy
  FROM {table}"""
    return body + (f"\n  GROUP BY {group}" if group else "")


def ridge_grid_rmse(
    df: DataFrame, x1_col: str, x2_col: str, y_col: str, lams: list[float]
) -> DataFrame:
    """Grid search over ridge λ in ONE scan: the sufficient statistics
    are computed once, every λ's betas come from the shared cofactor
    solve, and the training RMSE per λ comes from the algebraic
    expansion of Σ(y−ŷ)² in those same statistics — grid size costs
    nothing extra (the reference's neurondb_grid_search surface,
    ml_hyperparameter_tuning.c:39).

    Scale: one aggregation pass over the fact table; the grid lives on
    |λ| rows. This is THE shape for hyperparameter sweeps at 100 TB —
    never one training scan per candidate when the model is
    sufficient-statistics-trainable."""
    spark = df.sparkSession
    stats = _ridge_stats(df, x1_col, x2_col, y_col)
    lam_df = spark.createDataFrame([(float(l),) for l in lams], "lam double")
    g = lam_df.crossJoin(F.broadcast(stats))
    m = g.select(
        "*",
        (F.col("sn") + F.col("lam")).alias("a"),
        F.col("ssx1").alias("b"), F.col("ssx2").alias("c"),
        (F.col("ssx11") + F.col("lam")).alias("d"),
        F.col("ssx12").alias("e"),
        (F.col("ssx22") + F.col("lam")).alias("f"),
        F.col("ssy").alias("p"), F.col("ssx1y").alias("q"),
        F.col("ssx2y").alias("r"),
    )
    bt = _with_cofactor_betas(m)
    return bt.select(
        "lam",
        F.sqrt(_ss_res_expansion() / F.col("sn")).alias("train_rmse"),
    )


def sql_ridge_grid_rmse(
    table: str, x1: str, x2: str, y: str, lams: list[float], dsum_sql
) -> str:
    """DuckDB oracle replaying :func:`ridge_grid_rmse` exactly."""
    vals = ", ".join(f"(CAST('{float(l)!r}' AS DOUBLE))" for l in lams)
    return f"""WITH st AS (
  {_sql_ridge_stats(table, x1, x2, y, dsum_sql, prefix='s')}),
lam_grid(lam) AS (VALUES {vals}),
g AS (SELECT * FROM lam_grid CROSS JOIN st),
m AS (
  SELECT *,
         sn + lam AS a, ssx1 AS b, ssx2 AS c,
         ssx11 + lam AS d, ssx12 AS e, ssx22 + lam AS f,
         ssy AS p, ssx1y AS q, ssx2y AS r
  FROM g),
{_SQL_COF}
SELECT lam, sqrt({_SQL_SS_RES} / sn) AS train_rmse FROM bt"""


def ridge_cv_rmse(
    df: DataFrame, x1_col: str, x2_col: str, y_col: str,
    key_cols: list[str], lam: float = 1.0, k_folds: int = 3,
) -> DataFrame:
    """Exact k-fold cross-validation of closed-form ridge in ONE
    grouped scan (the reference's cross_validate surface,
    ml_automl.c): rows hash into k md5 folds; per-fold sufficient
    statistics are aggregated once; each fold's TRAIN model comes from
    the complement statistics (total − fold); its held-out RMSE comes
    from the ss_res expansion over the fold's OWN statistics. Returns
    (fold, n_test, rmse).

    Scale: one groupBy(fold) pass + one total pass — k-fold CV at a
    cost independent of k, with no per-fold re-scan. Every reduction is
    order-independent, so the full CV loop sits under the hash gate."""
    key = F.concat_ws("#", *[F.col(c).cast("string") for c in key_cols],
                      F.lit("cv"))
    fold = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % k_folds
    ).cast("int")
    base = df.withColumn("fold", fold)
    fstats = _ridge_stats(base, x1_col, x2_col, y_col, group=["fold"])
    tstats = _ridge_stats(df, x1_col, x2_col, y_col).select(
        *[F.col(c).alias(f"t{c[1:]}" if c.startswith("s") else f"t{c}")
          for c in ["sn", "ssx1", "ssx2", "ssy", "ssx11", "ssx12",
                    "ssx22", "ssx1y", "ssx2y", "ssyy"]]
    )
    L = F.lit(float(lam))
    g = fstats.crossJoin(F.broadcast(tstats))
    m = g.select(
        "*",
        ((F.col("tn") - F.col("sn")) + L).alias("a"),
        (F.col("tsx1") - F.col("ssx1")).alias("b"),
        (F.col("tsx2") - F.col("ssx2")).alias("c"),
        ((F.col("tsx11") - F.col("ssx11")) + L).alias("d"),
        (F.col("tsx12") - F.col("ssx12")).alias("e"),
        ((F.col("tsx22") - F.col("ssx22")) + L).alias("f"),
        (F.col("tsy") - F.col("ssy")).alias("p"),
        (F.col("tsx1y") - F.col("ssx1y")).alias("q"),
        (F.col("tsx2y") - F.col("ssx2y")).alias("r"),
    )
    bt = _with_cofactor_betas(m)
    return bt.select(
        "fold",
        F.col("sn").cast("bigint").alias("n_test"),
        F.sqrt(_ss_res_expansion() / F.col("sn")).alias("rmse"),
    )


def sql_ridge_cv_rmse(
    table: str, x1: str, x2: str, y: str, key_exprs: list[str],
    lam: float, k_folds: int, dsum_sql,
) -> str:
    """DuckDB oracle replaying :func:`ridge_cv_rmse` exactly."""
    lam_sql = f"CAST('{float(lam)!r}' AS DOUBLE)"
    key = " || '#' || ".join(f"CAST({e} AS VARCHAR)" for e in key_exprs)
    fold = (f"CAST(CAST(('0x' || substr(md5({key} || '#' || 'cv'), 1, 8)) "
            f"AS BIGINT) % {k_folds} AS INTEGER)")
    return f"""WITH base AS (
  SELECT *, {fold} AS fold FROM {table}),
fs AS (
  {_sql_ridge_stats('base', x1, x2, y, dsum_sql, group='fold', prefix='s')}),
ts AS (
  {_sql_ridge_stats(table, x1, x2, y, dsum_sql, prefix='t')}),
g AS (SELECT * FROM fs CROSS JOIN ts),
m AS (
  SELECT *,
         (tn - sn) + {lam_sql} AS a,
         (tsx1 - ssx1) AS b,
         (tsx2 - ssx2) AS c,
         (tsx11 - ssx11) + {lam_sql} AS d,
         (tsx12 - ssx12) AS e,
         (tsx22 - ssx22) + {lam_sql} AS f,
         (tsy - ssy) AS p,
         (tsx1y - ssx1y) AS q,
         (tsx2y - ssx2y) AS r
  FROM g),
{_SQL_COF}
SELECT fold, CAST(sn AS BIGINT) AS n_test,
       sqrt({_SQL_SS_RES} / sn) AS rmse
FROM bt"""


def feature_importance_linreg(
    df: DataFrame, x1_col: str, x2_col: str, y_col: str
) -> DataFrame:
    """Standardized-coefficient feature importance for the two-feature
    OLS model (the reference's feature_importance surface,
    ml_automl.c): importance_i = |β_i| · σ_xi / σ_y with population
    σ from the computational form sqrt((Σx² − (Σx)²/n)/n). One stats
    scan + O(1) solve, engine-replayable end to end."""
    stats = _ridge_stats(df, x1_col, x2_col, y_col)
    m = stats.select(
        "*",
        F.col("sn").alias("a"),
        F.col("ssx1").alias("b"), F.col("ssx2").alias("c"),
        F.col("ssx11").alias("d"), F.col("ssx12").alias("e"),
        F.col("ssx22").alias("f"),
        F.col("ssy").alias("p"), F.col("ssx1y").alias("q"),
        F.col("ssx2y").alias("r"),
    )
    bt = _with_cofactor_betas(m)
    n = F.col("sn")
    sd_x1 = F.sqrt((F.col("ssx11") - F.col("ssx1") * F.col("ssx1") / n) / n)
    sd_x2 = F.sqrt((F.col("ssx22") - F.col("ssx2") * F.col("ssx2") / n) / n)
    sd_y = F.sqrt((F.col("ssyy") - F.col("ssy") * F.col("ssy") / n) / n)
    one = bt.select(
        F.col("beta1"), F.col("beta2"),
        (F.abs(F.col("beta1")) * sd_x1 / sd_y).alias("imp1"),
        (F.abs(F.col("beta2")) * sd_x2 / sd_y).alias("imp2"),
    )
    a = one.select(F.lit(x1_col).alias("feature"),
                   F.col("beta1").alias("beta"),
                   F.col("imp1").alias("importance"))
    b = one.select(F.lit(x2_col).alias("feature"),
                   F.col("beta2").alias("beta"),
                   F.col("imp2").alias("importance"))
    return a.unionAll(b)


def sql_feature_importance_linreg(
    table: str, x1: str, x2: str, y: str, dsum_sql
) -> str:
    """DuckDB oracle replaying :func:`feature_importance_linreg`."""
    return f"""WITH st AS (
  {_sql_ridge_stats(table, x1, x2, y, dsum_sql, prefix='s')}),
m AS (
  SELECT *,
         sn AS a, ssx1 AS b, ssx2 AS c,
         ssx11 AS d, ssx12 AS e, ssx22 AS f,
         ssy AS p, ssx1y AS q, ssx2y AS r
  FROM st),
{_SQL_COF},
one AS (
  SELECT beta1, beta2,
         abs(beta1) * sqrt((ssx11 - ssx1 * ssx1 / sn) / sn)
                    / sqrt((ssyy - ssy * ssy / sn) / sn) AS imp1,
         abs(beta2) * sqrt((ssx22 - ssx2 * ssx2 / sn) / sn)
                    / sqrt((ssyy - ssy * ssy / sn) / sn) AS imp2
  FROM bt)
SELECT '{x1}' AS feature, beta1 AS beta, imp1 AS importance FROM one
UNION ALL
SELECT '{x2}' AS feature, beta2 AS beta, imp2 AS importance FROM one"""


def decision_stump_gini(
    df: DataFrame, feature_col: str, label: "F.Column | str"
) -> DataFrame:
    """Exact depth-1 decision-tree split search (the reference's
    decision-tree family, ml_decision_tree.c:1091): evaluate EVERY
    candidate threshold (the distinct feature values; split = x ≤ v)
    by weighted Gini impurity over a binary label. Returns the full
    candidate evaluation (threshold, n_left, n_right, weighted_gini) —
    the stump is its argmin (ties → smallest threshold).

    Scale: one groupBy(feature) count pass (map-side combined), then
    windows over the |distinct values| candidate table — the classic
    histogram-based split search every distributed tree trainer uses;
    candidate count is bounded by feature cardinality, not data size.
    """
    lab = F.col(label).cast("int") if isinstance(label, str) else label.cast("int")
    cells = (
        df.select(F.col(feature_col).alias("v"), lab.alias("y"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding,
                                        Window.currentRow)
    tot = Window.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)
    c = cells.select(
        "v",
        F.sum("n").over(w).alias("nl"),
        F.sum("pos").over(w).alias("pl"),
        F.sum("n").over(tot).alias("nt"),
        F.sum("pos").over(tot).alias("pt"),
    )
    c = c.where(F.col("nl") < F.col("nt"))  # right side must be non-empty
    nl, pl = F.col("nl").cast("double"), F.col("pl").cast("double")
    nr = (F.col("nt") - F.col("nl")).cast("double")
    pr = (F.col("pt") - F.col("pl")).cast("double")
    gl = 1.0 - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * ((nl - pl) / nl)
    gr = 1.0 - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * ((nr - pr) / nr)
    nt = F.col("nt").cast("double")
    return c.select(
        F.col("v").alias("threshold"),
        F.col("nl").alias("n_left"),
        (F.col("nt") - F.col("nl")).alias("n_right"),
        (nl / nt * gl + nr / nt * gr).alias("weighted_gini"),
    )


def sql_decision_stump_gini(
    table: str, feature: str, label_expr: str
) -> str:
    """DuckDB oracle replaying :func:`decision_stump_gini`."""
    return f"""WITH cells AS (
  SELECT {feature} AS v, COUNT(*) AS n,
         CAST(SUM(CAST({label_expr} AS INT)) AS BIGINT) AS pos
  FROM {table} GROUP BY 1),
c AS (
  SELECT v,
         SUM(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                      AND CURRENT ROW) AS nl,
         SUM(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS pl,
         SUM(n) OVER () AS nt,
         SUM(pos) OVER () AS pt
  FROM cells),
f AS (SELECT * FROM c WHERE nl < nt),
g AS (
  SELECT v, nl, nt - nl AS n_right, pl, pt,
         CAST(nl AS DOUBLE) AS dnl, CAST(pl AS DOUBLE) AS dpl,
         CAST(nt - nl AS DOUBLE) AS dnr, CAST(pt - pl AS DOUBLE) AS dpr,
         CAST(nt AS DOUBLE) AS dnt
  FROM f)
SELECT v AS threshold,
       CAST(nl AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       (dnl / dnt * (1.0 - (dpl / dnl) * (dpl / dnl)
                         - ((dnl - dpl) / dnl) * ((dnl - dpl) / dnl))
        + dnr / dnt * (1.0 - (dpr / dnr) * (dpr / dnr)
                           - ((dnr - dpr) / dnr) * ((dnr - dpr) / dnr)))
         AS weighted_gini
FROM g"""
