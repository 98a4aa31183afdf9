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
