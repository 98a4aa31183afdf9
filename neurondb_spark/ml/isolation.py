"""Exact deterministic isolation forest under the hash gate.

The reference's isolation forest (``NeuronDB/src/ml/ml_anomaly.c``,
``train_isolation_forest`` / ``predict_isolation_forest``) grows trees
by choosing a random dimension and a random split point inside the
node's [min, max] range; outliers isolate at shallow depth.  Its
randomness comes from the backend RNG, so — like every ``*_exact``
twin in this package — this module replaces the RNG with md5-derived
pseudo-randomness keyed on (tree, node, level): the same construction
the dedup/LSH family uses (``operators/dedup._md5_long``), identical
bit-for-bit in Spark and DuckDB.  Everything else is the real
algorithm: per-node range split, early isolation, path-length scoring.
That puts the isolation-forest TRAINING PASS itself under the hash
gate next to the rows-only ``isolation_forest_outliers`` (MLlib-free
sampled variant), closing the last rows-only family without an exact
twin.

Scale: each level is ONE window pass keyed by (tree, node) — no
self-join, so lineage stays linear in depth (a groupBy+join per level
would recompute the upstream 2^depth times).  Rows carried = n·trees;
at 100 TB the per-level shuffle is the same keyed exchange any
histogram-based tree trainer pays, and the output is one final
groupBy(id).  Model state lives entirely IN the rows (node id, done
flag, depth) — nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from neurondb_spark.operators.dedup import _md5_long

_TWO60 = float(2 ** 60)


def isolation_forest_exact(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    trees: int = 4,
    depth: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Deterministic isolation forest: per (tree, node, level) the split
    dimension and split fraction are md5-derived; the split point is
    ``lo + frac·(hi - lo)`` over the node's live rows.  A row is done
    when its node is a singleton or unsplittable (lo == hi); its depth
    stops growing.  Returns (id, depth_sum) — the summed path length
    across trees; SMALL depth_sum = isolated early = anomalous.
    """
    v = F.col(vec_col).cast("array<double>")
    cur = df.select(
        id_col,
        v.alias("emb"),
        F.explode(F.array(*[F.lit(t) for t in range(trees)])).alias("tree"),
    ).select(
        id_col, "emb", "tree",
        F.lit(1).cast("long").alias("node"),
        F.lit(False).alias("done"),
        F.lit(0).alias("depth"),
    )
    w = W.partitionBy("tree", "node")
    for lvl in range(1, depth + 1):
        dkey = F.concat(
            F.lit("d"), F.col("tree").cast("string"), F.lit("_"),
            F.col("node").cast("string"), F.lit("_"), F.lit(str(lvl)),
        )
        skey = F.concat(
            F.lit("s"), F.col("tree").cast("string"), F.lit("_"),
            F.col("node").cast("string"), F.lit("_"), F.lit(str(lvl)),
        )
        sdim = (_md5_long(dkey) % dim + 1).cast("int")
        frac = _md5_long(skey).cast("double") / F.lit(_TWO60)
        cur = cur.withColumn("val", F.element_at(F.col("emb"), sdim))
        live_val = F.when(~F.col("done"), F.col("val"))
        cur = (
            cur.withColumn("lo", F.min(live_val).over(w))
            .withColumn("hi", F.max(live_val).over(w))
            .withColumn(
                "c",
                F.sum(F.when(~F.col("done"), F.lit(1)).otherwise(F.lit(0)))
                .over(w),
            )
        )
        splittable = (
            ~F.col("done") & (F.col("c") > 1) & (F.col("lo") < F.col("hi"))
        )
        s = F.col("lo") + frac * (F.col("hi") - F.col("lo"))
        cur = cur.select(
            id_col, "emb", "tree",
            F.when(
                splittable,
                F.col("node") * 2
                + F.when(F.col("val") >= s, F.lit(1)).otherwise(F.lit(0)),
            ).otherwise(F.col("node")).alias("node"),
            F.when(splittable, F.lit(False)).otherwise(F.lit(True))
            .alias("done"),
            (F.col("depth")
             + F.when(splittable, F.lit(1)).otherwise(F.lit(0)))
            .alias("depth"),
        )
    return (
        cur.groupBy(id_col)
        .agg(F.sum("depth").cast("long").alias("depth_sum"))
    )


def sql_isolation_forest_exact(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    trees: int = 4,
    depth: int = 6,
    dim: int = 64,
) -> str:
    """DuckDB twin of :func:`isolation_forest_exact` — one unrolled CTE
    per level, same window-pass shape, same md5 keys."""

    def md5l(key: str) -> str:
        return f"CAST(('0x' || substr(md5({key}), 1, 15)) AS BIGINT)"

    tree_vals = ", ".join(f"({t})" for t in range(trees))
    steps = []
    prev = "l0"
    for lvl in range(1, depth + 1):
        dkey = (f"'d' || CAST(tree AS VARCHAR) || '_' || "
                f"CAST(node AS VARCHAR) || '_' || '{lvl}'")
        skey = (f"'s' || CAST(tree AS VARCHAR) || '_' || "
                f"CAST(node AS VARCHAR) || '_' || '{lvl}'")
        steps.append(f"""v{lvl} AS (
  SELECT *, emb[CAST({md5l(dkey)} % {dim} + 1 AS INTEGER)] AS val,
         CAST({md5l(skey)} AS DOUBLE) / {_TWO60!r} AS frac
  FROM {prev}),
w{lvl} AS (
  SELECT *,
    MIN(CASE WHEN NOT done THEN val END) OVER win AS lo,
    MAX(CASE WHEN NOT done THEN val END) OVER win AS hi,
    SUM(CASE WHEN NOT done THEN 1 ELSE 0 END) OVER win AS c
  FROM v{lvl}
  WINDOW win AS (PARTITION BY tree, node)),
l{lvl} AS (
  SELECT {id_col}, emb, tree,
    CASE WHEN NOT done AND c > 1 AND lo < hi
         THEN node * 2 + (CASE WHEN val >= lo + frac * (hi - lo)
                               THEN 1 ELSE 0 END)
         ELSE node END AS node,
    CASE WHEN NOT done AND c > 1 AND lo < hi
         THEN FALSE ELSE TRUE END AS done,
    depth + (CASE WHEN NOT done AND c > 1 AND lo < hi
                  THEN 1 ELSE 0 END) AS depth
  FROM w{lvl})""")
        prev = f"l{lvl}"
    return f"""WITH l0 AS (
  SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS emb, t.tree,
         CAST(1 AS BIGINT) AS node, FALSE AS done, 0 AS depth
  FROM {table}, (VALUES {tree_vals}) AS t(tree)),
{', '.join(steps)}
SELECT {id_col}, CAST(SUM(depth) AS BIGINT) AS depth_sum
FROM l{depth} GROUP BY {id_col}"""
