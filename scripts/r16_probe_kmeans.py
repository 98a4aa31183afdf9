"""Single-session A/B probe for the r16 kmeans_lloyd_exact lineage change
(lazy-checkpointed exploded frame + per-round centroid checkpoint).

Rebuilds the OLD form inline, asserts assignments are identical, and
times old vs new alternating in one session (the only reliable method on
this VM — cross-process runs swing 2-6x).

Usage: python scripts/r16_probe_kmeans.py [--rounds N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.functions.aggregates import bsum, davg  # noqa: E402
from neurondb_spark.ml.stats import _explode_vec  # noqa: E402
from neurondb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def kmeans_old(df, vec_col, id_col, k=4, iters=2):
    from pyspark.sql import Window as W

    ex = _explode_vec(df, vec_col, [id_col])
    init = (
        df.select(id_col).orderBy(id_col).limit(k)
        .select(
            id_col,
            (F.row_number().over(W.orderBy(id_col)) - 1).alias("cluster"),
        )
    )
    cent = (
        init.join(ex, id_col)
        .select("cluster", "pos", F.col("val").alias("cval"))
    )
    assign = None
    for _ in range(iters):
        d = (
            ex.join(cent, "pos")
            .groupBy(id_col, "cluster")
            .agg(bsum((F.col("val") - F.col("cval"))
                      * (F.col("val") - F.col("cval"))).alias("dist"))
        )
        w = W.partitionBy(id_col).orderBy(F.col("dist").asc(), F.col("cluster").asc())
        assign = (
            d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(id_col, "cluster")
        )
        cent = (
            assign.join(ex, id_col)
            .groupBy("cluster", "pos")
            .agg(davg("val").alias("cval"))
        )
    return assign


def main() -> None:
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    spark = get_spark("r16-probe-kmeans")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from neurondb_spark.ml.stats import kmeans_lloyd_exact

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    def q_old():
        return kmeans_old(emb, "embedding", "vec_id", k=4, iters=2)

    def q_new():
        return kmeans_lloyd_exact(emb, "embedding", "vec_id", k=4, iters=2)

    rows_old = sorted((r["vec_id"], r["cluster"]) for r in q_old().collect())
    rows_new = sorted((r["vec_id"], r["cluster"]) for r in q_new().collect())
    assert rows_old == rows_new, "ASSIGNMENT MISMATCH"
    print(f"# assignments identical, n={len(rows_old)}")

    ta, tb = [], []
    for _ in range(rounds):
        for fn, acc in ((q_old, ta), (q_new, tb)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().count()
            acc.append(round(time.perf_counter() - t0, 3))
    print(f"# old runs={ta} min={min(ta)}")
    print(f"# new runs={tb} min={min(tb)}")


if __name__ == "__main__":
    main()
