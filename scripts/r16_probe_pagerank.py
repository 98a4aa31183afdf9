"""Single-session A/B probe for the r16 pagerank iteration-shape change.

Builds the OLD form (per-iteration nodes LEFT JOIN summed) and the NEW
form (zero-contribution self-loops, agg yields every node) in ONE Spark
session, checks the top-20 values are identical, times them alternating
(A B A B ...), and optionally captures both plans.

Usage: python scripts/r16_probe_pagerank.py [--rounds N] [--plans]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.functions.aggregates import bsum  # noqa: E402
from neurondb_spark.registry.quant_graph import _edges  # noqa: E402
from neurondb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ITERS, DAMP = 3, 0.85


def pagerank_old(edges):
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e_w = (
        e.join(outdeg, "src")
        .select("src", "dst", F.col("outdeg"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(ITERS):
        contrib = ranks.join(e_w, ranks.node == e_w["src"]).select(
            F.col("dst").alias("node"), (F.col("pr") / F.col("outdeg")).alias("c")
        )
        summed = contrib.groupBy("node").agg(bsum(F.col("c")).alias("s"))
        ranks = nodes.join(summed, "node", "left").select(
            "node",
            (
                F.lit((1.0 - DAMP) / n)
                + F.lit(DAMP) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("pr"),
        )
    return ranks


def q_old(spark, sf_dir):
    pr = pagerank_old(_edges(spark, sf_dir))
    return pr.select("node", "pr").orderBy(
        F.col("pr").desc(), F.col("node").asc()
    ).limit(20)


def q_new(spark, sf_dir):
    from neurondb_spark.operators.graph import pagerank

    pr = pagerank(_edges(spark, sf_dir), iterations=ITERS, damping=DAMP,
                  exact=True, dedup_edges=False)
    return pr.select("node", "pr").orderBy(
        F.col("pr").desc(), F.col("node").asc()
    ).limit(20)


def main() -> None:
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    spark = get_spark("r16-probe-pagerank")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rows_old = [(r["node"], r["pr"]) for r in q_old(spark, SF_DIR).collect()]
    rows_new = [(r["node"], r["pr"]) for r in q_new(spark, SF_DIR).collect()]
    assert rows_old == rows_new, (
        f"VALUE MISMATCH old={rows_old[:3]} new={rows_new[:3]}"
    )
    print(f"# values identical (top-20 bit-equal), n={len(rows_old)}")

    if "--plans" in sys.argv:
        import contextlib
        import io

        os.makedirs("plans/r16", exist_ok=True)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q_new(spark, SF_DIR).explain("formatted")
        with open("plans/r16/graph_pagerank_after.txt", "w") as f:
            f.write(buf.getvalue())
        print("# wrote plans/r16/graph_pagerank_after.txt")

    ta, tb = [], []
    for _ in range(rounds):
        for tag, fn, acc in (("old", q_old, ta), ("new", q_new, tb)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            acc.append(round(time.perf_counter() - t0, 3))
    print(f"# old runs={ta} min={min(ta)}")
    print(f"# new runs={tb} min={min(tb)}")


if __name__ == "__main__":
    main()
