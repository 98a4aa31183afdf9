"""Single-session A/B probe for the r16 graph co-partitioning change
(pagerank e_w / connected_components e / label-propagation und pinned
with repartition(key)+sortWithinPartitions+persist instead of
localCheckpoint).

Checks, in ONE Spark session:
  1. values identical old vs new (pagerank top-20 bit-equal; CC full
     label set equal; label-prop histogram equal);
  2. with broadcast joins disabled (scale-simulating), the per-iteration
     edge-side Exchange+Sort disappears — plans written to plans/r16/;
  3. alternating A/B timing at bench cadence.

Usage: python scripts/r16_probe_graph_copart.py [--rounds N] [--plans]
"""

from __future__ import annotations

import contextlib
import io
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


# ---- OLD forms (r15/r16-batch2 shapes: localCheckpoint'd edge frames) ----

def pagerank_old(edges, final_ckpt=True):
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    e_w = (
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src")
        .select("src", "dst", F.col("outdeg"))
        .unionByName(
            nodes.select(
                F.col("node").alias("src"), F.col("node").alias("dst"),
                F.lit(None).cast("long").alias("outdeg"),
            )
        )
        .localCheckpoint(eager=False)
    )
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(ITERS):
        contrib = ranks.join(e_w, ranks.node == e_w["src"]).select(
            F.col("dst").alias("node"),
            F.when(F.col("outdeg").isNull(), F.lit(0.0))
            .otherwise(F.col("pr") / F.col("outdeg")).alias("c"),
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit((1.0 - DAMP) / n) + F.lit(DAMP) * bsum(F.col("c"))).alias("pr")
        )
    return ranks


def cc_old(edges, src="src", dst="dst", max_iter=20):
    e = edges.select(src, dst)
    e = (
        e.union(edges.select(F.col(dst).alias(src), F.col(src).alias(dst)))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )

    def _step(lab):
        nb_min = (
            lab.join(e, lab.node == e[src])
            .groupBy(F.col(dst).alias("node"))
            .agg(F.min("comp").alias("nb"))
        )
        return lab.join(nb_min, "node", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce(F.col("nb"), F.col("comp"))).alias("comp"),
        )

    prev_sum = None
    for _ in range(max_iter):
        labels = _step(_step(labels).localCheckpoint()).localCheckpoint()
        cur_sum = labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).head()[0]
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def labelprop_old(spark, sf_dir):
    e = _edges(spark, sf_dir)
    und = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for i in range(3):
        nb = (
            labels.join(und, labels.node == und.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nb_min"))
        )
        labels = labels.join(nb, "node", "left").select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nb_min"), F.col("lbl"))).alias("lbl"),
        )
        if i < 2:
            labels = labels.localCheckpoint(eager=False)
    return (
        labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("community_size"))
        .groupBy("community_size").agg(F.count(F.lit(1)).alias("n_communities"))
    )


# ---- NEW internal iteration pipeline (for plan capture: the shipped
# operators return eager checkpoints, which hide the plan) ----

def pagerank_new_inner(edges):
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    e_w = (
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src")
        .select("src", "dst", F.col("outdeg"))
        .unionByName(
            nodes.select(
                F.col("node").alias("src"), F.col("node").alias("dst"),
                F.lit(None).cast("long").alias("outdeg"),
            )
        )
        .repartition(F.col("src"))
        .sortWithinPartitions("src")
        .persist()
    )
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(ITERS):
        contrib = ranks.join(e_w, ranks.node == e_w["src"]).select(
            F.col("dst").alias("node"),
            F.when(F.col("outdeg").isNull(), F.lit(0.0))
            .otherwise(F.col("pr") / F.col("outdeg")).alias("c"),
        )
        ranks = contrib.groupBy("node").agg(
            (F.lit((1.0 - DAMP) / n) + F.lit(DAMP) * bsum(F.col("c"))).alias("pr")
        )
    return ranks, e_w


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shape(p: str) -> str:
    return (
        f"Exchange={p.count('(Exchange')+p.count('+- Exchange')-p.count('(Exchange')}"
        f" SMJ={p.count('SortMergeJoin')} "
        f"Sort={p.count('+- Sort ') + p.count(':- Sort ')} "
        f"InMemoryTableScan={p.count('InMemoryTableScan')}"
    )


def main() -> None:
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    spark = get_spark("r16-probe-graph-copart")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    edges = _edges(spark, SF_DIR)

    from neurondb_spark.operators.graph import connected_components, pagerank
    from neurondb_spark.registry.quality_queries import _q_label_propagation

    # ---- value identity ----
    po = sorted(
        (r["node"], r["pr"]) for r in pagerank_old(edges).collect()
    )
    pn = sorted(
        (r["node"], r["pr"])
        for r in pagerank(edges, iterations=ITERS, damping=DAMP,
                          exact=True, dedup_edges=False).collect()
    )
    assert po == pn, f"PAGERANK MISMATCH {po[:3]} vs {pn[:3]}"
    print(f"# pagerank values identical (n={len(po)}, bit-equal)")

    co = sorted((r["node"], r["comp"]) for r in cc_old(edges).collect())
    cn = sorted(
        (r["node"], r["comp"]) for r in connected_components(edges).collect()
    )
    assert co == cn, "CC MISMATCH"
    print(f"# connected_components labels identical (n={len(co)})")

    lo = sorted(
        (r["community_size"], r["n_communities"])
        for r in labelprop_old(spark, SF_DIR).collect()
    )
    ln = sorted(
        (r["community_size"], r["n_communities"])
        for r in _q_label_propagation(spark, SF_DIR).collect()
    )
    assert lo == ln, f"LABELPROP MISMATCH {lo} vs {ln}"
    print(f"# label_propagation histogram identical (n={len(lo)})")
    spark.catalog.clearCache()

    # ---- plan shape with broadcast disabled (scale-simulating) ----
    if "--plans" in sys.argv:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        os.makedirs("plans/r16", exist_ok=True)
        old_p = plan_str(pagerank_old(edges))
        new_r, new_ew = pagerank_new_inner(edges)
        new_ew.count()  # populate the cache so the consumer plan is final
        new_p = plan_str(new_r)
        with open("plans/r16/graph_copart_pagerank_before.txt", "w") as f:
            f.write(old_p)
        with open("plans/r16/graph_copart_pagerank_after.txt", "w") as f:
            f.write(new_p)
        print(f"# pagerank inner plan old: {shape(old_p)}")
        print(f"# pagerank inner plan new: {shape(new_p)}")
        new_ew.unpersist()

        # CC: capture ONE propagation step over the old (checkpointed)
        # vs new (pinned) edge frame — the loop's eager checkpoints hide
        # everything past step 1 anyway.
        e_old = (
            edges.select("src", "dst")
            .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
            .localCheckpoint()
        )
        e_new = (
            edges.select("src", "dst")
            .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .distinct()
            .repartition(F.col("src"))
            .sortWithinPartitions("src")
            .persist()
        )
        e_new.count()

        def cc_step(lab, e):
            nb_min = (
                lab.join(e, lab.node == e["src"])
                .groupBy(F.col("dst").alias("node"))
                .agg(F.min("comp").alias("nb"))
            )
            return lab.join(nb_min, "node", "left").select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nb"), F.col("comp"))).alias("comp"),
            )

        lab0 = (
            e_old.select(F.col("src").alias("node")).union(
                e_old.select(F.col("dst").alias("node"))
            ).distinct().withColumn("comp", F.col("node")).localCheckpoint()
        )
        old_cc = plan_str(cc_step(lab0, e_old))
        new_cc = plan_str(cc_step(lab0, e_new))
        with open("plans/r16/graph_copart_ccstep_before.txt", "w") as f:
            f.write(old_cc)
        with open("plans/r16/graph_copart_ccstep_after.txt", "w") as f:
            f.write(new_cc)
        print(f"# cc step plan old: {shape(old_cc)}")
        print(f"# cc step plan new: {shape(new_cc)}")
        e_new.unpersist()

        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.catalog.clearCache()

    # ---- alternating timing at bench cadence ----
    def t_old():
        pagerank_old(edges).count()
        cc_old(edges).count()
        labelprop_old(spark, SF_DIR).count()

    def t_new():
        pagerank(edges, iterations=ITERS, damping=DAMP,
                 exact=True, dedup_edges=False).count()
        connected_components(edges).count()
        _q_label_propagation(spark, SF_DIR).count()

    ta, tb = [], []
    for _ in range(rounds):
        for fn, acc in ((t_old, ta), (t_new, tb)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            acc.append(round(time.perf_counter() - t0, 3))
    print(f"# old (pr+cc+lp) runs={ta} min={min(ta)}")
    print(f"# new (pr+cc+lp) runs={tb} min={min(tb)}")


if __name__ == "__main__":
    main()
