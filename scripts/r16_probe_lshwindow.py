"""Settle VERDICT r15 #19 / r16 item 3: does the per-radius
row_number<=K form qualify for map-side WindowGroupLimit pruning, and
does the single running-conditional-sum window form lose it?

Builds the lsh_recall candidate frame (uncheckpointed), then captures
.explain('formatted') for
  (a) the r15 running-window form (one Exchange, no pruning), and
  (b) the per-radius filter + row_number()<=K form (old shape),
and prints whether WindowGroupLimit appears in each. Also computes the
per-radius hit counts both ways to prove value equality.

Usage: python scripts/r16_probe_lshwindow.py <tag>
"""

from __future__ import annotations

import io
import itertools
import os
import sys
from contextlib import redirect_stdout
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from neurondb_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("neurondb-r16-lshwin-probe")

    from neurondb_spark.functions.distance import distance
    from neurondb_spark.operators.knn import knn_batch
    from neurondb_spark.registry.index_queries import (
        _LSH_NBITS,
        _LSH_RECALL_FLOORS,
        _RECALL_K,
        _RECALL_Q,
        EMB_DIM,
        _lsh_index_for,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    queries = emb.where(F.col("vec_id") < _RECALL_Q).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = knn_batch(
        emb, "embedding", queries, k=_RECALL_K, metric="cosine",
        tiebreak=["vec_id"],
    ).select("qid", "vec_id")
    idx = _lsh_index_for(spark, sf_dir)
    max_ph = max(_LSH_RECALL_FLOORS)
    qrows = [(int(r["qid"]), [float(x) for x in r["qvec"]])
             for r in queries.collect()]
    probes = []
    for qid, qv in qrows:
        base = idx._query_buckets(qv, 0)[0]
        for r in range(max_ph + 1):
            for flips in itertools.combinations(range(_LSH_NBITS), r):
                m = base
                for f_ in flips:
                    m ^= 1 << f_
                probes.append((qid, int(m), r))
    pschema = T.StructType([
        T.StructField("qid", T.LongType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("r", T.IntegerType()),
    ])
    qschema = T.StructType([
        T.StructField("qid", T.LongType()),
        T.StructField("_qvec", T.ArrayType(T.DoubleType())),
    ])
    pdf_probe = spark.createDataFrame(probes, schema=pschema)
    qdf = spark.createDataFrame(qrows, schema=qschema)
    d = distance("embedding", F.col("_qvec"), "cosine", dim=EMB_DIM,
                 checked=False)
    cand = (
        idx._read_data(spark)
        .join(F.broadcast(pdf_probe), "bucket")
        .join(F.broadcast(qdf), "qid")
        .select("qid", "vec_id", "r", d.alias("_dist"))
    )
    phs = sorted(_LSH_RECALL_FLOORS)

    # (a) running-window form (r15)
    wrun = (
        W.partitionBy("qid")
        .orderBy(F.col("_dist").asc(), F.col("vec_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = cand.select(
        "qid", "vec_id", "r",
        *[F.sum(F.when(F.col("r") <= ph, 1).otherwise(0)).over(wrun)
          .alias(f"_rn{ph}") for ph in phs],
    )
    run_agg = ranked.join(exact, ["qid", "vec_id"], "left_semi").agg(*[
        F.sum(F.when((F.col("r") <= ph)
                     & (F.col(f"_rn{ph}") <= _RECALL_K), 1).otherwise(0)
              ).alias(f"_n{ph}")
        for ph in phs
    ])

    # (b) per-radius row_number form (pre-r15 shape)
    wqd = W.partitionBy("qid").orderBy(
        F.col("_dist").asc(), F.col("vec_id").asc()
    )
    legs = [
        cand.where(F.col("r") <= ph)
        .withColumn("_rn", F.row_number().over(wqd))
        .where(F.col("_rn") <= _RECALL_K)
        .select("qid", "vec_id", F.lit(ph).alias("_ph"))
        for ph in phs
    ]
    allph = reduce(lambda a, b: a.union(b), legs)
    leg_agg = allph.join(exact, ["qid", "vec_id"], "left_semi").agg(*[
        F.sum(F.when(F.col("_ph") == ph, 1).otherwise(0)).alias(f"_n{ph}")
        for ph in phs
    ])

    for name, df in (("runwindow", run_agg), ("perradius", leg_agg)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(out_dir, f"lsh_recall_window_{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(
            f"wrote {path}  WindowGroupLimit={txt.count('WindowGroupLimit')}"
            f" Exchange={txt.count('Exchange')} Window={txt.count('Window')}"
        )
    a = run_agg.collect()[0]
    b = leg_agg.collect()[0]
    print("runwindow counts:", [int(a[f"_n{ph}"] or 0) for ph in phs])
    print("perradius counts:", [int(b[f"_n{ph}"] or 0) for ph in phs])


if __name__ == "__main__":
    main()
