"""Single-session A/B for the r16 bpe_hybrid_train_k2000 changes (zip
pairs + pruned index-inserts + driver-side summary): OLD row shape
(bpe_train_hybrid → createDataFrame → bpe_token_counts agg) vs the NEW
registry row, alternating, with a value-equality assert.

Usage: python scripts/r16_probe_bpe_ab.py [--rounds N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q_old(spark, sf_dir):
    from neurondb_spark.operators.bpe import bpe_token_counts, char_symbols
    from neurondb_spark.operators.bpe_local import bpe_train_hybrid

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = (
        docs.select(F.md5(F.col("doc_id").cast("string")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("symbols", char_symbols("word"))
    )
    merges, final = bpe_train_hybrid(words, 2000)
    vocab = bpe_token_counts(final).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("occurrences").alias("total_occurrences"),
    )
    return vocab.select(
        F.lit(len(merges)).cast("int").alias("n_merges"),
        F.col("n_tokens").cast("long"),
        F.col("total_occurrences").cast("long"),
    )


def main() -> None:
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    spark = get_spark("r16-probe-bpe-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import __spark_entry__ as entrymod

    q_new = entrymod.queries()["bpe_hybrid_train_k2000"]

    vo = [tuple(r) for r in q_old(spark, SF_DIR).collect()]
    vn = [tuple(r) for r in q_new(spark, SF_DIR).collect()]
    assert vo == vn, f"VALUE MISMATCH old={vo} new={vn}"
    print(f"# values identical: {vn}")

    ta, tb = [], []
    for _ in range(rounds):
        for fn, acc in ((q_old, ta), (q_new, tb)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            acc.append(round(time.perf_counter() - t0, 3))
    print(f"# old runs={ta} min={min(ta)}")
    print(f"# new runs={tb} min={min(tb)}")


if __name__ == "__main__":
    main()
