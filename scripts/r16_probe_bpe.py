"""Phase profile + A/B probe for bpe_hybrid_train_k2000 (r16).

Times the row's phases in one session: word-table collect, the driver
heap loop, the final_words round-trip + aggregate.

Usage: python scripts/r16_probe_bpe.py [--rounds N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("r16-probe-bpe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from neurondb_spark.operators.bpe import bpe_token_counts, char_symbols
    from neurondb_spark.operators.bpe_local import bpe_train_hybrid

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = (
        docs.select(F.md5(F.col("doc_id").cast("string")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("symbols", char_symbols("word"))
    )

    t0 = time.perf_counter()
    rows = words.select("word", "cnt", "symbols").collect()
    t1 = time.perf_counter()
    print(f"# collect: {t1 - t0:.3f}s rows={len(rows)}")

    import cProfile
    import pstats

    prof = cProfile.Profile()
    prof.enable()
    merges, final = bpe_train_hybrid(words, 2000)
    prof.disable()
    t2 = time.perf_counter()
    print(f"# train_hybrid total (incl its own collect): {t2 - t1:.3f}s "
          f"merges={len(merges)}")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    import io
    buf = io.StringIO()
    st.stream = buf
    st.print_stats(18)
    for line in buf.getvalue().splitlines():
        if line.strip():
            print("#", line)

    t3 = time.perf_counter()
    vocab = bpe_token_counts(final).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("occurrences").alias("total_occurrences"),
    )
    out = vocab.collect()
    t4 = time.perf_counter()
    print(f"# final agg: {t4 - t3:.3f}s out={out}")


if __name__ == "__main__":
    main()
