"""Streaming incremental exact-dedup (§2.13 × the north-star dedup
family).

Reference analog: the neuranq background workers maintain derived state
incrementally (NeuronDB/src/worker/*); the training-pipeline shape is a
dedup table that stays current as new documents land. Spark-first form:
a Structured Streaming aggregation keyed by content fingerprint — the
state store holds one row per distinct fingerprint, each micro-batch
folds new arrivals in, and `min(id)`/`count` are order-independent so
the drained table is byte-identical to the batch `exact_dedup` over the
same corpus regardless of file/batch arrival order — which is exactly
what lets a DuckDB oracle hash-check an incremental pipeline.

At scale: state is hash-partitioned by fingerprint across executors
(RocksDB state store in production), each micro-batch shuffles only its
own rows, and the complete-mode sink is replaced by a foreachBatch merge
into the warehouse dedup table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark.functions.text import doc_fingerprint


def dedup_stream(
    spark: SparkSession, src_dir: str, schema, text_col: str, id_col: str,
) -> DataFrame:
    """Running (fingerprint → min id, dup_count) over a document stream.

    Returns the streaming DataFrame; drive it with a complete-mode sink
    (the aggregation is the whole dedup table) and an AvailableNow
    trigger for run-once drains.
    """
    src = spark.readStream.schema(schema).parquet(src_dir)
    return (
        src.withColumn("fingerprint", doc_fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def dedup_batch(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """The batch twin: same aggregation over a static frame (equals
    operators.dedup.exact_dedup with keep='min')."""
    return (
        df.withColumn("fingerprint", doc_fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )
