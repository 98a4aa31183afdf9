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
from pyspark.sql import types as T

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


# ------------------------------------------------- streaming near-dup LSH

LSH_PAIR_SCHEMA = T.StructType([
    T.StructField("id_a", T.LongType()),
    T.StructField("id_b", T.LongType()),
])

_BUCKET_STATE_SCHEMA = T.StructType([
    T.StructField("members", T.ArrayType(T.LongType())),
])


def _bucket_fold(key, pdfs, state):
    """Per-(band, bsig) bucket state = member ids. Each arriving doc
    pairs with every member already in the bucket (and with
    earlier-sorted arrivals of the same micro-batch), so a pair is
    emitted exactly once — by whichever member arrives second. The final
    pair SET is therefore arrival-order independent. Singleton buckets
    (the overwhelming majority) yield NOTHING — constructing 10k+ empty
    pandas frames was the dominant cost of this operator."""
    import pandas as pd  # executor-side

    members = list(state.get[0]) if state.exists else []
    out_a, out_b = [], []
    new_ids: list[int] = []
    for pdf in pdfs:
        new_ids.extend(int(x) for x in pdf["_mid"].tolist())
    for new_id in sorted(new_ids):
        for old in members:
            out_a.append(min(old, new_id))
            out_b.append(max(old, new_id))
        members.append(new_id)
    state.update((members,))
    if out_a:
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b})


def lsh_pairs_stream(
    spark: SparkSession,
    src_dir: str,
    schema,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental MinHash-LSH near-dup candidate pairs over a document
    stream — the streaming twin of ``operators.dedup.minhash_lsh_pairs``.

    Each arriving doc is hashed to its banded signatures (pure
    expressions, the same seeded-md5 minhashes as the batch operator);
    the stateful operator keys on the (band, band-signature) bucket and
    holds the bucket's member ids, emitting a pair the moment its second
    member arrives. The DISTINCT pair set after any drain equals the
    batch operator over the same corpus regardless of arrival order
    (the same doc pair can meet in several bands — distinct() the sink,
    exactly as the batch op does).

    Scale: state is partitioned by bucket key across executors; bucket
    member lists are the same size as the batch operator's bucket join
    groups (boilerplate-heavy buckets are the known hot spot in BOTH
    forms — cap them upstream with a stop-shingle filter). Each
    micro-batch shuffles only its own band rows. NOTE the per-group
    python-worker overhead: bucket count ≈ docs × bands, nearly all
    singletons, and each group pays an Arrow round-trip — for run-once /
    high-throughput drains prefer :func:`lsh_pairs_drain`, which does
    the same incremental work as JVM joins against a persistent
    membership table.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from neurondb_spark.operators.dedup import banded_signature_rows

    src = spark.readStream.schema(schema).parquet(src_dir)
    exploded = banded_signature_rows(
        src.select(F.col(id_col).cast("long").alias("_mid"), text_col),
        text_col, "_mid", num_hashes, bands, shingle_n,
    )
    return exploded.groupBy("band", "bsig").applyInPandasWithState(
        _bucket_fold,
        outputStructType=LSH_PAIR_SCHEMA,
        stateStructType=_BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def lsh_pairs_drain(
    spark: SparkSession,
    src_dir: str,
    schema,
    text_col: str,
    id_col: str,
    work_dir: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Incremental MinHash-LSH near-dup via foreachBatch JVM joins — the
    scale path (same semantics as :func:`lsh_pairs_stream`, none of its
    per-bucket python overhead).

    Each micro-batch: hash the new docs to band rows, join them against
    the PERSISTENT membership table (new×old pairs), self-join within
    the batch (new×new), then append the new rows to the membership
    table. Both writes go to ``batch_id=<id>`` directories with
    overwrite, so a replayed micro-batch rewrites its own files —
    exactly-once without a state store. The distinct drained pair set
    equals the batch operator under any arrival order.

    At 100 TB: the membership table is a bucketed warehouse table
    (band, bsig)-partitioned so the new×old join co-locates; hot
    boilerplate buckets fall to AQE skew handling; this is the standard
    "incrementally refreshed signature table" the batch operator's
    docstring promises.
    """
    import os

    from neurondb_spark.operators.dedup import banded_signature_rows

    members_dir = os.path.join(work_dir, "members")
    pairs_dir = os.path.join(work_dir, "pairs")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        # Replay hygiene (r6 ADVICE): a crash mid-write leaves torn
        # parquet under THIS batch's own batch_id=<id> dirs, and the
        # membership read below globs every batch dir — including the
        # torn one — which would wedge the replay. Pre-delete this
        # batch's dirs so a failed previous attempt can never be read;
        # mode("overwrite") then rewrites them, keeping exactly-once.
        for d in (
            os.path.join(pairs_dir, f"batch_id={batch_id}"),
            os.path.join(members_dir, f"batch_id={batch_id}"),
        ):
            shutil.rmtree(d, ignore_errors=True)
        new = banded_signature_rows(
            batch_df.select(F.col(id_col).cast("long").alias("_mid"), text_col),
            text_col, "_mid", num_hashes, bands, shingle_n,
        ).localCheckpoint(eager=True)  # hash once, not once per use below
        nn = (
            new.alias("a").join(
                new.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bsig") == F.col("b.bsig"))
                & (F.col("a._mid") < F.col("b._mid")),
            )
            .select(F.col("a._mid").alias("id_a"), F.col("b._mid").alias("id_b"))
        )
        pairs = nn
        # (isdir alone is not enough: after the pre-delete above, a
        # first-batch replay can leave members_dir present but empty —
        # reading it would fail on schema inference.)
        have_members = os.path.isdir(members_dir) and any(
            e.startswith("batch_id=") for e in os.listdir(members_dir)
        )
        if have_members:
            old = spark.read.parquet(members_dir)
            no = (
                new.join(old, ["band", "bsig"])
                .where(F.col("_mid") != F.col("member_id"))
                .select(
                    F.least("_mid", "member_id").alias("id_a"),
                    F.greatest("_mid", "member_id").alias("id_b"),
                )
            )
            pairs = pairs.unionByName(no)
        pairs.distinct().write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch_id={batch_id}")
        )
        new.withColumnRenamed("_mid", "member_id").write.mode("overwrite").parquet(
            os.path.join(members_dir, f"batch_id={batch_id}")
        )

    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", os.path.join(work_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    if not os.path.isdir(pairs_dir):
        return spark.createDataFrame([], LSH_PAIR_SCHEMA)
    return spark.read.parquet(pairs_dir).select("id_a", "id_b").distinct()


def lsh_pairs_batch(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int = 8, bands: int = 4, shingle_n: int = 3,
) -> DataFrame:
    """The batch twin — delegates to the batch LSH operator."""
    from neurondb_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        df, text_col, id_col,
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
    )
