"""Job-queue + monitor workers as Structured Streaming jobs.

Reference: neuranq background worker polls a job-queue table with
``FOR UPDATE SKIP LOCKED`` (NeuronDB/src/worker/worker_queue.c:4-9),
neuranmon samples metrics on a naptime cadence (worker_init.c:127-176,
GUC cadences neurondb_guc.c:415-604).

Spark mapping: the queue is a parquet/Delta directory of job rows; a
``readStream`` file source + ``foreachBatch`` drains arriving jobs.
Exactly-once: each micro-batch writes to a deterministic
``done/batch_id=<id>`` directory with overwrite — a foreachBatch replay
after failure rewrites that batch's files instead of appending
duplicates (the idempotent-sink contract foreachBatch requires; the
SKIP LOCKED analog is the checkpoint: a batch is owned by its id).
``Trigger.AvailableNow`` gives the reference's run-once drain
(neuranq_run_once, neurondb--1.0.sql:3136).
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

# Batches at or below this size dispatch handlers driver-side (no executor
# python workers anywhere in the plan). A job queue is control-plane data —
# the reference's worker polls single jobs (worker_queue.c:4-9) — so the
# common case is far below this; mapInPandas remains the scale path above.
_DRIVER_DRAIN_MAX_ROWS = 10_000


def _apply_handlers(handlers: dict, records: list[dict]) -> list[str]:
    """Shared dispatch core for the driver-side and executor-side paths:
    one result string per job row — handler JSON, ``no_handler``, or
    ``error: ...`` (the job is still consumed, matching reference workers
    recording failure, worker_queue.c:4-9)."""
    results = []
    for row in records:
        fn = handlers.get(row.get("job_type"))
        if fn is None:
            results.append("no_handler")
            continue
        try:
            out = fn(row)
            results.append(
                out if isinstance(out, str)
                else json.dumps(out, default=str, sort_keys=True)
            )
        except Exception as e:  # record failure, consume the job
            results.append(f"error: {e}")
    return results


class JobQueueWorker:
    """Drains a job directory via Structured Streaming.

    ``handlers``: job_type → fn(job row as a plain dict) -> result (dict
    or str). Handlers run executor-side (mapInPandas over the batch, so a
    wide batch of jobs dispatches in parallel); the JSON-encoded return
    value lands in the ``result`` column, ``"no_handler"`` when the
    job_type has no registered handler, ``"error: ..."`` if the handler
    raised (the job is still marked complete — reference workers likewise
    consume a job exactly once and record failure, worker_queue.c:4-9).

    Exactly-once: results are written to ``done/batch_id=<id>`` with
    overwrite, so a replayed micro-batch rewrites its own directory
    rather than appending duplicate done-rows.
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
        n = pending.count()
        if n <= _DRIVER_DRAIN_MAX_ROWS:
            self._process_batch_driver(pending, batch_id)
        else:
            self._process_batch_executor(pending, batch_id)

    def _process_batch_driver(self, pending: DataFrame, batch_id: int) -> None:
        """Python-worker-free drain for bounded batches.

        The entire plan is JVM-side: Arrow ``toPandas`` collect, handlers
        applied in the driver process, Arrow ``createDataFrame`` back, JVM
        parquet write. No executor python worker is ever launched, so the
        python-worker churn that killed three consecutive driver-gate runs
        (mapInPandas task failure under ~30-query session load) has no
        surface here."""
        out_fields = pending.schema.fieldNames()
        pdf = pending.toPandas()
        pdf["result"] = _apply_handlers(self.handlers, pdf.to_dict("records"))
        pdf["status"] = "complete"
        schema = T.StructType(
            list(pending.schema.fields) + [T.StructField("result", T.StringType())]
        )
        handled = (
            self.spark.createDataFrame(pdf[out_fields + ["result"]], schema=schema)
            .withColumn("processed_at", F.current_timestamp())
        )
        handled.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.out_dir, "done", f"batch_id={batch_id}")
        )

    def _process_batch_executor(self, pending: DataFrame, batch_id: int) -> None:
        """mapInPandas drain — the scale path: a wide batch of jobs
        dispatches handler calls in parallel across executors."""
        handlers = self.handlers  # closure-captured; cloudpickled to executors
        out_fields = pending.schema.fieldNames()

        def _dispatch(batches):
            for pdf in batches:
                yield pdf.assign(result=_apply_handlers(handlers, pdf.to_dict("records")))

        schema = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in pending.schema.fields
        ) + ", result string"
        handled = (
            pending.mapInPandas(_dispatch, schema)
            .withColumn("status", F.lit("complete"))
            .withColumn("processed_at", F.current_timestamp())
            .select(*out_fields, "result", "processed_at")
        )
        handled.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, "done", f"batch_id={batch_id}")
        )

    def _run_streaming(self) -> None:
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
        try:
            q.awaitTermination()
        finally:
            if q.isActive:  # failed awaits can leave the query registered
                q.stop()

    def drain_batch(self) -> None:
        """Batch-drain path with identical done-rows to a streaming drain.

        AvailableNow semantics are a run-once drain of everything queued,
        so ``spark.read`` over the queue directory + the same
        ``_process_batch`` yields the same rows — only the done/batch_id
        file layout differs. The done directory is cleared first so a
        partially-committed streaming attempt can't leave duplicates."""
        import shutil

        shutil.rmtree(os.path.join(self.out_dir, "done"), ignore_errors=True)
        df = self.spark.read.schema(JOB_SCHEMA).parquet(self.queue_dir)
        self._process_batch(df, 0)

    def run_once(self, retries: int = 1) -> None:
        """neuranq_run_once analog: drain everything currently queued.

        Hardened against transient streaming-infrastructure failures
        (python-worker churn under heavy multi-query sessions): retries
        the streaming drain once — the idempotent batch_id-keyed
        overwrite sink makes a replay safe — then falls back to the
        batch drain, which produces identical done-rows."""
        for attempt in range(retries + 1):
            try:
                self._run_streaming()
                return
            except Exception:
                if attempt < retries:
                    time.sleep(1.0)
        self.drain_batch()

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
    """Test/demo helper: append job rows to the queue directory.

    Built through pandas/Arrow (JVM-local data — a list-of-tuples
    createDataFrame would round-trip every write through a pickled-RDD
    python worker, ~4-6s of overhead for a 30-row control-plane write)
    and coalesced to one file per enqueue call.

    The schema is pinned explicitly: with Arrow disabled (PySpark's
    default), schema-less ``createDataFrame(pdf)`` falls back to
    Python-object inference and pandas int32 widens to LongType, so the
    queue parquet's physical type (INT64) would no longer match
    ``JOB_SCHEMA``'s IntegerType and the vectorized reader throws
    ``SchemaColumnConvertNotSupportedException`` on read. Pinning the
    schema makes the write byte-identical in either Arrow mode."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "id": pd.Series([j["id"] for j in jobs], dtype="int64"),
            "job_type": [j.get("job_type", "noop") for j in jobs],
            "payload": [json.dumps(j.get("payload", {})) for j in jobs],
            "tenant_id": pd.Series([j.get("tenant_id", 0) for j in jobs], dtype="int32"),
            "status": [j.get("status", "pending") for j in jobs],
        }
    )
    enqueue_schema = T.StructType(
        [f for f in JOB_SCHEMA.fields if f.name != "created_at"]
    )
    df = spark.createDataFrame(pdf, schema=enqueue_schema).withColumn(
        "created_at", F.current_timestamp()
    )
    df.coalesce(1).write.mode("append").parquet(queue_dir)
