"""Structured Streaming workers (SURVEY §2.13): the reference's background
workers (job queue, monitor) re-expressed as streams."""

from neurondb_spark.streaming.queue import JobQueueWorker, monitor_stream  # noqa: F401
