"""Structured Streaming workers (SURVEY §2.13): the reference's background
workers (job queue, monitor) re-expressed as streams."""

import os

from neurondb_spark.streaming.queue import JobQueueWorker, monitor_stream  # noqa: F401
from neurondb_spark.streaming.table_merge import ConcurrentWriterError  # noqa: F401


def strict_stream() -> bool:
    """Gate-integrity switch (round-6 verdict "What's wrong #1"): the four
    streaming gate rows fall back to their batch twins when the streaming
    drain throws — an infra-only contract, but a drain-side OPERATOR bug
    that happens to surface as a StreamingQueryException would be masked
    as a green row computed by entirely different code. With
    ``NEURONDB_STRICT_STREAM=1`` (set by driver_sim / vanilla_sim /
    hostile_sim and precommit.sh) the fallback becomes a hard raise, so
    pre-commit verification proves the STREAMING path itself produced the
    green — streaming flakiness in the sims is signal, not noise."""
    return os.environ.get("NEURONDB_STRICT_STREAM") == "1"
