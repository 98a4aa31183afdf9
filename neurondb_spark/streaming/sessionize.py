"""Stateful streaming sessionization (SURVEY §2.13 / BASELINE north
star: custom stateful operators via applyInPandasWithState).

The batch shape (registry/events.events_sessionize: 30-min-gap sessions
via lag + cumulative sum) becomes a per-user GroupState carrying
(last_ts, n_sessions, current_session_len, max_session_len) — the
canonical translation of a gap-sessionizer into Structured Streaming
state. Events inside each micro-batch are sorted (ts, event_id) before
folding, so for time-ordered batch arrival the emitted aggregates are
IDENTICAL to the batch query — which is exactly what the driver's
oracle checks.

Scale: state is four scalars per user; each micro-batch shuffles only
on user_id. A watermark-driven timeout variant (emit-on-close) plugs
into the same fold without changing the state layout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SESSION_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_sessions", T.LongType()),
    T.StructField("max_session_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("last_ts_ns", T.LongType()),
    T.StructField("n_sessions", T.LongType()),
    T.StructField("cur_n", T.LongType()),
    T.StructField("max_n", T.LongType()),
])


def _session_fold(gap_s: float):
    # Fold in integer nanoseconds: epoch-ns (~1.7e18) exceeds 2^53, so a
    # float round-trip loses ~100-300ns and a gap of exactly gap_s could
    # sessionize differently from the batch twin (which is exact at
    # whole-microsecond timestamps).
    gap_ns = int(round(gap_s * 1e9))

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        last_ts, n_sessions, cur_n, max_n = (
            state.get if state.exists else (None, 0, 0, 0)
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            for t in pdf["ts"]:
                ts = int(t.value)  # int64 epoch nanoseconds, exact
                if last_ts is None or ts - last_ts > gap_ns:
                    n_sessions += 1
                    cur_n = 1
                else:
                    cur_n += 1
                if cur_n > max_n:
                    max_n = cur_n
                last_ts = ts
        state.update((last_ts, n_sessions, cur_n, max_n))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "max_session_events": [max_n],
        })

    return fn


def sessionize_stream(sdf: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """Attach the stateful sessionizer to a streaming events frame
    (columns: user_id, event_id, ts). Returns the streaming DataFrame of
    per-user (n_sessions, max_session_events) updates."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return sdf.groupBy("user_id").applyInPandasWithState(
        _session_fold(gap_s),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_batch(df: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """The batch twin (lag + cumulative sum) — byte-identical output for
    time-ordered input; used as the fallback when the streaming
    infrastructure fails mid-gate (cf. JobQueueWorker.run_once)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    sess = df.withColumn("_new", is_new).withColumn(
        "session_seq", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .groupBy("user_id")
        .agg(
            F.max("session_seq").cast("bigint").alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
        )
    )
