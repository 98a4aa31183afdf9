"""Stateful streaming sequence packing (SURVEY §2.13 / BASELINE north
star: custom stateful operators via applyInPandasWithState).

The batch shape (operators/corpus.py pack_sequences: per-shard running
token sum sliced into seq_len-token bins) becomes a per-shard GroupState
carrying ONE long — the next free token offset of the shard's stream.
Each micro-batch's documents are sorted by id before folding, so for
id-ordered arrival the emitted (document, bin) slices are IDENTICAL to
the batch operator over the same rows — which is exactly what the
driver's oracle checks. This is the continuous-ingest form of training
-data packing: documents stream in, fixed-length example slots stream
out, and the carry means a shard's bins stay packed across batches (no
padding waste at batch boundaries).

Scale: state is one scalar per shard; each micro-batch shuffles only on
the shard key, and the per-group fold is O(docs in batch) integer
arithmetic (token counts are computed JVM-side BEFORE the stateful op).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PACK_OUT_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),
    T.StructField("bin_id", T.LongType()),
    T.StructField("id", T.LongType()),
    T.StructField("doc_offset", T.LongType()),
    T.StructField("bin_offset", T.LongType()),
    T.StructField("take_tokens", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("next_offset", T.LongType()),
])


def _pack_fold(seq_len: int):
    L = int(seq_len)

    def fn(key, pdfs: Iterator[pd.DataFrame], state):
        (offset,) = state.get if state.exists else (0,)
        shard = key[0]
        out: dict[str, list] = {
            "shard": [], "bin_id": [], "id": [], "doc_offset": [],
            "bin_offset": [], "take_tokens": [],
        }
        # Accumulate ALL Arrow chunks of the group before sorting: the
        # iterator yields multiple pdfs per group (split at
        # arrow.maxRecordsPerBatch, arriving in arbitrary shuffle-read
        # order), so a per-chunk sort would fold a multi-chunk shard out
        # of id order — silently diverging from the batch layout. The
        # group is one shard of one micro-batch, so this concat is the
        # same memory the per-chunk path already held transitively.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "id", kind="mergesort"
            )
            for doc_id, n in zip(pdf["id"], pdf["n"]):
                n = int(n)
                if n <= 0:
                    continue
                start, end = offset, offset + n
                for b in range(start // L, (end - 1) // L + 1):
                    lo = max(start, b * L)
                    hi = min(end, (b + 1) * L)
                    out["shard"].append(shard)
                    out["bin_id"].append(b)
                    out["id"].append(int(doc_id))
                    out["doc_offset"].append(lo - start)
                    out["bin_offset"].append(lo - b * L)
                    out["take_tokens"].append(hi - lo)
                offset = end
        state.update((offset,))
        yield pd.DataFrame(out)

    return fn


def pack_stream(sdf: DataFrame, seq_len: int = 512) -> DataFrame:
    """Attach the stateful packer to a streaming frame of pre-counted
    documents (columns: shard string, id long, n long = token count).
    Returns the streaming DataFrame of (document, bin) slice rows —
    the same schema and, for id-ordered arrival, the same rows as the
    batch ``pack_sequences``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    if seq_len < 1:
        raise ValueError("neurondb: pack_stream seq_len must be >= 1")
    return sdf.groupBy("shard").applyInPandasWithState(
        _pack_fold(seq_len),
        outputStructType=PACK_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
