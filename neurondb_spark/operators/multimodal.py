"""Multimodal column plumbing (BASELINE north star; reference analog:
cross_modal_search / clip_embed / imagebind_embed, src/ml/ml_multimodal.c:61-236).

Images/audio/video are opaque ``binary`` columns + typed metadata structs.
The Spark-side plumbing — schemas, Arrow batch shapes, partitioning — is
real and tested; the actual codec decode is STUBBED (image/audio libraries
are not in this container): ``decode=\"fake\"`` produces a deterministic
hash-derived decode so pipelines are testable end-to-end, and
``decode=\"strict\"`` raises NotImplementedError at the exact point a real
codec (Pillow/ffmpeg) would plug in.

Scale design: mapInPandas streams Arrow record batches — constant memory
per task regardless of corpus size; binary payloads never pass through the
driver; feature extraction parallelizes per partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def _fake_pixels(content: bytes, n: int = 16) -> list[float]:
    """Deterministic stand-in decode: djb2 over bytes → n pseudo-pixels."""
    h = 5381
    for b in content or b"":
        h = ((h * 33) ^ b) & 0xFFFFFFFF
    out = []
    for i in range(n):
        h = ((h * 33) ^ i) & 0xFFFFFFFF
        out.append((h % 256) / 255.0)
    return out


def decode_media(
    df: DataFrame, content_col: str = "content", out_col: str = "pixels",
    n_values: int = 16, decode: str = "fake",
) -> DataFrame:
    """Decode binary media → fixed-width float array via mapInPandas."""
    if decode == "strict":
        raise NotImplementedError(
            "neurondb: real media decode requires an image/audio codec "
            "library (Pillow/ffmpeg); install one and register a decoder"
        )
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[content_col].map(lambda c: _fake_pixels(c, n_values))
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def media_features(
    df: DataFrame, pixels_col: str = "pixels", out_col: str = "media_embedding",
) -> DataFrame:
    """Feature extraction over decoded values — pure expressions (mean,
    std-like moments, edge deltas) standing in for a CLIP-style encoder;
    replaces with a model UDF without plan changes."""
    p = F.col(pixels_col).cast("array<double>")
    n = F.size(p)
    mean = F.aggregate(p, F.lit(0.0), lambda a, x: a + x) / n
    sq = F.aggregate(p, F.lit(0.0), lambda a, x: a + x * x) / n
    deltas = F.zip_with(
        F.slice(p, 1, n - 1), F.slice(p, 2, n - 1), lambda a, b: F.abs(a - b)
    )
    edge = F.aggregate(deltas, F.lit(0.0), lambda a, x: a + x) / (n - 1)
    return df.withColumn(out_col, F.array(mean, F.sqrt(sq - mean * mean), edge))


def frame_sample(
    df: DataFrame, content_col: str = "content", n_frames: int = 4,
    out_col: str = "frames", decode: str = "fake",
) -> DataFrame:
    """Video frame sampling stub: n_frames fake decodes with frame-seeded
    hashing — the batch shape (one row in, array of frames out) is real."""
    if decode == "strict":
        raise NotImplementedError("neurondb: real frame sampling requires ffmpeg")
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField(out_col, T.ArrayType(T.ArrayType(T.FloatType())))]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = pdf[content_col].map(
                lambda c: [_fake_pixels((c or b"") + bytes([i]), 8) for i in range(n_frames)]
            )
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def cross_modal_search(
    media_df: DataFrame, text_query: str, k: int = 5,
    emb_col: str = "media_embedding", id_col: str = "media_id",
) -> DataFrame:
    """cross_modal_search (ml_multimodal.c:61): embed the text query into
    the same (stub) feature space, kNN over media embeddings."""
    from neurondb_spark.functions.embed import hash_embed_py
    from neurondb_spark.operators.knn import knn

    q = hash_embed_py(text_query, 3)
    return knn(media_df, emb_col, q, k=k, metric="l2", dim=3, tiebreak=[id_col])
