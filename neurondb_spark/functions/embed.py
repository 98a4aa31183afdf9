"""Deterministic hash embeddings + embed/RAG surface (SURVEY §2.7).

Reference: embed_text's no-API-key fallback generates a deterministic
pseudo-embedding via a djb2-XOR hash chain
(NeuronDB/src/ml/embeddings.c:408-438):

    h = 5381;  for each byte c of text:  h = (h*33) ^ c      (uint32)
    for i in 0..dim-1:
        h = (h*33) ^ key_i          # key_i = model[i % len(model)] or i
        e_i = ((h % 2000) - 1000) / 1000.0

This fallback IS the reproducible test semantic (SURVEY §5) — external
HTTP backends are optional and out of the correctness gate.

Three implementations, same bit semantics:
- :func:`hash_embed_py` — driver-side Python (embed a query string)
- :func:`hash_embed_expr` — pure Column expression (char fold via
  ``aggregate``, per-dim chain unrolled); tree grows O(dim²), use for
  dim ≲ 32
- :func:`hash_embed_udf` — Arrow-batched pandas UDF; the 100 TB path for
  full-width (384-d) corpus embedding: one numpy loop per batch, no
  expression blowup, trivially parallel across partitions
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (resolves pandas_udf type hints)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MASK = 0xFFFFFFFF


def _keys(dim: int, model: str | None) -> list[int]:
    if model:
        mb = model.encode("utf-8")
        return [mb[i % len(mb)] for i in range(dim)]
    return list(range(dim))


def hash_embed_py(text: str, dim: int = 384, model: str | None = None) -> list[float]:
    """Reference-parity Python implementation (embeddings.c:408-438)."""
    h = 5381
    for b in text.encode("utf-8"):
        h = ((h * 33) ^ b) & MASK
    out = []
    for k in _keys(dim, model):
        h = ((h * 33) ^ k) & MASK
        out.append(((h % 2000) - 1000) / 1000.0)
    return out


def hash_embed_expr(text: Column | str, dim: int = 16, model: str | None = None) -> Column:
    """Column-expression hash embedding (ASCII inputs; the driver corpus is
    ASCII — multi-byte text should use :func:`hash_embed_udf` which hashes
    UTF-8 bytes exactly like the reference)."""
    t = F.col(text) if isinstance(text, str) else text
    chars = F.split(t, "")
    h0 = F.aggregate(
        F.transform(chars, F.ascii),
        F.lit(5381).cast("long"),
        lambda h, c: ((h * 33).bitwiseXOR(c.cast("long"))).bitwiseAND(F.lit(MASK)),
    )
    vals = []
    h = h0
    for k in _keys(dim, model):
        h = ((h * 33).bitwiseXOR(F.lit(k))).bitwiseAND(F.lit(MASK))
        vals.append(((h % 2000) - 1000).cast("double") / 1000.0)
    return F.array(*vals)


def sql_hash_embed_cols(text: str, dim: int, model: str | None = None) -> list[str]:
    """DuckDB SQL mirroring :func:`hash_embed_expr`: one expression per
    dimension (e0..e{dim-1}), sharing the char-fold via a CTE is up to the
    caller; these expressions inline it."""
    chars = f"list_transform(generate_series(1, length({text})), i -> ascii(substr({text}, i, 1)))"
    h = f"list_reduce(list_prepend(CAST(5381 AS BIGINT), {chars}), (h, c) -> xor(h * 33, c) % 4294967296)"
    cols = []
    cur = h
    for k in _keys(dim, model):
        cur = f"(xor(({cur}) * 33, {k}) % 4294967296)"
        cols.append(f"(CAST((({cur}) % 2000) - 1000 AS DOUBLE) / 1000.0)")
    return cols


def hash_embed_udf(dim: int = 384, model: str | None = None):
    """Arrow-batched pandas UDF — the corpus-scale embed path."""
    from pyspark.sql.functions import pandas_udf

    keys = _keys(dim, model)

    @pandas_udf("array<double>")
    def _embed(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            h = 5381
            for b in (s or "").encode("utf-8"):
                h = ((h * 33) ^ b) & MASK
            vec = []
            for k in keys:
                h = ((h * 33) ^ k) & MASK
                vec.append(((h % 2000) - 1000) / 1000.0)
            out.append(vec)
        return pd.Series(out)

    return _embed


def embed_text(
    df: DataFrame, text_col: str, out_col: str = "embedding",
    dim: int = 384, model: str | None = None, use_expr_below_dim: int = 32,
) -> DataFrame:
    """embed_text / embed_text_batch / neurondb_embed surface
    (embeddings.c:332,464,1079): columnar batch embedding. In Spark the
    batch form IS the column form — one pass, partition-parallel."""
    if dim <= use_expr_below_dim:
        return df.withColumn(out_col, hash_embed_expr(text_col, dim, model))
    return df.withColumn(out_col, hash_embed_udf(dim, model)(F.col(text_col)))


def embed_cached(
    df: DataFrame, cache: DataFrame, text_col: str, out_col: str = "embedding",
    dim: int = 384, model: str | None = None,
) -> DataFrame:
    """embed_cached (embeddings.c:1104-1123): left-join an embedding-cache
    table on the text key; compute only misses, union back. Cache hits are
    a broadcast/shuffle join, misses run the UDF — exactly the cache-table
    semantics of the reference, distributed."""
    cached = df.join(cache, on=text_col, how="left")
    hits = cached.where(F.col(out_col).isNotNull())
    misses = cached.where(F.col(out_col).isNull()).drop(out_col)
    computed = embed_text(misses, text_col, out_col, dim, model)
    return hits.unionByName(computed)


def rag_query(
    df: DataFrame, vec_col: str, text_cols: list[str], query_text: str,
    k: int = 5, dim: int = 384, model: str | None = None,
    metric: str = "cosine", tiebreak: list[str] | None = None,
) -> DataFrame:
    """neurondb.rag_query (neurondb--1.0.sql:6065-6090): embed the query
    deterministically, kNN over the corpus, return the context columns."""
    from neurondb_spark.operators.knn import knn

    qv = hash_embed_py(query_text, dim, model)
    top = knn(df, vec_col, qv, k=k, metric=metric, dim=dim, tiebreak=tiebreak or [])
    return top.select(*text_cols, "distance")
