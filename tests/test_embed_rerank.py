"""Embed/rerank unit tests: the three hash-embed implementations must agree
bit-for-bit (reference parity, embeddings.c:408-438); MMR is deterministic
and diversity-improving."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.functions.embed import (  # noqa: E402
    hash_embed_expr,
    hash_embed_py,
    hash_embed_udf,
)
from tests.conftest import SF_DIR  # noqa: E402


def test_hash_embed_three_ways_agree(spark):
    texts = ["hello world", "the quick brown fox", "a", "hash join merge sort"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    expr_rows = df.select(
        "text", hash_embed_expr("text", 16).alias("e")
    ).collect()
    udf_rows = df.select("text", hash_embed_udf(16)(F.col("text")).alias("e")).collect()
    for er, ur in zip(sorted(expr_rows), sorted(udf_rows)):
        py = hash_embed_py(er["text"], 16)
        assert list(er["e"]) == py
        assert list(ur["e"]) == py


def test_hash_embed_model_seeding():
    a = hash_embed_py("same text", 8, model="model-a")
    b = hash_embed_py("same text", 8, model="model-b")
    assert a != b
    assert hash_embed_py("same text", 8, model="model-a") == a


def test_hash_embed_range():
    v = hash_embed_py("anything at all", 384)
    assert len(v) == 384
    assert all(-1.0 <= x <= 1.0 for x in v)


def test_mmr_deterministic_and_diverse(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from neurondb_spark.operators.knn import knn
    from neurondb_spark.operators.rerank import mmr_rerank
    from neurondb_spark.registry.common import qvec

    q = qvec(spark, SF_DIR)
    cands = knn(emb, "embedding", q, k=30, metric="cosine", dim=64, tiebreak=["vec_id"])
    sel1 = mmr_rerank(cands, "embedding", "vec_id", q, lam=0.7, k=8)
    sel2 = mmr_rerank(cands, "embedding", "vec_id", q, lam=0.7, k=8)
    assert sel1 == sel2
    assert len(set(sel1)) == 8
    # pure-relevance (lam=1) should equal the distance ordering's top-8
    pure = mmr_rerank(cands, "embedding", "vec_id", q, lam=1.0, k=8)
    top8 = [r["vec_id"] for r in cands.limit(8).collect()]
    assert pure == top8
