"""Product quantization: encode/decode round-trip shrinks error vs zeros,
ADC search recall against exact kNN."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.index.pq import PQCodebook, pq_search  # noqa: E402
from neurondb_spark.operators.knn import knn  # noqa: E402
from neurondb_spark.registry.common import qvec  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402
import pytest

DIM = 64


@pytest.mark.slow  # e2e duplicate of driver-gated coverage; extended lane (r16)
def test_pq_roundtrip_and_search(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = PQCodebook.train(emb, "embedding", DIM, m=8, k=16)
    with tempfile.TemporaryDirectory() as td:
        cb.save(td)
        cb = PQCodebook.load(td)

    codes = emb.select("vec_id", cb.encode_expr("embedding").alias("codes"),
                       F.col("embedding"))
    first = codes.head()
    assert len(first["codes"]) == 8
    assert all(0 <= c < 16 for c in first["codes"])

    # reconstruction error must beat the trivial all-zeros quantizer
    dec = codes.select(
        "vec_id",
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                cb.decode_expr("codes"),
                lambda a, b: (a - b) * (a - b),
            ),
            F.lit(0.0), lambda s, x: s + x,
        ).alias("err"),
        F.aggregate(
            F.transform(F.col("embedding").cast("array<double>"), lambda a: a * a),
            F.lit(0.0), lambda s, x: s + x,
        ).alias("norm_sq"),
    )
    tot = dec.agg(F.sum("err").alias("e"), F.sum("norm_sq").alias("n")).head()
    assert tot["e"] < tot["n"] * 0.9  # quantizer captures signal

    # ADC search recall vs exact
    q = qvec(spark, SF_DIR, 5)
    got = {r["vec_id"] for r in pq_search(codes, cb, "codes", q, k=10).collect()}
    want = [r["vec_id"] for r in knn(emb, "embedding", q, k=10, metric="l2",
                                     dim=DIM, tiebreak=["vec_id"]).collect()]
    # the query's own vector must be found (self-match survives quantization)
    assert 5 in got
    assert len(got & set(want)) >= 2  # loose recall on random data


def test_pq_encode_udf_matches_expr(spark):
    """The Arrow-batched encoder must emit the same codes as the
    expression form (same argmin, lowest-index tie-break)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = PQCodebook.train(emb, "embedding", DIM, m=8, k=16)
    a = {r["vec_id"]: r["c"] for r in
         emb.select("vec_id", cb.encode_expr("embedding").alias("c")).collect()}
    b = {r["vec_id"]: r["c"] for r in
         emb.select("vec_id", cb.encode_udf()(F.col("embedding")).alias("c")).collect()}
    mismatched = [k for k in a if a[k] != b[k]]
    assert not mismatched, f"{len(mismatched)} rows differ, e.g. {mismatched[:3]}"


def test_pq_encode_udf_exact_matches_expr(spark):
    """encode_udf_exact must be bit-identical to encode_expr: same
    left-assoc accumulation order, same lowest-index argmin ties."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb = PQCodebook.train(emb, "embedding", DIM, m=8, k=16)
    a = {r["vec_id"]: r["c"] for r in
         emb.select("vec_id", cb.encode_expr("embedding").alias("c")).collect()}
    b = {r["vec_id"]: r["c"] for r in
         emb.select("vec_id",
                    cb.encode_udf_exact()(F.col("embedding")).alias("c")).collect()}
    assert a == b


def test_lloyd_exact_codebook_deterministic_and_usable(spark):
    """train_lloyd_exact: bitwise-identical across runs (it feeds the
    hash gate) and a valid codebook — m books of k sub-dim codewords
    whose ADC search achieves sane recall vs brute force."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    cb1 = PQCodebook.train_lloyd_exact(emb, "embedding", "vec_id",
                                       dim=64, m=8, k=16, iters=2)
    cb2 = PQCodebook.train_lloyd_exact(emb, "embedding", "vec_id",
                                       dim=64, m=8, k=16, iters=2)
    assert cb1.codebooks == cb2.codebooks
    assert len(cb1.codebooks) == 8
    assert all(len(b) == 16 and all(len(c) == 8 for c in b)
               for b in cb1.codebooks)
    q = qvec(spark, SF_DIR)
    codes = emb.select(
        "vec_id", cb1.encode_udf_exact()(F.col("embedding")).alias("codes")
    )
    got = {r["vec_id"] for r in pq_search(codes, cb1, "codes", q, k=10).collect()}
    brute = {
        r["vec_id"]
        for r in knn(emb, "embedding", q, k=10, metric="l2").collect()
    }
    assert len(got & brute) >= 4  # trained PQ recall over 500 rows
