"""Hybrid (driver-side) BPE trainer — bit-equality with the distributed
oracle-gated loop (operators/bpe_local.py vs operators/bpe.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def _word_map(df):
    return {r["word"]: (r["cnt"], tuple(r["symbols"])) for r in df.collect()}


def test_hybrid_equals_distributed_k10(spark):
    """Same merges (order, pairs, counts) and same final word symbols as
    bpe_train at the gate's K=10 over the documents corpus."""
    from neurondb_spark.operators.bpe import bpe_train, bpe_word_table
    from neurondb_spark.operators.bpe_local import bpe_train_hybrid

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = bpe_word_table(docs, "text").localCheckpoint(eager=True)
    m_dist, f_dist = bpe_train(words, 10)
    m_hyb, f_hyb = bpe_train_hybrid(words, 10)
    assert m_hyb == m_dist
    assert _word_map(f_hyb) == _word_map(f_dist)


def test_hybrid_token_counts_compose(spark):
    """bpe_token_counts over the hybrid final_words equals the
    distributed path's — the tokenize-counts gate row's shape."""
    from pyspark.sql import functions as F

    from neurondb_spark.operators.bpe import (
        bpe_token_counts,
        bpe_train,
        bpe_word_table,
    )
    from neurondb_spark.operators.bpe_local import bpe_train_hybrid

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = bpe_word_table(docs, "text").localCheckpoint(eager=True)
    _, f_dist = bpe_train(words, 5)
    _, f_hyb = bpe_train_hybrid(words, 5)

    def top(f):
        return bpe_token_counts(f).orderBy(
            F.col("occurrences").desc(), F.col("token").asc()
        ).limit(50).collect()

    assert [tuple(r) for r in top(f_hyb)] == [tuple(r) for r in top(f_dist)]


def test_hybrid_early_stop_and_contracts(spark):
    """Merging past exhaustion stops early (every word one symbol), and
    num_merges < 1 raises like the distributed loop."""
    from neurondb_spark.operators.bpe_local import bpe_train_hybrid

    words = spark.createDataFrame(
        [("ab", 3, ["a", "b"]), ("b", 5, ["b"])],
        "word string, cnt long, symbols array<string>",
    )
    merges, final = bpe_train_hybrid(words, 50)
    assert merges == [("a", "b", 3)]
    assert _word_map(final) == {"ab": (3, ("ab",)), "b": (5, ("b",))}
    with pytest.raises(ValueError, match="num_merges"):
        bpe_train_hybrid(words, 0)


def test_hybrid_summary_equals_dataframe_aggregate(spark):
    """bpe_train_hybrid_summary (r16: driver-side vocabulary summary, no
    final_words round-trip) returns exactly the values of the old
    count()/sum() aggregate over bpe_token_counts(final_words) — the
    bpe_hybrid_train_k2000 row's contract."""
    from pyspark.sql import functions as F

    from neurondb_spark.operators.bpe import bpe_token_counts, bpe_word_table
    from neurondb_spark.operators.bpe_local import (
        bpe_train_hybrid,
        bpe_train_hybrid_summary,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = bpe_word_table(docs, "text").localCheckpoint(eager=True)
    merges, final = bpe_train_hybrid(words, 7)
    old = bpe_token_counts(final).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("occurrences").alias("total_occurrences"),
    ).collect()[0]
    got = bpe_train_hybrid_summary(words, 7)
    assert got == (len(merges), old["n_tokens"], old["total_occurrences"])

    # tricky shapes: overlapping self-pairs and multi-word tables
    tricky = spark.createDataFrame(
        [("aaaa", 2, list("aaaa")), ("aab", 4, list("aab"))],
        "word string, cnt long, symbols array<string>",
    )
    m2, f2 = bpe_train_hybrid(tricky, 3)
    old2 = bpe_token_counts(f2).agg(
        F.count(F.lit(1)).alias("n"), F.sum("occurrences").alias("t")
    ).collect()[0]
    assert bpe_train_hybrid_summary(tricky, 3) == (
        len(m2), old2["n"], old2["t"]
    )


def test_hybrid_overlapping_and_stale_index(spark):
    """The incremental statistics survive the tricky cases: overlapping
    pair counting ("aaaa"), repeated merges of self-pairs, and words
    whose indexed pair disappeared before the merge reached it."""
    from neurondb_spark.operators.bpe import bpe_train
    from neurondb_spark.operators.bpe_local import bpe_train_hybrid

    words = spark.createDataFrame(
        [("aaaa", 2, list("aaaa")), ("aab", 4, list("aab")),
         ("baaa", 1, list("baaa")), ("abab", 3, list("abab"))],
        "word string, cnt long, symbols array<string>",
    )
    for k in (1, 2, 3, 6):
        m_d, f_d = bpe_train(words, k)
        m_h, f_h = bpe_train_hybrid(words, k)
        assert m_h == m_d, f"k={k}"
        assert _word_map(f_h) == _word_map(f_d), f"k={k}"
