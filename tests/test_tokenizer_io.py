"""Tokenizer artifact save/load + the engine train/apply facade
(operators/tokenizer_io.py, engine.train_tokenizer/tokenize_with)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_save_load_roundtrip(tmp_path):
    from neurondb_spark.operators.tokenizer_io import (
        load_tokenizer,
        save_tokenizer,
    )

    merges = [("a", "b", 7), ("ab", "c", 3)]
    p = str(tmp_path / "tok.json")
    save_tokenizer(p, merges, {"num_merges": 2})
    got, meta = load_tokenizer(p)
    assert got == merges and meta == {"num_merges": 2}
    # unknown format refused
    import json

    with open(p, "w") as f:
        json.dump({"format": "other", "merges": []}, f)
    with pytest.raises(ValueError, match="not a neurondb-bpe-v1"):
        load_tokenizer(p)


def test_engine_train_and_tokenize_with(spark):
    """engine.train_tokenizer persists the learned table in the catalog;
    tokenize_with applies it — and the applied tokenization agrees with
    the training run's own final word table (the hash-gated identity)."""
    from neurondb_spark.engine import NeuronSparkEngine
    from neurondb_spark.operators.bpe import (
        bpe_token_counts,
        bpe_train,
        bpe_word_table,
    )

    eng = NeuronSparkEngine(spark, tempfile.mkdtemp(prefix="tok_cat_"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = eng.train_tokenizer("doc_bpe", docs, "text", num_merges=6)
    assert len(merges) == 6
    meta = eng.catalog.get("tokenizers", "doc_bpe")
    assert meta and meta["num_merges"] == 6
    # distributed-loop parity (hybrid trainer bit-equality, re-proven
    # through the persistence path)
    m_dist, final = bpe_train(bpe_word_table(docs, "text"), 6)
    assert merges == m_dist
    # applying the SAVED tokenizer re-tokenizes the corpus to exactly
    # the training run's token counts
    toks = eng.tokenize_with("doc_bpe", docs, "text", out_col="toks")
    applied = (
        toks.select(F.explode("toks").alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("occurrences"))
    )
    want = {(r["token"], r["occurrences"])
            for r in bpe_token_counts(final).collect()}
    got = {(r["token"], r["occurrences"]) for r in applied.collect()}
    assert got == want
    with pytest.raises(ValueError, match="unknown tokenizer"):
        eng.tokenize_with("nope", docs, "text")


def test_vocab_apply_equals_expression_apply(spark):
    """The corpus-scale vocabulary-join apply produces the SAME per-row
    token arrays as the per-occurrence expression form — including empty
    texts and repeated words (position reassembly)."""
    from neurondb_spark.engine import NeuronSparkEngine

    eng = NeuronSparkEngine(spark, tempfile.mkdtemp(prefix="tok_vcat_"))
    rows = [(1, "aa ab aa"), (2, ""), (3, "b aab aa b"), (4, None),
            (5, "zzz")]
    df = spark.createDataFrame(rows, "rid long, txt string")
    train = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    eng.train_tokenizer("vtok", train, "text", num_merges=4)
    via_expr = {r["rid"]: list(r["toks"] or [])
                for r in eng.tokenize_with("vtok", df, "txt",
                                           out_col="toks").collect()}
    via_vocab = {r["rid"]: list(r["toks"])
                 for r in eng.tokenize_with("vtok", df, "txt",
                                            out_col="toks",
                                            id_col="rid").collect()}
    # expression form yields NULL for NULL text; vocab form normalizes
    # to [] — compare on the defined rows and pin the null behavior
    assert via_vocab[4] == []
    for rid in (1, 2, 3, 5):
        assert via_vocab[rid] == via_expr[rid], rid
    # and corpus-wide on real documents at test SF
    docs = train.limit(50)
    e = {r["doc_id"]: list(r["toks"] or [])
         for r in eng.tokenize_with("vtok", docs, "text",
                                    out_col="toks").collect()}
    v = {r["doc_id"]: list(r["toks"])
         for r in eng.tokenize_with("vtok", docs, "text", out_col="toks",
                                    id_col="doc_id").collect()}
    assert v == e
