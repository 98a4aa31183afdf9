"""Heuristic NLP surface tests."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neurondb_spark.functions.nlp import (  # noqa: E402
    classify_text,
    extract_entities,
    preprocess,
    sentiment_score,
    splade_embed_stub,
    summarize_text,
    text_similarity_semantic,
)


def test_sentiment(spark):
    df = spark.createDataFrame(
        [("this is great and fast, love it",), ("slow broken error bad",), ("neutral words only",)],
        "t string",
    )
    scores = [r[0] for r in df.select(sentiment_score("t")).collect()]
    assert scores[0] > 0 > scores[1]
    assert scores[2] == 0.0


def test_classify(spark):
    cats = {"db": ["join", "query", "index"], "ml": ["train", "model", "predict"]}
    df = spark.createDataFrame(
        [("the query uses a hash join",), ("train the model then predict",), ("hello",)],
        "t string",
    )
    out = [r[0] for r in df.select(classify_text("t", cats)).collect()]
    assert out == ["db", "ml", "other"]


def test_entities_and_summary(spark):
    df = spark.createDataFrame(
        [("The engine Spark talks to Postgres daily. It is fast. Really fast.",)], "t string"
    )
    ents = df.select(extract_entities("t")).head()[0]
    assert "Spark" in ents and "Postgres" in ents and "The" not in ents
    s = df.select(summarize_text("t", 2)).head()[0]
    assert s.endswith("It is fast.")


def test_splade_stub_deterministic(spark):
    df = spark.createDataFrame([("hash join hash",)], "t string")
    m1 = df.select(splade_embed_stub("t").alias("m")).head()["m"]
    m2 = df.select(splade_embed_stub("t").alias("m")).head()["m"]
    assert m1 == m2
    assert sum(m1.values()) == 3.0  # tf mass = token count


def test_preprocess_dispatch(spark):
    df = spark.createDataFrame([([1.0, 3.0],)], "v array<double>")
    mm = df.select(preprocess("v", "minmax").alias("o")).head()["o"]
    assert mm == [0.0, 1.0]
    with pytest.raises(ValueError, match="unknown preprocess"):
        preprocess("v", "nope")


@pytest.mark.slow  # e2e duplicate of driver-gated coverage; extended lane (r16)
def test_text_similarity_semantic(spark):
    df = spark.createDataFrame([("same text", "same text", "different words here")],
                               "a string, b string, c string")
    row = df.select(
        text_similarity_semantic("a", "b").alias("ss"),
        text_similarity_semantic("a", "c").alias("sd"),
    ).head()
    assert row["ss"] == pytest.approx(1.0)
    assert row["sd"] < 1.0


def test_zero_shot_classify(spark):
    from neurondb_spark.functions.nlp import zero_shot_classify

    df = spark.createDataFrame(
        [(1, "the database index and query planner"),
         (2, "training a model on vector embeddings"),
         (3, "zzz qqq")],
        ["id", "text"],
    )
    out = {r["id"]: r["c"] for r in df.select(
        "id", zero_shot_classify("text", ["database query", "model training"]).alias("c")
    ).collect()}
    assert out == {1: "database query", 2: "model training", 3: "other"}


def test_answer_question(spark):
    from neurondb_spark.functions.nlp import answer_question

    ctx = "Spark is a cluster engine. HNSW is a graph index. Parquet stores columns."
    df = spark.createDataFrame([(ctx,)], ["context"])
    row = df.select(
        answer_question("what is a graph index", "context").alias("a")
    ).head()
    assert row["a"] == "HNSW is a graph index."


def test_answer_question_tie_takes_first(spark):
    from neurondb_spark.functions.nlp import answer_question

    df = spark.createDataFrame([("No match one. No match two.",)], ["context"])
    row = df.select(answer_question("absent words", "context").alias("a")).head()
    assert row["a"] == "No match one."


def test_fill_mask_and_text2text(spark):
    import pytest as _pytest

    from neurondb_spark.functions.nlp import fill_mask, text2text

    df = spark.createDataFrame([("over [MASK] lazy dog. Second sentence. Third.",)], ["t"])
    assert df.select(fill_mask("t").alias("o")).head()["o"].startswith("over the lazy")
    assert df.select(text2text("t", "uppercase").alias("o")).head()["o"].startswith("OVER")
    # summarize keeps first 2 sentences
    assert df.select(text2text("t", "summarize").alias("o")).head()["o"].endswith("Second sentence.")
    with _pytest.raises(ValueError, match="unknown text2text"):
        text2text("t", "bogus")
