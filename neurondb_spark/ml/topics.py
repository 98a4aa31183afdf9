"""Topic discovery + embedding whitening (SURVEY §2.8).

Reference: discover_topics_simple (ml_topic_discovery.c:56) — clusters
embeddings and labels clusters by their dominant terms; whiten_embeddings
(ml_pca_whitening.c) — PCA rotation + per-component variance scaling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from neurondb_spark.functions.text import tokenize


def discover_topics(
    docs: DataFrame, emb: DataFrame, text_col: str, doc_id: str, vec_id: str,
    vec_col: str, n_topics: int = 5, top_terms: int = 5, seed: int = 42,
    stopwords: tuple[str, ...] = (),
) -> DataFrame:
    """KMeans topics over embeddings + per-topic top terms:
    (topic, term, tf, term_rank)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        F.col(vec_id),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    km = KMeans(k=n_topics, seed=seed).fit(feats)
    assigned = km.transform(feats).select(
        F.col(vec_id), F.col("prediction").alias("topic")
    )
    joined = docs.join(assigned, docs[doc_id] == assigned[vec_id])
    terms = joined.select("topic", F.explode(tokenize(text_col)).alias("term"))
    if stopwords:
        terms = terms.where(~F.col("term").isin(*stopwords))
    counts = terms.groupBy("topic", "term").agg(F.count(F.lit(1)).alias("tf"))
    w = W.partitionBy("topic").orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        counts.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= top_terms)
        .orderBy("topic", "term_rank")
    )


def whiten_embeddings(
    df: DataFrame, vec_col: str, k: int, out_col: str = "whitened",
    eps: float = 1e-8, seed: int = 42,
) -> DataFrame:
    """PCA-whitening: project onto the top-k principal components and
    scale each to unit variance (rotation via MLlib PCA, variances from
    the explained-variance vector)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.withColumn(
        "_feat", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = PCA(k=k, inputCol="_feat", outputCol="_pca").fit(feats)
    projected = model.transform(feats).withColumn("_arr", vector_to_array("_pca"))
    # per-component std over the projected data (exact semantics,
    # independent of explainedVariance normalization)
    stats = projected.select(
        *[F.stddev_pop(F.col("_arr")[i]).alias(f"s{i}") for i in range(k)]
    ).head()
    stds = [max(float(stats[f"s{i}"]), eps) for i in range(k)]
    whitened = F.array(
        *[(F.col("_arr")[i] / F.lit(stds[i])).alias(f"w{i}") for i in range(k)]
    )
    return projected.withColumn(out_col, whitened).drop("_feat", "_pca", "_arr")
