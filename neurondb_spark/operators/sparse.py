"""Sparse retrieval: inverted-index search (SURVEY §2.5).

Reference: sparse_search / sparse_index_create/search
(NeuronDB/src/search/sparse_search.c:40, src/index/sparse_index.c): an
inverted index term → postings, query scores = Σ w_q(t)·w_d(t) over shared
terms.

Spark-first: the "index" is a (term, doc_id, weight) DataFrame — explode
once, write bucketed/partitioned by term at scale. A query is a semi-join
on its terms + groupBy(doc) sum: one shuffle keyed by term (pruned to the
query's terms — selective scan), one by doc_id. SPLADE/ColBERT learned
weights (sparse_search.c:155,273) slot in by replacing the tf weight
column; here the deterministic tf weight is the oracle-checkable surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from neurondb_spark.functions.text import _py_tokenize, tokenize


def build_inverted_index(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(term, doc_id, tf) postings — sparse_index_create analog."""
    ex = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("term"))
    return ex.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))


def sparse_search(
    index: DataFrame, query: str, id_col: str, k: int = 10,
    query_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Top-k docs by Σ_t w_q(t) · tf(t, d) over the query's terms."""
    terms = []
    for t in _py_tokenize(query):
        if t not in terms:
            terms.append(t)
    if not terms:
        raise ValueError("neurondb: sparse_search needs at least one query term")
    w = query_weights or {}
    postings = index.where(F.col("term").isin(terms))
    weight = None
    for t in terms:
        c = F.when(F.col("term") == t, F.lit(float(w.get(t, 1.0)))).otherwise(None)
        weight = c if weight is None else F.coalesce(weight, c)
    scored = postings.withColumn("_w", weight)
    return (
        scored.groupBy(id_col)
        .agg(F.sum(F.col("tf").cast("double") * F.col("_w")).alias("sparse_score"))
        .orderBy(F.col("sparse_score").desc(), F.col(id_col).asc())
        .limit(k)
    )
