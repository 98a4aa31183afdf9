"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2,
aggregated from neurondb_spark/registry/*.
``oracle_sql()`` — DuckDB-equivalent SQL for each query (absent entries are
non-SQL-expressible ops → driver records a rows-only check).

Float parity strategy (see neurondb_spark/oracle.py): per-row math is
bit-identical double arithmetic with matching association order; cross-row
sums are routed through DECIMAL(38,6) (order-independent, exact);
transcendental results (exp/log with corpus stats) are rounded identically
on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark.registry import collect
from neurondb_spark.registry.common import EMB_DIM, qvec


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: cosine kNN over embeddings joined to documents (a semantic
    search result page) at sf0.001."""
    from neurondb_spark.operators.knn import knn
    from neurondb_spark.registry.common import t

    sf_dir = "/root/testdata/sf0.001"
    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents")
    q = qvec(spark, sf_dir)
    top = knn(emb, "embedding", q, k=10, metric="cosine", dim=EMB_DIM, tiebreak=["vec_id"])
    return top.join(
        F.broadcast(docs), top.vec_id == docs.doc_id, "left"
    ).select("vec_id", "label", "distance", "lang", "source")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in collect().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in collect().items() if sql is not None}
