"""Clustering-quality / recommender / community queries (SURVEY §2.8-2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark import oracle as O
from neurondb_spark.ml.cluster_quality import davies_bouldin, similarity_histogram
from neurondb_spark.registry.common import COMPILE_DIM, EMB_DIM, QVEC_CTE, qvec, t


def _q_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return davies_bouldin(emb, "embedding", "label", EMB_DIM)


def _sql_davies_bouldin() -> str:
    # centroid per (label,pos) with decimal(38,9) exact means; scatter and
    # pairwise centroid distances in double; bsum for the cross-row means
    dist_pos = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(generate_series(1, {d}), "
        "i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]) "
        "* (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))), (x, y) -> x + y))"
    ).format(d=EMB_DIM)
    cdist = (
        "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(generate_series(1, {d}), "
        "i -> (a.centroid[i] - b.centroid[i]) * (a.centroid[i] - b.centroid[i]))), "
        "(x, y) -> x + y))"
    ).format(d=EMB_DIM)
    return f"""WITH ex AS (
  SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
  FROM embeddings),
pp AS (
  SELECT label, pos,
    CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*) AS c
  FROM ex GROUP BY label, pos),
cents AS (
  SELECT label, list(c ORDER BY pos) AS centroid FROM pp GROUP BY label),
sc AS (
  SELECT e.label, {O.bsum('d')} / COUNT(*) AS s FROM (
    SELECT e.label, {dist_pos} AS d
    FROM embeddings e JOIN cents c ON e.label = c.label) e
  GROUP BY e.label),
cs AS (SELECT cents.label, centroid, s FROM cents JOIN sc ON cents.label = sc.label),
r AS (
  SELECT a.label AS la, MAX((a.s + b.s) / {cdist}) AS worst
  FROM cs a JOIN cs b ON a.label <> b.label
  GROUP BY a.label)
SELECT {O.bsum('worst')} / COUNT(*) AS davies_bouldin FROM r"""


def _q_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    q = qvec(spark, sf_dir)
    return similarity_histogram(emb, "embedding", "vec_id", q, dim=COMPILE_DIM, bins=10)


def _sql_sim_histogram() -> str:
    sim = O.sql_cosine_similarity("e.embedding", "q.qe", EMB_DIM)
    width = repr((1.0 - (-1.0)) / 10)
    return f"""{QVEC_CTE}
SELECT CAST(least(greatest(floor((({sim}) - (-1.0)) / {width}), 0), 9) AS INTEGER) AS bin,
       COUNT(*) AS n
FROM embeddings e CROSS JOIN q
GROUP BY 1"""


def _q_recommend_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recommend_content_based (ml_recommender.c): items most similar to a
    user's liked item — kNN over item vectors excluding the seed."""
    emb = t(spark, sf_dir, "embeddings")
    q = qvec(spark, sf_dir, 7)
    from neurondb_spark.functions.distance import cosine_similarity
    from neurondb_spark.operators.knn import _query_lit

    sim = cosine_similarity("embedding", _query_lit(q), dim=COMPILE_DIM, checked=False)
    return (
        emb.where(F.col("vec_id") != 7)
        .select("vec_id", sim.alias("similarity"))
        .orderBy(F.col("similarity").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def _sql_recommend_content() -> str:
    sim = O.sql_cosine_similarity("e.embedding", "q.qe", EMB_DIM)
    return f"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 7)
SELECT e.vec_id, {sim} AS similarity
FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 7
ORDER BY similarity DESC, e.vec_id ASC LIMIT 10"""


def _q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vgraph_community_detection analog (vector_graph_ops.c:701):
    synchronous min-label propagation, fixed 3 rounds, over the
    part↔supplier graph → community size distribution."""
    from neurondb_spark.registry.quant_graph import _edges

    e = _edges(spark, sf_dir)
    # bipartite int encoding (even→odd) means the reversed half can't
    # collide with the forward half, and min-propagation is insensitive to
    # duplicate edges — skip the distinct shuffle entirely. localCheckpoint
    # materializes the edge frame once (each iteration re-reads blocks, not
    # the union plan) and truncates per-iteration lineage growth.
    und = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for i in range(3):
        nb = (
            labels.join(und, labels.node == und.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("nb_min"))
        )
        labels = labels.join(nb, "node", "left").select(
            "node", F.least(F.col("lbl"), F.coalesce(F.col("nb_min"), F.col("lbl"))).alias("lbl")
        )
        if i < 2:
            labels = labels.localCheckpoint()
    return (
        labels.groupBy("lbl")
        .agg(F.count(F.lit(1)).alias("community_size"))
        .groupBy("community_size")
        .agg(F.count(F.lit(1)).alias("n_communities"))
    )


def _sql_label_propagation() -> str:
    from neurondb_spark.registry.quant_graph import _SQL_EDGES

    it = """l{K} AS (
  SELECT l.node, least(l.lbl, COALESCE(m.nb_min, l.lbl)) AS lbl
  FROM l{P} l LEFT JOIN (
    SELECT u.dst AS node, MIN(l{P}.lbl) AS nb_min
    FROM l{P} JOIN und u ON l{P}.node = u.src GROUP BY u.dst) m
  ON l.node = m.node)"""
    body = ",\n".join(it.format(K=k, P=k - 1) for k in (1, 2, 3))
    return f"""WITH edges AS ({_SQL_EDGES}),
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM und),
{body},
sizes AS (SELECT lbl, COUNT(*) AS community_size FROM l3 GROUP BY lbl)
SELECT community_size, COUNT(*) AS n_communities FROM sizes GROUP BY 1"""


QUERIES = {
    "davies_bouldin": (_q_davies_bouldin, _sql_davies_bouldin()),
    "similarity_histogram": (_q_sim_histogram, _sql_sim_histogram()),
    "recommend_content_based": (_q_recommend_content, _sql_recommend_content()),
    "community_label_propagation": (_q_label_propagation, _sql_label_propagation()),
}
