"""Logical-plan level rewrites (SURVEY §4).

The one custom rule the reference's planner applies that Catalyst does not:
``ORDER BY distance LIMIT k`` over an indexed table becomes an ANN probe
(NeuronDB/src/planner/planner.c:49-91 `auto_route_query`;
hnsw_am.c:735-783 / ivf_am.c costestimate pick the access method).
"""

from neurondb_spark.plans.knn_rewrite import explain_knn_rewrite, rewrite_knn

__all__ = ["explain_knn_rewrite", "rewrite_knn"]
