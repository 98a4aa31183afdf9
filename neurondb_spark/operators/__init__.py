"""DataFrame→DataFrame operators (SURVEY §2.5-2.9): kNN/search, hybrid,
similarity joins, dedup, rerank, graph. All composable transforms that
Catalyst sees end-to-end (unlike the reference's SPI string-SQL detour,
src/search/hybrid_search.c:199-216)."""

from neurondb_spark.operators.knn import (  # noqa: F401
    knn,
    knn_classify,
    knn_regress,
    multi_vector_search,
    faceted_vector_search,
    temporal_vector_search,
    vec_window_rank,
    vec_route,
)
