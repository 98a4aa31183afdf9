"""Similarity / range joins (SURVEY §2.5 vec_join).

Reference: vec_join(ltab, rtab, pred, threshold) — join on a predicate,
keep pairs with L2 ≤ threshold (NeuronDB/src/core/operators.c:535-744; the
reference nested-loops it single-node).

Spark-first design: the equality predicate becomes the shuffle key (hash
join co-locates candidate pairs), the distance threshold is a post-join
filter evaluated as a codegen'd expression. At 100 TB the pred MUST be
selective (a block key): natural keys, LSH buckets (see index/lsh.py), or
IVF cluster ids. A cross join without a block key is refused unless
explicitly allowed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neurondb_spark.functions.distance import distance


def vec_join(
    left: DataFrame,
    right: DataFrame,
    left_vec: str,
    right_vec: str,
    threshold: float,
    on: list[str] | Column | None = None,
    metric: str = "l2",
    dim: int | None = None,
    dist_col: str = "distance",
    allow_cross: bool = False,
    lsuffix: str = "_l",
    rsuffix: str = "_r",
) -> DataFrame:
    """Pairs (l, r) with distance(l.vec, r.vec) ≤ threshold.

    ``on``: equality columns (block key — becomes the hash-join key) or an
    arbitrary join Column. None → cross join (refused unless allow_cross;
    quadratic — only for small candidate sets).
    """
    if on is None and not allow_cross:
        raise ValueError(
            "neurondb: vec_join without a block key is O(n^2); pass "
            "on=[...] (block key) or allow_cross=True"
        )
    lcols = set(left.columns)
    rcols = set(right.columns)
    overlap = (lcols & rcols) - set(on if isinstance(on, list) else [])
    for c in overlap:
        right = right.withColumnRenamed(c, c + rsuffix)
        if right_vec == c:
            right_vec = c + rsuffix
    if on is None:
        joined = left.crossJoin(right)
    elif isinstance(on, list):
        joined = left.join(right, on=on)
    else:
        joined = left.join(right, on=on)
    d = distance(left_vec, right_vec, metric, dim=dim, checked=False)
    return joined.withColumn(dist_col, d).where(F.col(dist_col) <= F.lit(float(threshold)))


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_vec: str,
    right_vec: str,
    left_id: str,
    k: int = 5,
    on: list[str] | None = None,
    metric: str = "l2",
    dim: int | None = None,
    dist_col: str = "distance",
    rsuffix: str = "_r",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, its k nearest right rows (within the block key if
    given) — the kNN-join primitive behind build_knn_graph
    (src/ml/analytics.c:1286). Window top-k per left id after the blocked
    join; one shuffle on the block key + one on left_id. ``tiebreak``
    columns make the k-th-neighbor cut deterministic under distance ties."""
    from pyspark.sql import Window as W

    for c in set(left.columns) & set(right.columns):
        if on and c in on:
            continue
        right = right.withColumnRenamed(c, c + rsuffix)
        if right_vec == c:
            right_vec = c + rsuffix
    joined = left.crossJoin(right) if on is None else left.join(right, on=on)
    d = distance(left_vec, right_vec, metric, dim=dim, checked=False)
    w = W.partitionBy(left_id).orderBy(
        F.col(dist_col).asc(), *[F.col(c).asc() for c in (tiebreak or [])]
    )
    return (
        joined.withColumn(dist_col, d)
        .withColumn("_knn_rn", F.row_number().over(w))
        .where(F.col("_knn_rn") <= k)
        .drop("_knn_rn")
    )
