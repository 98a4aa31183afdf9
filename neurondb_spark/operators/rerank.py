"""Second-stage rerankers (SURVEY §2.6) — operate on (query, candidates).

Reference: src/ml/reranking.c (cross-encoder/LLM/Cohere HTTP-backed with
deterministic lexical fallback), ml_ltr.c (linear feature scoring),
ml_rerank_ensemble.c (weighted + Borda fusion), ml_mmr.c (maximal marginal
relevance).

Design: candidate sets are small (top-N from a first stage), so MMR's
inherently sequential greedy loop runs on a collected candidate list
(driver, ≤ ~1k rows) — same bound the reference imposes by passing arrays.
Everything else stays distributed expressions.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neurondb_spark.functions.text import _py_tokenize, tokenize


def lexical_overlap_score(query: str, doc: Column | str) -> Column:
    """The reference's deterministic no-model rerank fallback: fraction of
    unique query tokens present in the doc (reranking.c cross-encoder
    fallback)."""
    doc_toks = tokenize(doc)
    qtok = []
    for t in _py_tokenize(query):
        if t not in qtok:
            qtok.append(t)
    if not qtok:
        return F.lit(0.0)
    hits = None
    for t in qtok:
        h = F.when(F.array_contains(doc_toks, t), F.lit(1.0)).otherwise(F.lit(0.0))
        hits = h if hits is None else hits + h
    return hits / float(len(qtok))


def rerank_cross_encoder(
    df: DataFrame, text_col: str, query: str, k: int = 10,
    score_col: str = "rerank_score", tiebreak: Sequence[str] = (),
) -> DataFrame:
    """rerank_cross_encoder (reranking.c:92) with the deterministic
    fallback scorer; a model-backed pandas UDF can be swapped in via
    config without changing the plan shape."""
    out = df.withColumn(score_col, lexical_overlap_score(query, text_col))
    order = [F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak]]
    return out.orderBy(*order).limit(k)


def ltr_score(features_col: Column | str, weights: Sequence[float]) -> Column:
    """ltr_score_features (ml_ltr.c:239): dot(features, weights) unrolled."""
    c = F.col(features_col) if isinstance(features_col, str) else features_col
    c = c.cast("array<double>")
    s = None
    for i, w in enumerate(weights):
        term = F.element_at(c, i + 1) * F.lit(float(w))
        s = term if s is None else s + term
    return s


def rerank_ltr(
    df: DataFrame, features_col: str, weights: Sequence[float], k: int = 10,
    score_col: str = "ltr_score", tiebreak: Sequence[str] = (),
) -> DataFrame:
    """rerank_ltr / ltr_rerank_pointwise (reranking.c:945, ml_ltr.c:99)."""
    out = df.withColumn(score_col, ltr_score(features_col, weights))
    order = [F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak]]
    return out.orderBy(*order).limit(k)


def rerank_ensemble_weighted(
    lists: Sequence[DataFrame], id_col: str, score_cols: Sequence[str],
    weights: Sequence[float], k: int | None = None,
) -> DataFrame:
    """rerank_ensemble(_weighted) (reranking.c:1131): weighted sum of
    per-list scores joined on id; missing → 0."""
    out = None
    for i, (lst, sc) in enumerate(zip(lists, score_cols)):
        part = lst.select(F.col(id_col), F.col(sc).alias(f"_s{i}"))
        out = part if out is None else out.join(part, id_col, "full_outer")
    total = None
    for i, w in enumerate(weights):
        c = F.coalesce(F.col(f"_s{i}"), F.lit(0.0)) * F.lit(float(w))
        total = c if total is None else total + c
    res = out.select(F.col(id_col), total.alias("ensemble_score")).orderBy(
        F.col("ensemble_score").desc(), F.col(id_col).asc()
    )
    return res.limit(k) if k else res


def rerank_ensemble_borda(
    lists: Sequence[DataFrame], id_col: str, rank_col: str = "rank",
    k: int | None = None,
) -> DataFrame:
    """rerank_ensemble_borda (ml_rerank_ensemble.c:285): Borda count —
    each list contributes (N - rank) points."""
    out = None
    sizes = [lst.count() for lst in lists]
    for i, lst in enumerate(lists):
        part = lst.select(
            F.col(id_col),
            (F.lit(sizes[i]) - F.col(rank_col)).cast("double").alias(f"_b{i}"),
        )
        out = part if out is None else out.join(part, id_col, "full_outer")
    total = None
    for i in range(len(lists)):
        c = F.coalesce(F.col(f"_b{i}"), F.lit(0.0))
        total = c if total is None else total + c
    res = out.select(F.col(id_col), total.alias("borda_score")).orderBy(
        F.col("borda_score").desc(), F.col(id_col).asc()
    )
    return res.limit(k) if k else res


def mmr_rerank(
    df: DataFrame, vec_col: str, id_col: str, query: Sequence[float],
    lam: float = 0.5, k: int = 10, max_candidates: int = 1000,
) -> list:
    """mmr_rerank (ml_mmr.c:75,236): greedy maximal-marginal-relevance.
    Inherently sequential — runs on the collected candidate set (bounded by
    ``max_candidates``; feed it a first-stage top-N). Returns the selected
    id list in order.

    MMR_i = λ·sim(q, d_i) − (1−λ)·max_{j∈S} sim(d_i, d_j)
    """
    rows = df.select(id_col, vec_col).limit(max_candidates).collect()
    ids = [r[0] for r in rows]
    vecs = [list(map(float, r[1])) for r in rows]

    def cos(a, b):
        ip = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return ip / (na * nb) if na and nb else 0.0

    qsim = [cos(query, v) for v in vecs]
    selected: list[int] = []
    sel_idx: list[int] = []
    while len(selected) < min(k, len(ids)):
        best, best_score = None, None
        for i in range(len(ids)):
            if i in sel_idx:
                continue
            redundancy = max((cos(vecs[i], vecs[j]) for j in sel_idx), default=0.0)
            score = lam * qsim[i] - (1.0 - lam) * redundancy
            if best_score is None or score > best_score or (
                score == best_score and ids[i] < ids[best]
            ):
                best, best_score = i, score
        sel_idx.append(best)
        selected.append(ids[best])
    return selected


def precision_at_k(retrieved: Column, relevant: Column, k: int) -> Column:
    """precision_at_k (ml_recall_metrics.c:64-271) over array columns."""
    inter = F.size(F.array_intersect(F.slice(retrieved, 1, k), relevant))
    return inter.cast("double") / float(k)


def recall_at_k(retrieved: Column, relevant: Column, k: int) -> Column:
    inter = F.size(F.array_intersect(F.slice(retrieved, 1, k), relevant))
    return F.when(F.size(relevant) == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / F.size(relevant).cast("double")
    )


def f1_at_k(retrieved: Column, relevant: Column, k: int) -> Column:
    """f1_at_k (ml_recall_metrics.c:192-254): harmonic mean of P@k and R@k;
    0 when both are ~0 (the reference's 1e-10 guard). Duplicate retrieved
    ids count once (array_intersect), matching the reference's
    break-on-first-match inner loop."""
    p = precision_at_k(retrieved, relevant, k)
    r = recall_at_k(retrieved, relevant, k)
    # parenthesization matches the reference exactly: 2.0 * (p * r) / (p + r)
    return F.when(p + r < 1e-10, F.lit(0.0)).otherwise(2.0 * (p * r) / (p + r))


def mean_reciprocal_rank(retrieved: Column, first_relevant: Column) -> Column:
    """MRR for a single query row: 1/position of the first relevant id."""
    pos = F.array_position(retrieved, first_relevant)
    return F.when(pos == 0, F.lit(0.0)).otherwise(1.0 / pos.cast("double"))
