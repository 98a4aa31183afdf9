"""Index tuning / recommendation heuristics (SURVEY §2.11).

Reference: index_recommend_type, index_tune_hnsw/ivf,
index_tune_query_params, neurondb_validate/diag, index_statistics
(neurondb--1.0.sql:2611-2693; src/index/index_tuning.c,
index_validator.c). The reference's heuristics are honest row-count ×
dim rules; ours are too, with Spark-specific layout advice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def index_recommend_type(n_rows: int, dim: int, query_rate: str = "batch") -> dict:
    """index_recommend_type analog: exact vs IVF vs LSH by size."""
    if n_rows < 100_000:
        rec, why = "exact", "TakeOrderedAndProject scans this size faster than any index build amortizes"
    elif query_rate == "online" or n_rows > 50_000_000:
        rec, why = "ivf", "partition-pruned probe bounds latency; nprobe trades recall"
    else:
        rec, why = "ivf", "batch reindex cost amortized; LSH only if cosine-only and heavy skew"
    return {"recommended": rec, "reason": why, "n_rows": n_rows, "dim": dim}


def ivf_tune(n_rows: int, target_recall: float = 0.9) -> dict:
    """index_tune_ivf analog: nlists ≈ sqrt(N) (classic heuristic, clamped
    to the reference's bounds), nprobe scaled by target recall."""
    nlists = max(16, min(65536, int(n_rows ** 0.5)))
    nprobe = max(1, min(nlists, int(nlists * (0.02 + 0.3 * max(0.0, target_recall - 0.5)))))
    return {"nlists": nlists, "nprobe": nprobe, "target_recall": target_recall}


def lsh_tune(dim: int, target_recall: float = 0.9) -> dict:
    """HNSW-niche tuning mapped onto LSH: more bits = smaller buckets
    (faster, lower recall); probe radius recovers recall."""
    nbits = max(4, min(24, dim // 4))
    probe = 1 if target_recall < 0.8 else 2 if target_recall < 0.95 else 3
    return {"nbits": nbits, "probe_hamming": probe}


def validate_vectors(df: DataFrame, vec_col: str, dim: int) -> dict:
    """neurondb_validate analog: null / dim-mismatch / non-finite counts in
    one aggregation pass."""
    v = F.col(vec_col)
    has_nonfinite = F.exists(
        v.cast("array<double>"), lambda x: F.isnan(x) | (F.abs(x) == float("inf"))
    )
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).alias("nulls"),
        F.sum(F.when(v.isNotNull() & (F.size(v) != dim), 1).otherwise(0)).alias("dim_mismatch"),
        F.sum(F.when(v.isNotNull() & has_nonfinite, 1).otherwise(0)).alias("non_finite"),
    ).head()
    d = row.asDict()
    d["valid"] = d["nulls"] == 0 and d["dim_mismatch"] == 0 and d["non_finite"] == 0
    return d
