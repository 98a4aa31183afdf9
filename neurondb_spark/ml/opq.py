"""OPQ rotation (SURVEY §2.8 / §2.10 PQ row).

Reference: train_opq_rotation / apply_opq_rotation
(NeuronDB/src/ml/ml_opq.c:94-480). The reference's "OPQ" is explicitly a
PCA-based rotation ("practical approximation to full OPQ iterative
optimization"): eigendecompose the data covariance and use the
eigenvector basis as the rotation before product quantization.

Spark-first: the covariance is accumulated DISTRIBUTED (per-partition
X'X / Σx outer products via mapInPandas, summed on the driver — a
dim×dim matrix, tiny), the eigh runs in numpy, and apply is a
vectorized pandas-UDF matmul. No row cap.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_opq_rotation(
    df: DataFrame, vec_col: str, num_subspaces: int = 8
) -> np.ndarray:
    """Rotation matrix R (dim×dim, rows = eigenvectors by descending
    eigenvalue) — train_opq_rotation semantics (ml_opq.c:94-390)."""
    if not 2 <= num_subspaces <= 64:
        raise ValueError("neurondb: num_subspaces must be in [2, 64]")
    first = df.select(vec_col).head()
    if first is None:
        raise ValueError("neurondb: no vectors to train OPQ rotation")
    dim = len(first[0])
    if dim % num_subspaces != 0:
        raise ValueError(
            f"neurondb: dim {dim} must be divisible by num_subspaces {num_subspaces}"
        )

    def _moments(batches):
        import pandas as pd

        xtx = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if len(X):
                xtx += X.T @ X
                s += X.sum(0)
                n += len(X)
        yield pd.DataFrame(
            {"xtx": [xtx.ravel().tolist()], "s": [s.tolist()], "n": [n]}
        )

    parts = df.select(vec_col).mapInPandas(
        _moments, "xtx array<double>, s array<double>, n long"
    ).collect()
    xtx = sum(np.array(p["xtx"]).reshape(dim, dim) for p in parts)
    s = sum(np.array(p["s"]) for p in parts)
    n = sum(p["n"] for p in parts)
    if n < 2:
        raise ValueError("neurondb: OPQ rotation needs >= 2 vectors")
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    return eigvecs[:, order].T  # rows = principal directions


def apply_opq_rotation(
    df: DataFrame, vec_col: str, rotation: np.ndarray, out_col: str = "rotated"
) -> DataFrame:
    """apply_opq_rotation (ml_opq.c:396-480): y = R·x per row, vectorized
    batch matmul executor-side; the (small) rotation rides the closure."""
    R = np.asarray(rotation, dtype=np.float64)
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<double>"

    def _apply(batches):
        for pdf in batches:
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = (X @ R.T) if len(X) else np.zeros((0, R.shape[0]))
            yield pdf.assign(**{out_col: [list(map(float, y)) for y in out]})

    return df.mapInPandas(_apply, schema)
