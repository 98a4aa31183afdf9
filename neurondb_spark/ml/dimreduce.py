"""t-SNE / UMAP dimensionality reduction (SURVEY §2.8).

Reference: reduce_tsne / reduce_umap (NeuronDB/src/ml/
ml_dimensionality_reduction.c:60-820) — both are explicitly single-node
in-memory implementations (full pairwise matrices in backend RAM). The
Spark mapping is therefore sample-to-driver with a hard cap + seed: a
deterministic sample is collected, the same algorithm runs in numpy
(vectorized — the analog of the reference's C loops), and the embedding
comes back as a DataFrame keyed by id. For corpus-scale visualization,
reduce a sample and project the rest via nearest-landmark interpolation
(out of scope here, as in the reference).

t-SNE: per-point sigma by binary search to the target perplexity
(ml_dimensionality_reduction.c:150-260 does the same), symmetrized P,
gradient descent with momentum on the Student-t Q.

UMAP: kNN graph → fuzzy simplicial probabilities exp(−(d−rho)/sigma)
with sigma binary-searched to log2(k) (ml_dimensionality_reduction.c:
620-700), symmetrized a+b−ab, then attraction/repulsion SGD.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame


def _collect_sample(df: DataFrame, vec_col: str, id_col: str, cap: int):
    rows = (
        df.select(id_col, vec_col).orderBy(id_col).limit(cap).collect()
    )
    ids = [r[0] for r in rows]
    X = np.array([list(map(float, r[1])) for r in rows], dtype=np.float64)
    return ids, X


def _perplexity_probs(D2: np.ndarray, perplexity: float) -> np.ndarray:
    """Row-wise conditional P with sigma binary-searched so the row entropy
    hits log(perplexity)."""
    n = D2.shape[0]
    P = np.zeros((n, n))
    target = math.log(perplexity)
    for i in range(n):
        lo, hi, beta = 1e-20, 1e20, 1.0
        d = np.delete(D2[i], i)
        for _ in range(50):
            w = np.exp(-d * beta)
            s = w.sum()
            if s <= 0:
                beta /= 2.0
                continue
            H = math.log(s) + beta * float((d * w).sum()) / s
            if abs(H - target) < 1e-5:
                break
            if H > target:
                lo, beta = beta, beta * 2.0 if hi >= 1e20 else (beta + hi) / 2.0
            else:
                hi, beta = beta, (lo + beta) / 2.0
        w = np.exp(-np.delete(D2[i], i) * beta)
        w /= max(w.sum(), 1e-12)
        P[i, np.arange(n) != i] = w
    return P


def tsne(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_components: int = 2,
    perplexity: float = 30.0,
    learning_rate: float | None = None,
    iterations: int = 250,
    sample_cap: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """reduce_tsne analog; returns (id_col, embedding array<double>).

    ``learning_rate=None`` → max(n/12, 50): the gradient magnitude scales
    with n, so a fixed rate (the reference's 200 default) diverges on
    small samples and crawls on large ones."""
    spark = df.sparkSession
    ids, X = _collect_sample(df, vec_col, id_col, sample_cap)
    n = len(ids)
    if n < 3:
        raise ValueError("neurondb: tsne needs >= 3 vectors")
    if learning_rate is None:
        learning_rate = max(n / 12.0, 50.0)
    perplexity = min(perplexity, (n - 1) / 3.0)
    sq = (X * X).sum(1)
    D2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0)
    P = _perplexity_probs(D2, perplexity)
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)
    rng = np.random.RandomState(seed)
    Y = rng.normal(0.0, 1e-4, size=(n, n_components))
    dY = np.zeros_like(Y)
    for it in range(iterations):
        exaggeration = 4.0 if it < min(50, iterations // 4) else 1.0
        ysq = (Y * Y).sum(1)
        num = 1.0 / (1.0 + np.maximum(ysq[:, None] + ysq[None, :] - 2.0 * (Y @ Y.T), 0.0))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        PQ = (exaggeration * P - Q) * num
        grad = 4.0 * ((np.diag(PQ.sum(1)) - PQ) @ Y)
        momentum = 0.5 if it < 20 else 0.8
        dY = momentum * dY - learning_rate * grad
        Y = Y + dY
        Y = Y - Y.mean(0)
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({id_col: ids, "embedding": [list(map(float, y)) for y in Y]})
    )


def autoencoder_reduce(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bottleneck_dim: int = 2,
    hidden: list[int] | None = None,
    activation: str = "tanh",
    learning_rate: float = 0.01,
    epochs: int = 100,
    batch_size: int = 32,
    sample_cap: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """Autoencoder dimensionality reduction (train_autoencoder,
    ml_dimensionality_reduction.c:826-1400): encoder layers → bottleneck →
    mirrored decoder, the chosen activation applied on every layer (as the
    reference's forward pass does), MSE reconstruction loss, SGD. Trains
    on the capped seeded sample (the reference trains on all rows in
    backend RAM) and returns (id, encoded array<double>).

    ``activation``: relu | sigmoid | tanh (ae_activation_*,
    ml_dimensionality_reduction.c:826-864). tanh default — zero-centered,
    so unit-normalized embeddings reconstruct without a bias workaround.
    """
    acts = {
        "relu": (lambda z: np.maximum(z, 0.0), lambda a: (a > 0).astype(float)),
        "sigmoid": (lambda z: 1.0 / (1.0 + np.exp(-z)), lambda a: a * (1.0 - a)),
        "tanh": (np.tanh, lambda a: 1.0 - a * a),
    }
    if activation not in acts:
        raise ValueError(f"neurondb: unknown activation {activation!r}")
    f, fprime = acts[activation]
    spark = df.sparkSession
    ids, X = _collect_sample(df, vec_col, id_col, sample_cap)
    n, dim = X.shape
    if n < 2:
        raise ValueError("neurondb: autoencoder needs >= 2 vectors")
    sizes = [dim] + (hidden or []) + [bottleneck_dim] + list(reversed(hidden or [])) + [dim]
    rng = np.random.RandomState(seed)
    Ws = [
        rng.normal(0.0, math.sqrt(2.0 / sizes[i]), size=(sizes[i], sizes[i + 1]))
        for i in range(len(sizes) - 1)
    ]
    bs = [np.zeros(s) for s in sizes[1:]]
    enc_idx = (hidden or []).__len__() + 1  # layers up to the bottleneck
    for _ in range(epochs):
        perm = rng.permutation(n)
        for s in range(0, n, batch_size):
            batch = X[perm[s:s + batch_size]]
            a = [batch]
            for W, b in zip(Ws, bs):
                a.append(f(a[-1] @ W + b))
            delta = (a[-1] - batch) * fprime(a[-1])
            for li in range(len(Ws) - 1, -1, -1):
                gW = a[li].T @ delta / len(batch)
                gb = delta.mean(0)
                if li > 0:
                    delta = (delta @ Ws[li].T) * fprime(a[li])
                Ws[li] -= learning_rate * gW
                bs[li] -= learning_rate * gb
    h = X
    for W, b in zip(Ws[:enc_idx], bs[:enc_idx]):
        h = f(h @ W + b)
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({id_col: ids, "encoded": [list(map(float, y)) for y in h]})
    )


def umap(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_components: int = 2,
    n_neighbors: int = 15,
    learning_rate: float = 1.0,
    iterations: int = 200,
    negative_samples: int = 5,
    sample_cap: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """reduce_umap analog; returns (id_col, embedding array<double>)."""
    spark = df.sparkSession
    ids, X = _collect_sample(df, vec_col, id_col, sample_cap)
    n = len(ids)
    if n < 3:
        raise ValueError("neurondb: umap needs >= 3 vectors")
    k = min(n_neighbors, n - 1)
    sq = (X * X).sum(1)
    D = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2.0 * (X @ X.T), 0.0))
    np.fill_diagonal(D, np.inf)
    nbrs = np.argsort(D, axis=1)[:, :k]
    # fuzzy simplicial set: rho = nearest distance; sigma via binary search
    # so Σ_j exp(−(d−rho)/sigma) = log2(k)  (ml_dimensionality_reduction.c:620-700)
    target = math.log2(k) if k > 1 else 1.0
    P = np.zeros((n, n))
    for i in range(n):
        d = D[i, nbrs[i]]
        rho = d[0]
        lo, hi = 1e-8, 1e3
        for _ in range(50):
            sigma = (lo + hi) / 2.0
            s = float(np.exp(-np.maximum(d - rho, 0.0) / sigma).sum())
            if abs(s - target) < 1e-5:
                break
            if s > target:
                hi = sigma
            else:
                lo = sigma
        P[i, nbrs[i]] = np.exp(-np.maximum(d - rho, 0.0) / sigma)
    P = P + P.T - P * P.T  # fuzzy union
    rng = np.random.RandomState(seed)
    Y = rng.normal(0.0, 1e-4, size=(n, n_components))
    edges = np.argwhere(P > 0)
    weights = P[edges[:, 0], edges[:, 1]]
    for it in range(iterations):
        alpha = learning_rate * (1.0 - it / iterations)
        # attraction along sampled edges, weighted by membership strength
        keep = rng.random(len(edges)) < weights
        e = edges[keep]
        if len(e):
            diff = Y[e[:, 0]] - Y[e[:, 1]]
            d2 = (diff * diff).sum(1, keepdims=True)
            g = np.clip(-2.0 * diff / (1.0 + d2), -4.0, 4.0)
            np.add.at(Y, e[:, 0], alpha * g)
            np.add.at(Y, e[:, 1], -alpha * g)
            # repulsion from random negative samples
            for _ in range(negative_samples):
                j = rng.randint(0, n, size=len(e))
                diff = Y[e[:, 0]] - Y[j]
                d2 = (diff * diff).sum(1, keepdims=True)
                g = np.clip(2.0 * diff / ((0.001 + d2) * (1.0 + d2)), -4.0, 4.0)
                np.add.at(Y, e[:, 0], alpha * g)
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame({id_col: ids, "embedding": [list(map(float, y)) for y in Y]})
    )
