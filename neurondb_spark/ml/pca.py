"""PCA via one sufficient-statistics pass + power iteration.

Reference analog: ``pca_fit`` / ``pca_transform`` in the ML catalog
(NeuronDB/src/ml/neurondb_ml.c dispatch; dimensionality-reduction family
alongside t-SNE/UMAP). The reference trains in-core on a capped sample;
here the covariance is built from ONE distributed aggregation pass
(dim + dim·(dim+1)/2 + 1 decimal-exact sums, map-side combined), and only
the O(dim²) eigensolve runs on the driver — the canonical 100 TB shape
for linear-algebra-over-sufficient-statistics (same design as
``ml/exact_models.py``).

Determinism contract (what makes the gate query hash-checkable): the
power iteration starts from the fixed axis e_1 and runs a FIXED number of
iterations of ``v ← S·v / ‖S·v‖`` with left-associated arithmetic, so an
oracle that replays the identical double-precision operation sequence
(DuckDB CTE chain) reproduces the component bit-for-bit. IEEE-754 makes
``+ * / sqrt`` correctly rounded in both engines; the only cross-engine
hazard is summation ORDER, which the dsum decimal grid removes.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neurondb_spark.functions.aggregates import dsum

# Above this, dim·(dim+1)/2 aggregate expressions overwhelm the analyzer/
# codegen (mirrors UNROLL_DIM_MAX in functions/distance.py); use the MLlib
# PCA path (ml/dimreduce.py) instead.
SUFFICIENT_STATS_DIM_MAX = 64


def _elem(vec_col: str, i: int) -> Column:
    """1-based element as double (float32 storage upcasts exactly)."""
    return F.element_at(F.col(vec_col), i).cast("double")


def pca_sufficient_stats(df: DataFrame, vec_col: str, dim: int) -> dict:
    """One aggregation pass → {n, s[i], p[(i,j)] for i<=j} (plain floats).

    ``s`` are per-coordinate sums and ``p`` upper-triangle product sums,
    all on the order-independent dsum path so a SQL oracle lands on the
    identical doubles.

    Guarded to dim ≤ SUFFICIENT_STATS_DIM_MAX: the pass builds
    dim·(dim+1)/2 aggregate expressions, which is the right plan at
    control-plane dims (dim=8 → 45 sums) but at dim=384 would be ~74k
    aggregates and a Catalyst analyzer/codegen blow-up. Large-dim PCA
    belongs on the MLlib RowMatrix path (``ml/dimreduce.py``) — same
    single-scan shape, JVM-side Gramian.
    """
    if dim > SUFFICIENT_STATS_DIM_MAX:
        raise ValueError(
            f"neurondb: pca_sufficient_stats supports dim <= "
            f"{SUFFICIENT_STATS_DIM_MAX} (got {dim}): the exact pass "
            f"builds dim*(dim+1)/2 aggregate expressions and large dims "
            f"blow up codegen — use the MLlib PCA in "
            f"neurondb_spark/ml/dimreduce.py for high-dimensional data"
        )
    aggs = [F.count(F.lit(1)).alias("n")]
    for i in range(1, dim + 1):
        aggs.append(dsum(_elem(vec_col, i)).alias(f"s{i}"))
    for i in range(1, dim + 1):
        for j in range(i, dim + 1):
            aggs.append(dsum(_elem(vec_col, i) * _elem(vec_col, j)).alias(f"p{i}_{j}"))
    row = df.agg(*aggs).head().asDict()
    n = float(row["n"])
    s = [float(row[f"s{i}"]) for i in range(1, dim + 1)]
    p = {
        (i, j): float(row[f"p{i}_{j}"])
        for i in range(1, dim + 1)
        for j in range(i, dim + 1)
    }
    return {"n": n, "s": s, "p": p}


def covariance_from_stats(stats: dict, dim: int) -> list[list[float]]:
    """C[i][j] = p_ij/n − (s_i/n)·(s_j/n), the exact expression the oracle
    replays (population covariance; the reference likewise normalizes by
    n, not n−1, in its moment helpers)."""
    n, s, p = stats["n"], stats["s"], stats["p"]
    cov = [[0.0] * dim for _ in range(dim)]
    for i in range(1, dim + 1):
        for j in range(1, dim + 1):
            pij = p[(i, j) if i <= j else (j, i)]
            cov[i - 1][j - 1] = pij / n - (s[i - 1] / n) * (s[j - 1] / n)
    return cov


def power_iteration(cov: list[list[float]], n_iter: int = 12) -> list[float]:
    """Top eigenvector from v0 = e_1, fixed iteration count, left-assoc
    arithmetic (bit-reproducible by an unrolled SQL CTE chain)."""
    dim = len(cov)
    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(n_iter):
        w = []
        for i in range(dim):
            acc = 0.0
            for j in range(dim):
                acc = acc + cov[i][j] * v[j]
            w.append(acc)
        nrm = 0.0
        for x in w:
            nrm = nrm + x * x
        nrm = math.sqrt(nrm)  # correctly-rounded IEEE sqrt — matches the
        # oracle's sqrt() bit-for-bit (x ** 0.5 would route through pow,
        # which is not guaranteed correctly rounded on every libm)
        if nrm == 0.0:
            raise ValueError("neurondb: power iteration collapsed to zero vector")
        v = [x / nrm for x in w]
    return v


def project_expr(vec_col: str, component: list[float]) -> Column:
    """Row score = Σ e_i·v_i as a left-associated codegen'd chain — the
    projection is a narrow whole-stage-codegen expression over the scan
    (no shuffle, no Python)."""
    acc = _elem(vec_col, 1) * F.lit(component[0])
    for i in range(2, len(component) + 1):
        acc = acc + _elem(vec_col, i) * F.lit(component[i - 1])
    return acc


def pca_top_component(
    df: DataFrame, vec_col: str, dim: int, n_iter: int = 12
) -> tuple[list[float], Column]:
    """Convenience wrapper: (component, projection column)."""
    stats = pca_sufficient_stats(df, vec_col, dim)
    cov = covariance_from_stats(stats, dim)
    v = power_iteration(cov, n_iter)
    return v, project_expr(vec_col, v)


def pca_components(
    df: DataFrame, vec_col: str, dim: int, n_components: int,
    n_iter: int = 100,
) -> dict:
    """Full PCA fit from ONE data pass: top-``n_components`` eigenvectors
    by power iteration + Hotelling deflation (S ← S − λ·v·vᵀ after each
    component), eigenvalues via Rayleigh quotients, and explained-variance
    ratios against trace(S). The data is never rescanned — everything
    after the sufficient-statistics aggregation is O(dim²·n_iter) driver
    arithmetic, so fitting 2 components costs the same scan as fitting 1.

    Returns {components: [[...], ...], eigenvalues: [...],
    explained_variance_ratio: [...], projections: [Column, ...]}.
    """
    if not 1 <= n_components <= dim:
        raise ValueError("neurondb: n_components must be in [1, dim]")
    stats = pca_sufficient_stats(df, vec_col, dim)
    cov = covariance_from_stats(stats, dim)
    trace = sum(cov[i][i] for i in range(dim))
    comps: list[list[float]] = []
    eigs: list[float] = []
    work = [row[:] for row in cov]
    for _ in range(n_components):
        v = power_iteration(work, n_iter)
        # Rayleigh quotient λ = vᵀSv on the ORIGINAL covariance
        sv = [sum(cov[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        lam = sum(v[i] * sv[i] for i in range(dim))
        comps.append(v)
        eigs.append(lam)
        lam_w = sum(
            v[i] * sum(work[i][j] * v[j] for j in range(dim)) for i in range(dim)
        )
        for i in range(dim):  # deflate the working matrix
            for j in range(dim):
                work[i][j] -= lam_w * v[i] * v[j]
    return {
        "components": comps,
        "eigenvalues": eigs,
        "explained_variance_ratio": [e / trace if trace else 0.0 for e in eigs],
        "projections": [project_expr(vec_col, v) for v in comps],
    }
