"""Outlier models beyond z-score (SURVEY §2.8 outliers row).

Reference: detect_anomalies_isolation_forest / detect_anomalies_lof
(NeuronDB/src/ml/ml_anomaly_detection.c:60-365; SQL surface
sql/26_ml_new_algorithms.sql:15-41). The reference builds every tree on
ALL rows in backend memory — its single-node shortcut. Here each tree is
built on a deterministic subsample (the iForest paper's own ψ=256
recommendation), which is also what makes the operator 100 TB-safe: the
driver only ever holds n_trees × sample_size rows; scoring streams
through executors with the (tiny) forest broadcast.

Same scoring math as the reference: path length ends at a leaf with the
average_path_length(size) correction, score = 2^(−avg_path/c(ψ)), and the
anomaly cutoff is sorted_scores[int((1−contamination)·n)]
(ml_anomaly_detection.c:156-182, 324-352).
"""

from __future__ import annotations

import math
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _values_at_ranks(df: DataFrame, col: str, ranks, n: int | None = None,
                     bracket_cap: int = 100_000) -> dict:
    """Exact order statistics of one column, distributed: {rank: value}
    for 0-indexed ascending ``ranks``.

    Fast path (all JVM, no Python workers): ``approxQuantile`` with rank
    error ≤ ~0.2%·n brackets each wanted rank; the bracket's rows are a
    bounded filtered collect and the exact value is indexed inside it by
    ``rank − count(x < lo)``. Three narrow JVM jobs total — the
    scale-safe replacement for driver ``sorted(collect())[k]`` and
    ``orderBy().limit(k)``. If heavy duplication blows the bracket past
    ``bracket_cap`` rows, falls back to the RDD sortBy + zipWithIndex
    exact path (one range-partition shuffle, collects len(ranks) values).
    Ties are fine either way: the value at a rank is tie-order-invariant.
    """
    want = sorted({int(r) for r in ranks})
    sdf = df.select(F.col(col).alias("_v")).where(F.col("_v").isNotNull())
    if n is None:
        n = sdf.count()
    if n == 0:
        return {}
    if len(want) > 4:
        # many ranks: the one-pass range-partitioned sort amortizes better
        # than per-rank bracket predicates (measured 1.2s vs 3.9s for 64
        # ranks at sf0.1); it is also exact with no cap to trip
        rdd = sdf.rdd.map(lambda r: r[0]).sortBy(lambda x: x)
        wset = set(want)
        return {i: v for v, i in
                rdd.zipWithIndex().filter(lambda t: t[1] in wset).collect()}
    eps = 1e-3
    margin = max(int(eps * n) + 1, 1)
    probs = []
    for r in want:
        probs.append(max(0.0, (r - margin) / n))
        probs.append(min(1.0, (r + margin) / n))
    est = sdf.stat.approxQuantile("_v", probs, eps)
    brackets = [(est[2 * i], est[2 * i + 1]) for i in range(len(want))]
    # job 2: every bracket's strict-below count in ONE aggregation
    below = sdf.agg(*[
        F.sum(F.when(F.col("_v") < F.lit(vlo), 1).otherwise(0)).alias(f"b{i}")
        for i, (vlo, _) in enumerate(brackets)
    ]).head()
    # job 3: one collect of the bracket union (bounded; cap → fallback)
    pred = None
    for vlo, vhi in brackets:
        c = (F.col("_v") >= F.lit(vlo)) & (F.col("_v") <= F.lit(vhi))
        pred = c if pred is None else pred | c
    cand = sorted(
        r[0] for r in sdf.where(pred).limit(bracket_cap + 1).collect()
    )
    out: dict = {}
    if len(cand) <= bracket_cap:
        import bisect

        for i, r in enumerate(want):
            vlo, vhi = brackets[i]
            lo_pos = bisect.bisect_left(cand, vlo)
            hi_pos = bisect.bisect_right(cand, vhi)
            idx = r - (below[f"b{i}"] or 0)
            if 0 <= idx < hi_pos - lo_pos:
                out[r] = cand[lo_pos + idx]
            else:
                out = {}
                break
    if len(out) == len(want):
        return out
    rdd = sdf.rdd.map(lambda r: r[0]).sortBy(lambda x: x)
    wset = set(want)
    return {i: v for v, i in rdd.zipWithIndex().filter(lambda t: t[1] in wset).collect()}


def _avg_path_length(n: int) -> float:
    """c(n) (ml_anomaly_detection.c:171-179)."""
    if n <= 1:
        return 0.0
    if n == 2:
        return 1.0
    return 2.0 * (math.log(n - 1) + 0.5772156649) - 2.0 * ((n - 1) / n)


def _build_tree(rows, dim, rng, max_depth):
    """Flat isolation tree: list of nodes
    (split_dim, split_value, left, right, leaf_size); leaf ⇔ split_dim<0.
    Same recursion as build_isolation_tree (ml_anomaly_detection.c:70-148):
    uniform random dim, uniform split in [min, max], constant dim → leaf."""
    nodes = []

    def rec(idx_rows, depth):
        me = len(nodes)
        if len(idx_rows) <= 1 or depth >= max_depth:
            nodes.append((-1, 0.0, -1, -1, len(idx_rows)))
            return me
        d = rng.randrange(dim)
        vals = [r[d] for r in idx_rows]
        lo, hi = min(vals), max(vals)
        if hi - lo < 1e-10:
            nodes.append((-1, 0.0, -1, -1, len(idx_rows)))
            return me
        split = lo + rng.random() * (hi - lo)
        nodes.append(None)  # placeholder; children appended after
        left = rec([r for r in idx_rows if r[d] < split], depth + 1)
        right = rec([r for r in idx_rows if r[d] >= split], depth + 1)
        nodes[me] = (d, split, left, right, len(idx_rows))
        return me

    rec(rows, 0)
    return nodes


def lof(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 20,
    threshold: float = 1.5,
    dim: int | None = None,
    r_blocks: int = 8,
) -> DataFrame:
    """Local Outlier Factor (detect_anomalies_lof,
    ml_anomaly_detection.c:401-660): k_dist = distance to the k-th
    neighbor, reach(p,o) = max(d(p,o), k_dist(o)), lrd = k/Σreach,
    LOF(p) = Σ_o lrd(o) / (k·lrd(p)); anomaly ⇔ LOF > threshold.

    Distributed shape: neighbor IDS come from the cogrouped block-GEMM
    kNN join (no cross join); the distances that enter the sums are then
    RECOMPUTED on just the n·k selected pairs with the elementwise fold
    kernel, so every double matches a SQL oracle bit-for-bit (GEMM
    distances differ in the last ulp — fine for ranking with real
    neighbor gaps, not for hashed sums). Σs go through bsum.
    """
    from neurondb_spark.functions.aggregates import bsum
    from neurondb_spark.functions.distance import l2_distance
    from neurondb_spark.operators.joins import knn_join_gemm

    base = df.select(id_col, vec_col)
    right = base.select(
        F.col(id_col).alias("_nbr"), F.col(vec_col).alias("_nvec")
    )
    nn = (
        knn_join_gemm(base, right, vec_col, "_nvec", id_col, "_nbr",
                      k=k + 1, r_blocks=r_blocks)
        .where(F.col(id_col) != F.col("_nbr"))
        .select(id_col, "_nbr")
    )
    d = l2_distance(vec_col, "_nvec", dim=dim, checked=False)
    edges = (
        nn.join(base, id_col)
        .join(right, "_nbr")
        .select(id_col, "_nbr", d.alias("d"))
        .localCheckpoint(eager=False)  # feeds three aggregations below;
        # lazy: computed once inside the caller's action, no separate job
    )
    kdist = edges.groupBy(id_col).agg(F.max("d").alias("_kd"))
    reach = edges.join(
        kdist.select(F.col(id_col).alias("_nbr"), "_kd"), "_nbr"
    ).select(id_col, "_nbr", F.greatest(F.col("d"), F.col("_kd")).alias("_reach"))
    lrd = reach.groupBy(id_col).agg(
        (F.lit(float(k)) / bsum(F.col("_reach"))).alias("_lrd")
    )
    nbr_lrd = edges.join(
        lrd.select(F.col(id_col).alias("_nbr"), F.col("_lrd").alias("_lrd_o")),
        "_nbr",
    ).groupBy(id_col).agg(bsum(F.col("_lrd_o")).alias("_slrd"))
    out = nbr_lrd.join(lrd, id_col).select(
        id_col,
        F.when(
            F.col("_lrd") > 0.0,
            F.col("_slrd") / (F.lit(float(k)) * F.col("_lrd")),
        ).otherwise(F.lit(0.0)).alias("lof_score"),
    )
    return out.withColumn("is_anomaly", F.col("lof_score") > F.lit(float(threshold)))


def ocsvm(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    nu: float = 0.1,
    gamma: float = 1.0,
    max_sv: int = 64,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One-class SVM anomaly detection (detect_anomalies_ocsvm,
    ml_anomaly_detection.c:737-900). The reference is explicitly a
    simplified OCSVM: the 'support vectors' are nu·n evenly-strided rows
    of the table, the decision score is the MEAN RBF kernel
    exp(−gamma·‖x−sv‖²) to them, and anomalies are the rows whose score
    falls below the nu-quantile (sorted_scores[int(nu·n)]).

    Spark shape: the strided SV rows (bounded by ``max_sv`` — the
    reference's nu·n SVs would be 10% of the corpus at scale) sit at
    exact ranks of the ``id_col`` order; both those ids and the
    nu-quantile cutoff come from ``_values_at_ranks`` (distributed
    narrow-column sort + zipWithIndex), so the driver only ever holds
    ≤max_sv ids and one threshold double — no full-id collect, no
    ``limit(O(n))`` TakeOrdered. The score itself is a pure fold over
    the broadcast-literal SV matrix (codegen'd, no shuffle, no UDF).
    Deterministic end to end, SQL-oracle hash-matchable.
    """
    if not 0.0 < nu <= 1.0:
        raise ValueError("neurondb: ocsvm nu must be in (0, 1]")
    if gamma <= 0.0:
        raise ValueError("neurondb: ocsvm gamma must be > 0")
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != vec_col
    ]
    n = df.count()
    if n < 2:
        raise ValueError("neurondb: ocsvm needs >= 2 vectors")
    n_sv = max(1, min(int(nu * n), max_sv))
    # exact strided ranks (rank-0 indexing of the oracle's 1-indexed
    # (i*n)//n_sv + 1); duplicates collapse like the oracle's DISTINCT
    sv_ranks = {(i * n) // n_sv for i in range(n_sv)}
    sv_ids = sorted(_values_at_ranks(df, id_col, sv_ranks, n=n).values())
    sv_rows = (
        df.select(id_col, vec_col)
        .where(F.col(id_col).isin(sv_ids))
        .orderBy(id_col)
        .collect()
    )
    # Optimization round 15 (guide §4.2): the RBF score used to be a
    # nested HOF fold over a broadcast-literal SV matrix — n_sv·dim
    # interpreted ops per row (HOFs never enter codegen), which needed a
    # full repartition shuffle just to spread the interpreted work. It is
    # now ONE Arrow-batched numpy kernel with the SV matrix built once
    # per task (guide §4.5): no shuffle, and the accumulation order is
    # kept EXACTLY left-assoc (explicit dim loop, then SV loop) so the
    # emitted doubles are bit-identical to the fold definition the
    # DuckDB oracle replays (exp itself is libm vs JVM Math.exp — the
    # final-ulp difference the gate's round-to-9 already tolerates).
    sv_list = [[float(x) for x in r[vec_col]] for r in sv_rows]
    gam = float(gamma)
    n_sv_f = float(len(sv_rows))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _rbf_mean(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        S = np.array(sv_list, dtype=np.float64)  # once per task
        dim = S.shape[1]
        for batch in it:
            vals = batch.tolist()
            # null / ragged rows propagate null like the old Catalyst
            # HOF did (r16, ADVICE); the all-good fast path stays numpy
            good = [v for v in vals
                    if v is not None and len(v) == dim
                    and not any(x is None for x in v)]
            if len(good) != len(vals):
                ok = np.array(
                    [v is not None and len(v) == dim
                     and not any(x is None for x in v) for v in vals],
                    dtype=bool,
                )
            else:
                ok = None
            if not good:
                yield pd.Series([None] * len(vals), dtype=object)
                continue
            X = np.array(good, dtype=np.float64)
            acc = np.zeros(len(X), dtype=np.float64)
            for s in S:  # left-assoc over SVs, matching the fold
                d = np.zeros(len(X), dtype=np.float64)
                for j in range(dim):  # left-assoc over dims
                    dj = X[:, j] - s[j]
                    d = d + dj * dj
                acc = acc + np.exp(-gam * d)
            res = acc / n_sv_f
            if ok is None:
                yield pd.Series(res)
            else:
                out: list = [None] * len(vals)
                for pos, r in zip(np.flatnonzero(ok), res):
                    out[pos] = float(r)
                yield pd.Series(out, dtype=object)

    scored = df.select(
        *keep, _rbf_mean(F.col(vec_col).cast("array<double>")).alias("ocsvm_score")
    ).localCheckpoint(eager=False)  # reused by the cutoff ranks + output;
    # materialized by the first rank job
    # exact-rank nu-quantile cutoff, distributed (no limit(O(n)) path)
    idx = min(int(nu * n), n - 1)
    thr = _values_at_ranks(scored, "ocsvm_score", {idx}, n=n)[idx]
    return scored.withColumn("is_anomaly", F.col("ocsvm_score") < F.lit(thr))


def isolation_forest(
    df: DataFrame,
    vec_col: str,
    n_trees: int = 100,
    sample_size: int = 256,
    contamination: float = 0.1,
    seed: int = 42,
    keep_cols: list[str] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Isolation-forest scores + anomaly flags for every row.

    Returns ``keep_cols + [anomaly_score, is_anomaly]``. Deterministic
    for a fixed seed when ``id_col`` is given (the training pool is the
    first rows in ``id_col`` order, so sampling, tree builds, and the
    exact-rank cutoff are all pinned); without an id the pool follows
    partition/file layout and scores can shift across repartitions.
    """
    keep = keep_cols if keep_cols is not None else [
        c for c in df.columns if c != vec_col
    ]
    pool = df.select(vec_col) if id_col is None else (
        df.select(id_col, vec_col).orderBy(id_col)
    )
    sample = [
        [float(x) for x in r[vec_col]]
        for r in pool.limit(n_trees * sample_size * 4).collect()
    ]
    if len(sample) < 2:
        raise ValueError("neurondb: isolation_forest needs >= 2 vectors")
    dim = len(sample[0])
    rng = random.Random(seed)
    trees = []
    psi = min(sample_size, len(sample))
    max_depth = math.ceil(math.log2(psi)) if psi > 1 else 1
    for _ in range(n_trees):
        rows = rng.sample(sample, psi)
        trees.append(_build_tree(rows, dim, rng, max_depth))
    c_psi = _avg_path_length(psi)
    bc = df.sparkSession.sparkContext.broadcast((trees, c_psi))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.select(*keep).schema.fields
    ) + ", anomaly_score double"

    def _score(batches):
        import pandas as pd  # noqa: F401

        trees_, c = bc.value

        def path(tree, v):
            i, depth = 0, 0
            while True:
                d, split, left, right, size = tree[i]
                if d < 0:
                    return depth + _avg_path_length(size)
                i = left if v[d] < split else right
                depth += 1

        for pdf in batches:
            scores = []
            for v in pdf[vec_col]:
                avg = sum(path(t, v) for t in trees_) / len(trees_)
                scores.append(2.0 ** (-avg / c) if c > 0 else 0.0)
            yield pdf[[c_ for c_ in pdf.columns if c_ != vec_col]].assign(
                anomaly_score=scores
            )

    scored = df.select(*keep, vec_col).mapInPandas(_score, out_schema)
    scored = scored.localCheckpoint(eager=False)  # score once; cutoff +
    # flag reuse it (the count() below materializes it — one job, not two)
    n = scored.count()
    # reference cutoff: sorted_scores[int((1 - contamination) * n)],
    # taken at exact rank distributed — the former orderBy().limit(idx+1)
    # shipped (1-contamination)·n rows through a TakeOrdered
    idx = min(int((1.0 - contamination) * n), n - 1)
    thr = _values_at_ranks(scored, "anomaly_score", {idx})[idx]
    return scored.withColumn("is_anomaly", F.col("anomaly_score") > F.lit(thr))
