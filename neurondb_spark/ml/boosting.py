"""Exact fixed-round gradient boosting over depth-1 stumps (§2.8).

Reference analog: the gradient-boosting family
(NeuronDB/src/ml/ml_xgboost.c:349-449 — n_estimators / max_depth /
learning_rate loop; NeuronDB/src/ml/ml_lightgbm.c) and the histogram
split search of NeuronDB/src/ml/ml_decision_tree.c:1091. Library GBT
training is seeded/threaded and not value-replayable, so — like
`kmeans_fixed_lloyd` and `als_fixed_alternations` — this is the exact
fixed-iteration twin that CAN sit under the hash gate: squared-error
boosting, T rounds, each round fitting one regression stump chosen
from a FIXED (feature, threshold) candidate grid by exact variance
reduction, leaf values = exact decimal residual means.

Determinism contract (the house recipe, oracle-parity):

- residual sums per candidate via DECIMAL(38,6) (`dsum`) — order
  independent, so identical under any partitioning and in DuckDB;
- leaf means = double(sum)/count, score = nl·ml² + nr·mr² with fixed
  left-associative double arithmetic — IEEE-identical in Python, Spark
  and DuckDB;
- winner = argmax score, ties broken (feature ASC, threshold ASC);
- prediction = base + Σ_t lr·leaf_t accumulated left-to-right.

Scale: each round is ONE map-side-combined aggregate computing
2·|grid|+2 conditional sums over the full table (the classic
histogram-based split search every distributed tree trainer uses —
the driver sees |grid| numbers, never rows), then the chosen stump is
folded into a pure literal CASE expression. T rounds = T scans; no
shuffle wider than the aggregate, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neurondb_spark import oracle as O
from neurondb_spark.functions.aggregates import davg, dsum


def gbt_fixed_stumps(
    df: DataFrame,
    grid: dict[str, list[float]],
    y_col: str,
    rounds: int = 3,
    lr: float = 0.5,
) -> tuple[dict, Column]:
    """Train T fixed-grid stumps on squared-error residuals.

    Returns ``(model, pred_col)`` where ``model`` records the base
    prediction and per-round ``(feature, threshold, left_leaf,
    right_leaf)`` (leaf values already scaled by ``lr``), and
    ``pred_col`` is the pure-expression prediction column (a literal
    CASE chain — usable in any later select, no Python).
    """
    cands = [(f, thr) for f in sorted(grid) for thr in grid[f]]
    y = F.col(y_col).cast("double")

    base = df.agg(davg(y).alias("b")).head()["b"]
    pred = F.lit(float(base))
    model = {"base": float(base), "lr": float(lr), "stumps": []}

    for _t in range(rounds):
        r = y - pred
        aggs = [F.count(F.lit(1)).alias("nt"), dsum(r).alias("st")]
        for i, (f, thr) in enumerate(cands):
            left = F.col(f).cast("double") <= F.lit(float(thr))
            aggs.append(F.count(F.when(left, 1)).alias(f"n{i}"))
            aggs.append(dsum(F.when(left, r)).alias(f"s{i}"))
        row = df.agg(*aggs).head()
        nt, st = row["nt"], row["st"]
        best = None  # (-score, feature, threshold, ml, mr)
        for i, (f, thr) in enumerate(cands):
            nl, sl = row[f"n{i}"], row[f"s{i}"]
            nr = nt - nl
            if nl == 0 or nr == 0:
                continue
            sr = st - sl
            ml, mr = sl / nl, sr / nr
            score = nl * ml * ml + nr * mr * mr
            key = (-score, f, thr)
            if best is None or key < best[:3]:
                best = (key[0], f, thr, ml, mr)
        if best is None:  # degenerate grid: nothing splits — stop early
            break
        _ns, f, thr, ml, mr = best
        lml, lmr = lr * ml, lr * mr
        i = cands.index((f, thr))
        nl = row[f"n{i}"]
        # background expectation of this stump over the training set —
        # the exact-SHAP anchor (see gbt_shap_cols)
        ex = (nl * lml + (nt - nl) * lmr) / nt
        model["stumps"].append(
            {"feature": f, "threshold": float(thr),
             "left": float(lml), "right": float(lmr),
             "n_left": int(nl), "n_total": int(nt),
             "expected": float(ex)}
        )
        pred = pred + F.when(
            F.col(f).cast("double") <= F.lit(float(thr)), F.lit(float(lml))
        ).otherwise(F.lit(float(lmr)))
    return model, pred


def rf_fixed_stumps(
    df: DataFrame,
    grid: dict[str, list[float]],
    y_col: str,
    key_col: Column,
    trees: int = 5,
    sample_mod: int = 2,
    sum_bits: int = 7,
) -> tuple[dict, Column]:
    """Exact bagged forest of regression stumps — the random-forest
    twin (NeuronDB/src/ml/ml_random_forest.c family) of
    :func:`gbt_fixed_stumps`: T trees, each fit on a DETERMINISTIC
    md5-derived bootstrap slice (row in tree t's sample iff
    md5_60bit(key ∥ '#rf' ∥ t) % sample_mod == 0 — the corpus-sampling
    recipe, cross-engine stable), split chosen from the fixed grid by
    exact variance reduction on the sample, leaves = exact fixed-point
    sample means (bsum at ``sum_bits``). Prediction = fixed
    left-associative mean of the T leaf values.

    Scale: the ENTIRE forest fits in ONE codegen'd grouped aggregate —
    grouping by the T boolean membership flags (≤ 2^T groups, bounded
    by construction) keeps the aggregate at 2·|grid|+2 buffers, under
    ``spark.sql.codegen.maxFields``; the per-tree T·(2·|grid|+2)
    statistics are assembled driver-side by EXACT integer addition of
    the ≤ 2^T group rows (the earlier flat form — T·(2·|grid|+2)
    conditional DECIMAL sums in one agg — tripped the 100-field codegen
    cliff and ran interpreted, 6× slower). Fixed-point long sums bound
    |Σ y·2^sum_bits| < 2^63: at sum_bits=7 that is ~7e11 rows of 1e5
    monetary values per tree — raise dsum-style decimals via a wider
    grid only if a deployment exceeds it. Raises if a tree's sample
    defeats every candidate (fixed-twin contract: the caller picks a
    grid that splits; a silent constant tree would mask a broken
    sample).
    """
    from neurondb_spark.operators.dedup import _md5_long

    cands = [(f, thr) for f in sorted(grid) for thr in grid[f]]
    factor = float(2 ** sum_bits)
    y = F.col(y_col).cast("double")
    qy = F.round(y * F.lit(factor), 0).cast("long")
    pre = df.select(
        qy.alias("_qy"),
        *[F.col(f).cast("double").alias(f"_f{i}")
          for i, f in enumerate(sorted(grid))],
        *[
            (_md5_long(F.concat(key_col, F.lit(f"#rf{t}"))) % sample_mod
             == 0).alias(f"_samp{t}")
            for t in range(trees)
        ],
    )
    feat_ix = {f: i for i, f in enumerate(sorted(grid))}
    aggs = [F.count(F.lit(1)).alias("g_n"), F.sum("_qy").alias("g_s")]
    for i, (f, thr) in enumerate(cands):
        c = F.col(f"_f{feat_ix[f]}") <= F.lit(float(thr))
        aggs.append(F.count(F.when(c, 1)).alias(f"g_n{i}"))
        aggs.append(F.sum(F.when(c, F.col("_qy"))).alias(f"g_s{i}"))
    groups = (
        pre.groupBy(*[f"_samp{t}" for t in range(trees)]).agg(*aggs).collect()
    )

    model = {"trees": [], "sample_mod": int(sample_mod),
             "sum_bits": int(sum_bits)}
    acc: Column | None = None
    for t in range(trees):
        sel = [r for r in groups if r[f"_samp{t}"]]
        nt = sum(r["g_n"] for r in sel)
        st = float(sum(r["g_s"] or 0 for r in sel)) / factor
        best = None
        for i, (f, thr) in enumerate(cands):
            nl = sum(r[f"g_n{i}"] for r in sel)
            nr = nt - nl
            if nl == 0 or nr == 0:
                continue
            sl = float(sum(r[f"g_s{i}"] or 0 for r in sel)) / factor
            sr = st - sl
            ml, mr = sl / nl, sr / nr
            score = nl * ml * ml + nr * mr * mr
            key = (-score, f, thr)
            if best is None or key < best[:3]:
                best = (key[0], f, thr, ml, mr)
        if best is None:
            raise ValueError(
                f"neurondb: rf tree {t} found no valid split — widen the "
                f"candidate grid or lower sample_mod"
            )
        _ns, f, thr, ml, mr = best
        model["trees"].append(
            {"feature": f, "threshold": float(thr),
             "left": float(ml), "right": float(mr)}
        )
        leaf = F.when(
            F.col(f).cast("double") <= F.lit(float(thr)), F.lit(float(ml))
        ).otherwise(F.lit(float(mr)))
        acc = leaf if acc is None else acc + leaf
    return model, acc / F.lit(float(trees))


def gbt_pred_from_model(model: dict) -> Column:
    """Rebuild the boosted-ensemble prediction column from a persisted
    model dict (catalog round-trip) — identical literal CASE chain to
    the one :func:`gbt_fixed_stumps` returned at fit time."""
    pred: Column = F.lit(float(model["base"]))
    for s in model["stumps"]:
        pred = pred + F.when(
            F.col(s["feature"]).cast("double") <= F.lit(s["threshold"]),
            F.lit(s["left"]),
        ).otherwise(F.lit(s["right"]))
    return pred


def rf_pred_from_model(model: dict) -> Column:
    """Rebuild the forest prediction column from a persisted model
    dict — the fixed left-associative leaf mean."""
    acc: Column | None = None
    for s in model["trees"]:
        leaf = F.when(
            F.col(s["feature"]).cast("double") <= F.lit(s["threshold"]),
            F.lit(s["left"]),
        ).otherwise(F.lit(s["right"]))
        acc = leaf if acc is None else acc + leaf
    if acc is None:
        raise ValueError("neurondb: rf model has no trees")
    return acc / F.lit(float(len(model["trees"])))


def sql_rf_fixed_stumps(
    base_cte: str,
    grid: dict[str, list[float]],
    trees: int = 5,
    sample_mod: int = 2,
    sum_bits: int = 7,
) -> str:
    """DuckDB twin replaying :func:`rf_fixed_stumps`'s training — the
    per-tree bootstrap, split search and argmax in SQL (fixed-point
    bsum sums at ``sum_bits``; the oracle sums each tree's sample
    directly — integer addition is associative, so it equals the Spark
    side's group-then-add exactly). ``base_cte`` must define relation
    ``d`` with the feature columns, DOUBLE ``y`` and a VARCHAR row key
    column named ``rk``. Ends in one-row winner relations
    ``wt0..wt{T-1}``; compose predictions with
    :func:`sql_rf_pred_expr`."""
    feats = sorted(grid)
    vals = ", ".join(
        f"('{f}', {O.dlit(float(thr))})" for f in feats for thr in grid[f]
    )
    fcase = (
        "CASE g.f "
        + " ".join(f"WHEN '{f}' THEN CAST(s.{f} AS DOUBLE)" for f in feats)
        + " END"
    )
    tvals = ", ".join(f"({t})" for t in range(trees))
    score = (
        "(CAST(nl AS DOUBLE) * (sl / CAST(nl AS DOUBLE))"
        " * (sl / CAST(nl AS DOUBLE))"
        " + CAST(nt - nl AS DOUBLE)"
        " * ((st - sl) / CAST(nt - nl AS DOUBLE))"
        " * ((st - sl) / CAST(nt - nl AS DOUBLE)))"
    )
    wts = ",\n".join(
        f"wt{t} AS (SELECT f, thr, ml, mr FROM win WHERE rn = 1 AND t = {t})"
        for t in range(trees)
    )
    return f"""WITH {base_cte},
grid(f, thr) AS (VALUES {vals}),
samp AS (
  SELECT d.*, t.t FROM d CROSS JOIN (VALUES {tvals}) t(t)
  WHERE CAST(('0x' || substr(md5(d.rk || '#rf' || CAST(t.t AS VARCHAR)),
              1, 15)) AS BIGINT) % {sample_mod} = 0),
cand AS (
  SELECT s.t, g.f, g.thr,
         SUM(CASE WHEN {fcase} <= g.thr THEN 1 ELSE 0 END) AS nl,
         {O.bsum(f"CASE WHEN {fcase} <= g.thr THEN s.y END", sum_bits)} AS sl,
         COUNT(*) AS nt, {O.bsum('s.y', sum_bits)} AS st
  FROM samp s CROSS JOIN grid g GROUP BY s.t, g.f, g.thr),
win AS (
  SELECT t, f, thr, sl / CAST(nl AS DOUBLE) AS ml,
         (st - sl) / CAST(nt - nl AS DOUBLE) AS mr,
         ROW_NUMBER() OVER (PARTITION BY t
                            ORDER BY {score} DESC, f ASC, thr ASC) AS rn
  FROM cand WHERE nl > 0 AND nt - nl > 0),
{wts}"""


def sql_rf_pred_expr(grid: dict[str, list[float]], trees: int) -> str:
    """Fixed-left-associative forest mean over the ``wt{t}`` winner
    CTEs of :func:`sql_rf_fixed_stumps` — reference the data rows as
    alias ``x`` and CROSS JOIN ``wt0 w0 .. wt{T-1} w{T-1}`` (each is
    one row, so no fan-out and no grouping; duplicate-key rows keep
    their multiplicity, which a pivot-by-key would collapse)."""
    feats = sorted(grid)
    leaves = []
    for t in range(trees):
        wcase = (
            f"CASE w{t}.f "
            + " ".join(f"WHEN '{f}' THEN CAST(x.{f} AS DOUBLE)"
                       for f in feats)
            + " END"
        )
        leaves.append(
            f"(CASE WHEN {wcase} <= w{t}.thr THEN w{t}.ml "
            f"ELSE w{t}.mr END)"
        )
    mean = leaves[0]
    for t in range(1, trees):
        mean = f"({mean} + {leaves[t]})"
    return f"{mean} / {O.dlit(float(trees))}"


def gbt_shap_cols(
    model: dict, features: list[str]
) -> dict[str, Column]:
    """Exact SHAP attributions for the stump ensemble (the reference's
    XAI surface, NeuronDB/src/ml/ml_explainable_ai.c, made exact): a
    depth-1 tree touches one feature, so its Shapley value is
    closed-form — φ_f(x) = Σ_{trees on f} (leaf_t(x) − E[leaf_t]),
    with the background expectation taken over the training set
    (recorded per stump at fit time). Additivity holds exactly:
    base + Σ_t E[leaf_t] + Σ_f φ_f(x) == prediction(x), double for
    double — checkable under the hash gate.

    Returns one pure-expression Column per feature. Each φ is a fixed
    left-associative sum over ALL rounds (0.0 terms for other
    features) so the oracle can replay the identical accumulation.
    """
    out: dict[str, Column] = {}
    for f in features:
        phi: Column | None = None
        for s in model["stumps"]:
            if s["feature"] == f:
                term = F.when(
                    F.col(f).cast("double") <= F.lit(s["threshold"]),
                    F.lit(s["left"]),
                ).otherwise(F.lit(s["right"])) - F.lit(s["expected"])
            else:
                term = F.lit(0.0)
            phi = term if phi is None else phi + term
        out[f] = phi if phi is not None else F.lit(0.0)
    return out


def sql_gbt_shap(
    grid: dict[str, list[float]], rounds: int, lr: float
) -> dict[str, str]:
    """Oracle twin of :func:`gbt_shap_cols`: per-feature φ expressions
    over a row alias ``x`` cross-joined with the ``w{t}`` winner CTEs
    of :func:`sql_gbt_fixed_stumps` (aliased ``w1..w{rounds}``). The
    term structure — one addend per round, 0.0 when the round's winner
    is another feature — mirrors the Spark accumulation exactly."""
    feats = sorted(grid)
    lrl = O.dlit(float(lr))
    out: dict[str, str] = {}
    for f in feats:
        terms = []
        for t in range(1, rounds + 1):
            leaf = (
                f"CASE WHEN CAST(x.{f} AS DOUBLE) <= w{t}.thr "
                f"THEN {lrl} * w{t}.ml ELSE {lrl} * w{t}.mr END"
            )
            terms.append(
                f"(CASE WHEN w{t}.f = '{f}' THEN {leaf} - w{t}.ex "
                f"ELSE CAST(0.0 AS DOUBLE) END)"
            )
        out[f] = "(" + " + ".join(terms) + ")"
    return out


def sql_gbt_fixed_stumps(
    base_cte: str,
    grid: dict[str, list[float]],
    rounds: int = 3,
    lr: float = 0.5,
) -> str:
    """DuckDB CTE chain replaying :func:`gbt_fixed_stumps` end to end —
    the split SEARCH runs in SQL too (grid cross join → exact decimal
    sums → argmax with the same tie-break), so a drifted candidate
    score, winner, or leaf value breaks the hash, not just a drifted
    final prediction.

    ``base_cte`` must define a relation ``d`` with the feature columns,
    a DOUBLE ``y``, and any pass-through key columns. The chain ends in
    a relation ``r{rounds}`` with the same columns plus ``pred``.
    """
    feats = sorted(grid)
    vals = ", ".join(
        f"('{f}', {O.dlit(float(thr))})" for f in feats for thr in grid[f]
    )
    fcase = (
        "CASE g.f "
        + " ".join(f"WHEN '{f}' THEN CAST(x.{f} AS DOUBLE)" for f in feats)
        + " END"
    )
    wcase = (
        "CASE w.f "
        + " ".join(f"WHEN '{f}' THEN CAST(x.{f} AS DOUBLE)" for f in feats)
        + " END"
    )
    lrl = O.dlit(float(lr))
    parts = [
        base_cte,
        f"grid(f, thr) AS (VALUES {vals})",
        f"r0 AS (SELECT d.*, d.y - b.base AS r, b.base AS pred FROM d"
        f" CROSS JOIN (SELECT {O.davg('y')} AS base FROM d) b)",
    ]
    for t in range(1, rounds + 1):
        p = f"r{t - 1}"
        parts.append(
            f"""c{t} AS (
  SELECT g.f, g.thr,
         SUM(CASE WHEN {fcase} <= g.thr THEN 1 ELSE 0 END) AS nl,
         {O.dsum(f"CASE WHEN {fcase} <= g.thr THEN x.r END")} AS sl,
         COUNT(*) AS nt, {O.dsum('x.r')} AS st
  FROM {p} x CROSS JOIN grid g GROUP BY g.f, g.thr)"""
        )
        parts.append(
            f"""w{t} AS (
  SELECT f, thr, sl / CAST(nl AS DOUBLE) AS ml,
         (st - sl) / CAST(nt - nl AS DOUBLE) AS mr,
         (CAST(nl AS DOUBLE) * ({lrl} * (sl / CAST(nl AS DOUBLE)))
          + CAST(nt - nl AS DOUBLE)
            * ({lrl} * ((st - sl) / CAST(nt - nl AS DOUBLE))))
           / CAST(nt AS DOUBLE) AS ex
  FROM c{t} WHERE nl > 0 AND nt - nl > 0
  ORDER BY (CAST(nl AS DOUBLE) * (sl / CAST(nl AS DOUBLE))
              * (sl / CAST(nl AS DOUBLE))
            + CAST(nt - nl AS DOUBLE)
              * ((st - sl) / CAST(nt - nl AS DOUBLE))
              * ((st - sl) / CAST(nt - nl AS DOUBLE))) DESC,
           f ASC, thr ASC
  LIMIT 1)"""
        )
        parts.append(
            f"""r{t} AS (
  SELECT x.* EXCLUDE (r, pred),
         x.y - (x.pred + CASE WHEN {wcase} <= w.thr
                              THEN {lrl} * w.ml ELSE {lrl} * w.mr END) AS r,
         x.pred + CASE WHEN {wcase} <= w.thr
                       THEN {lrl} * w.ml ELSE {lrl} * w.mr END AS pred
  FROM {p} x CROSS JOIN w{t} w)"""
        )
    return "WITH " + ",\n".join(parts)
