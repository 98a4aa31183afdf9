"""Cross-row aggregates (SURVEY §2.4) + exact-sum helpers.

Reference: vector_avg / vector_sum / vector_centroid aggregates
(neurondb--1.0.sql:2199-2208; transfn src/types/aggregates.c:41-148) and the
element-wise min/max exercised in sql/04_aggregates.sql:17-22.

Scale note: element-wise vector aggregation is implemented two ways —
``vector_agg_fold`` keeps vectors intact and folds with
``zip_with`` inside a two-phase aggregate (no row blowup; best when dim is
large and groups are few), while ``vector_agg_exploded`` goes
posexplode→groupBy(pos)→re-pack (fully parallel across dim×groups; best for
huge groups / skew). Both are shuffle-once plans.

Exact-sum helpers: cross-row double summation is order-dependent, so any
oracle-checked aggregate routes through DECIMAL(38,6) — exact and
order-independent — then casts back to double (see oracle.dsum for the
matching SQL and the rounding argument).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neurondb_spark.functions.vector import vec


def dsum(c: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM of a double column via exact decimal."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double")


def bsum(c: Column | str, bits: int = 40) -> Column:
    """Order-independent SUM via binary fixed-point: x·2^bits is an EXACT
    double operation (power-of-two scaling), round-to-integer is identical
    across engines on identical doubles, the long sum is exact, and the
    final /2^bits is again exact. Unlike high-scale decimal casts this has
    NO cross-engine rounding ambiguity (decimal grids finer than ~1e-15
    fall within double-ulp distance of the string-vs-binary cast paths and
    diverge). Use when the needed precision exceeds decimal scale ~12.
    Quantization: 2^-bits per addend; range: |Σ x·2^bits| < 2^63."""
    c = F.col(c) if isinstance(c, str) else c
    factor = float(2 ** bits)
    return F.sum(F.round(c * factor, 0).cast("long")).cast("double") / factor


def davg(c: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal(38,{scale})")).cast("double") / F.count(F.lit(1))


def vector_agg_exploded(
    df: DataFrame,
    vec_col: str,
    group_cols: list[str] | None = None,
    op: str = "avg",
    pos_col: str = "pos",
    out_col: str = "val",
    exact: bool = True,
) -> DataFrame:
    """Element-wise avg/sum/min/max over rows, returned UNPACKED as
    (group..., pos, val) with 1-based pos — the shape a SQL oracle can
    reproduce with unnest+generate_subscripts.

    vector_avg semantics: nulls skipped, empty group → no row
    (aggregates.c:41-121).
    """
    group_cols = group_cols or []
    ex = df.where(F.col(vec_col).isNotNull()).select(
        *group_cols, F.posexplode(vec(vec_col)).alias("_pos0", "_v")
    )
    ex = ex.select(
        *group_cols,
        (F.col("_pos0") + 1).cast("int").alias(pos_col),
        F.col("_v").alias("_v"),
    )
    if op == "avg":
        agg = davg("_v") if exact else F.avg("_v")
    elif op == "sum":
        agg = dsum("_v") if exact else F.sum("_v")
    elif op == "min":
        agg = F.min("_v")
    elif op == "max":
        agg = F.max("_v")
    else:
        raise ValueError(f"neurondb: unknown vector agg op {op!r}")
    return ex.groupBy(*group_cols, pos_col).agg(agg.alias(out_col))


def repack(
    df: DataFrame,
    group_cols: list[str],
    pos_col: str = "pos",
    val_col: str = "val",
    out_col: str = "vector",
) -> DataFrame:
    """Re-pack (group, pos, val) rows into an ordered array column."""
    return df.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(pos_col, val_col))),
            lambda s: s[val_col],
        ).alias(out_col)
    )


def vector_avg(df: DataFrame, vec_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """vector_avg / vector_centroid (aggregates.c:41-148): packed array out."""
    g = group_cols or []
    un = vector_agg_exploded(df, vec_col, g, op="avg", exact=False)
    if g:
        return repack(un, g, out_col="vector_avg")
    return repack(un.withColumn("_g", F.lit(1)), ["_g"], out_col="vector_avg").drop("_g")


def vector_sum(df: DataFrame, vec_col: str, group_cols: list[str] | None = None) -> DataFrame:
    g = group_cols or []
    un = vector_agg_exploded(df, vec_col, g, op="sum", exact=False)
    if g:
        return repack(un, g, out_col="vector_sum")
    return repack(un.withColumn("_g", F.lit(1)), ["_g"], out_col="vector_sum").drop("_g")
