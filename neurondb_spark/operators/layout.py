"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

The reference organizes vector data into clustered physical layouts per
index (IVF partition files, HNSW shard files); for plain relational data
at 100 TB the equivalent lever is CLUSTERING THE FILE LAYOUT so parquet
min/max footer stats prune multi-dimensional predicates — Delta/Iceberg's
``OPTIMIZE ZORDER BY``. Spark has no built-in; this is the operator form:
a pure-expression Morton key + repartitionByRange/sortWithinPartitions,
so every written file covers a small hyper-rectangle of the key space and
a ``x BETWEEN … AND y BETWEEN …`` scan skips all but the touched cells.

Everything is integer bit arithmetic — identical in Spark and ANSI SQL,
so the key itself sits under the value-hash gate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton key: interleave the low ``bits`` bits of each column.

    Inputs must be non-negative integers already scaled into
    [0, 2^bits) — callers map raw values with ``% / & / width_bucket``
    style arithmetic first (rank-based mapping would need a sort; modulo
    /bucket mapping is a pure row function and is what layout clustering
    needs). Values ≥ 2^bits are masked to their low bits rather than
    raising: layout keys order data, they don't validate it.

    The result fits a BIGINT: bits × n_cols ≤ 63 enforced. Bit j of
    column i lands at position j·n + i — the standard Morton layout, so
    nearby (x, y) pairs get nearby keys.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("neurondb: zorder_key needs at least one column")
    if bits < 1 or bits * n > 63:
        raise ValueError(
            f"neurondb: zorder bits={bits} × {n} cols exceeds a signed "
            f"64-bit key (max {63 // n} bits for {n} columns)"
        )
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(col, j).bitwiseAND(F.lit(1)),
                            j * n + i)
            )
    return z


def sql_zorder_key(cols: Sequence[str], bits: int = 16) -> str:
    """The identical Morton key as ANSI SQL (oracle twin of
    :func:`zorder_key` — same positions, same masking)."""
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        for j in range(bits):
            terms.append(f"((({c} >> {j}) & 1) << {j * n + i})")
    return " | ".join(terms)


def zorder_overflow_counts(
    df: DataFrame, cols: Sequence[Column | str], bits: int = 16,
) -> dict:
    """Per-column count of values OUTSIDE [0, 2^bits) — the values
    :func:`zorder_key` masks to their low bits, silently aliasing them
    into distant cells and degrading clustering quality. One aggregate
    (the validate_vectors pattern); keys are positional
    (``col_0``…) so Column expressions don't need printable names."""
    hi = 1 << bits
    aggs = []
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        aggs.append(
            F.sum(
                F.when((col < 0) | (col >= hi), 1).otherwise(0)
            ).alias(f"col_{i}")
        )
    return {k: int(v or 0) for k, v in df.agg(*aggs).head().asDict().items()}


def zorder_layout(
    df: DataFrame,
    cols: Sequence[Column | str],
    bits: int = 16,
    num_partitions: int | None = None,
    validate: bool = False,
) -> DataFrame:
    """``OPTIMIZE ZORDER BY`` analog: range-partition on the Morton key
    and sort within partitions, so a subsequent parquet write produces
    files whose per-column min/max stats are tight on EVERY clustered
    column — multi-dimensional data skipping from one layout pass.

    ``validate=True`` runs one :func:`zorder_overflow_counts` aggregate
    first and raises when any clustered column has values outside
    [0, 2^bits) — the silent-masking degradation made observable;
    default off because layout keys order data, they don't validate it.

    Cost: exactly one range shuffle (sampled boundaries — skew-robust)
    plus a per-partition sort; the key column is dropped before write.
    At 100 TB this is the standard nightly compaction job shape."""
    if validate:
        over = zorder_overflow_counts(df, cols, bits=bits)
        bad = {k: v for k, v in over.items() if v > 0}
        if bad:
            raise ValueError(
                f"neurondb: zorder columns have values outside "
                f"[0, 2^{bits}) — masked aliasing would degrade "
                f"clustering: {bad} (scale inputs or raise bits)"
            )
    z = zorder_key(cols, bits=bits)
    out = df.withColumn("_zorder", z)
    out = (
        out.repartitionByRange(num_partitions, "_zorder")
        if num_partitions
        else out.repartitionByRange("_zorder")
    )
    return out.sortWithinPartitions("_zorder").drop("_zorder")
