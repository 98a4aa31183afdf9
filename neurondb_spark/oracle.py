"""DuckDB/ANSI SQL fragment generators mirroring the engine's Column
expressions bit-for-bit.

The driver's correctness gate runs each declared Spark query AND an oracle
SQL side-by-side and compares an order-insensitive value hash, so float
results must be *identical* — not just close. Guarantees used:

- float→double casts are exact; both engines read the same parquet floats.
- IEEE-754 double +, -, *, /, sqrt are deterministic and identical across
  JVMs and DuckDB.
- Accumulation order: every generated sum is the same left-associative
  chain ``t1 + t2 + ... + tn`` that the engine's unrolled/folded Column
  expressions produce (0.0 + t1 == t1 exactly, so the fold seed is
  harmless).
- Cross-row double aggregation (SUM over groups) IS order-dependent, so
  oracle-checked queries route cross-row sums through DECIMAL (exact,
  order-independent) and cast the result back to DOUBLE — see dsum().
"""

from __future__ import annotations


def elem(col: str, i: int) -> str:
    """1-indexed element access with exact float→double upcast."""
    return f"CAST({col}[{i}] AS DOUBLE)"


def _terms(a: str, b: str, dim: int, fmt) -> str:
    return " + ".join(fmt(elem(a, i), elem(b, i)) for i in range(1, dim + 1))


def sql_squared_l2(a: str, b: str, dim: int) -> str:
    return _terms(a, b, dim, lambda x, y: f"(({x}) - ({y})) * (({x}) - ({y}))")


def sql_l2(a: str, b: str, dim: int) -> str:
    return f"sqrt({sql_squared_l2(a, b, dim)})"


def sql_inner_product(a: str, b: str, dim: int) -> str:
    return _terms(a, b, dim, lambda x, y: f"({x}) * ({y})")


def sql_negative_inner_product(a: str, b: str, dim: int) -> str:
    return f"-({sql_inner_product(a, b, dim)})"


def sql_norm(a: str, dim: int) -> str:
    sq = " + ".join(f"({elem(a, i)}) * ({elem(a, i)})" for i in range(1, dim + 1))
    return f"sqrt({sq})"


def sql_cosine_similarity(a: str, b: str, dim: int) -> str:
    return f"(({sql_inner_product(a, b, dim)}) / (({sql_norm(a, dim)}) * ({sql_norm(b, dim)})))"


def sql_cosine_distance(a: str, b: str, dim: int) -> str:
    return f"(1.0 - {sql_cosine_similarity(a, b, dim)})"


def sql_l1(a: str, b: str, dim: int) -> str:
    return _terms(a, b, dim, lambda x, y: f"abs(({x}) - ({y}))")


def sql_hamming(a: str, b: str, dim: int) -> str:
    return _terms(
        a, b, dim,
        lambda x, y: f"(CASE WHEN ({x}) <> ({y}) THEN 1.0 ELSE 0.0 END)",
    )


def sql_chebyshev(a: str, b: str, dim: int) -> str:
    args = ", ".join(
        f"abs(({elem(a, i)}) - ({elem(b, i)}))" for i in range(1, dim + 1)
    )
    return f"greatest({args})"


def sql_canberra(a: str, b: str, dim: int) -> str:
    """Σ |a−b|/(|a|+|b|), zero-denominator terms contribute 0."""
    return _terms(
        a, b, dim,
        lambda x, y: (
            f"(CASE WHEN abs({x}) + abs({y}) = 0.0 THEN 0.0 "
            f"ELSE abs(({x}) - ({y})) / (abs({x}) + abs({y})) END)"
        ),
    )


def sql_bray_curtis(a: str, b: str, dim: int) -> str:
    num = _terms(a, b, dim, lambda x, y: f"abs(({x}) - ({y}))")
    den = _terms(a, b, dim, lambda x, y: f"abs(({x}) + ({y}))")
    return f"(({num}) / ({den}))"


def sql_minkowski_p3_rounded(a: str, b: str, dim: int, digits: int = 6) -> str:
    """p=3 Minkowski with exact cubes; the final 1/3 root goes through
    pow() (not correctly rounded everywhere) so the result is rounded."""
    s = _terms(
        a, b, dim,
        lambda x, y: f"(abs(({x}) - ({y})) * abs(({x}) - ({y})) * abs(({x}) - ({y})))",
    )
    third = repr(1.0 / 3.0)
    return f"round(pow({s}, {third}), {digits})"


def sql_distance(a: str, b: str, metric: str, dim: int) -> str:
    m = metric.lower()
    return {
        "l2": sql_l2,
        "squared_l2": sql_squared_l2,
        "ip": sql_negative_inner_product,
        "cosine": sql_cosine_distance,
        "l1": sql_l1,
        "hamming": sql_hamming,
        "chebyshev": sql_chebyshev,
    }[m](a, b, dim)


def dlit(x: float) -> str:
    """Exact double literal: string-cast round-trips repr() precisely
    (DuckDB parses bare decimals as DECIMAL, which would diverge)."""
    return f"CAST('{x!r}' AS DOUBLE)"


def dsum(expr: str, scale: int = 6) -> str:
    """Order-independent cross-row sum of a double expression.

    Each row's double is rounded exactly once into DECIMAL(38, scale)
    (identical in both engines since the input doubles are identical), the
    DECIMAL sum is exact in any order, and the final cast back to DOUBLE is
    deterministic. Use for every oracle-checked aggregate over doubles.
    """
    return f"CAST(SUM(CAST(CAST({expr} AS DOUBLE) AS DECIMAL(38,{scale}))) AS DOUBLE)"


def bsum(expr: str, bits: int = 40) -> str:
    """Order-independent binary fixed-point sum (see aggregates.bsum)."""
    factor = float(2 ** bits)
    return (
        f"(CAST(CAST(SUM(CAST(round(CAST({expr} AS DOUBLE) * {factor!r}) AS BIGINT)) "
        f"AS BIGINT) AS DOUBLE) / {factor!r})"
    )


def davg(expr: str, scale: int = 6) -> str:
    """Order-independent mean: exact decimal sum / exact count."""
    return f"(CAST(SUM(CAST(CAST({expr} AS DOUBLE) AS DECIMAL(38,{scale}))) AS DOUBLE) / COUNT(*))"
