"""Quantization codecs (SURVEY §2.10) as Column expressions / Arrow UDFs.

Reference semantics (NeuronDB/src/types/quantization.c):
- int8:  scale = 127/max_abs; q_i = trunc(clamp(v_i·scale, -127, 127))
  (C float→int8 cast truncates toward zero, :62-110); dequant = q/scale
  (:528-533)
- uint8: scale = 255/(max−min); q_i = trunc((v_i−min)·scale) (:967-1037)
- binary: sign bit per dimension (:754); Hamming = popcount(xor)
  (binaryvec_hamming_distance, vector_types.c:1502)
- fp16: IEEE-754 half round-trip (:152-227) — implemented with numpy
  float16 (bit-exact) behind an Arrow UDF
- ternary: sign with dead-zone at ±threshold·max_abs

All integer codecs are pure expressions (exact in any engine); fp16 is the
UDF path.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401
from pyspark.sql import Column
from pyspark.sql import functions as F

from neurondb_spark.functions.vector import vec


def _max_abs(a: Column) -> Column:
    return F.array_max(F.transform(a, F.abs))


def int8_scale(a: Column | str) -> Column:
    """127 / max|v| (quantization.c:67-71); max_abs=0 → scale 1.0 (:846)."""
    a = vec(a)
    m = _max_abs(a)
    return F.when(m == 0.0, F.lit(1.0)).otherwise(127.0 / m)


def vector_to_int8(a: Column | str) -> Column:
    """array<int> in [-127,127], C truncation semantics."""
    a = vec(a)
    s = int8_scale(a)
    return F.transform(
        a,
        lambda x: F.least(F.greatest(x * s, F.lit(-127.0)), F.lit(127.0)).cast("int"),
    )


def int8_dequantize(q: Column | str, scale: Column) -> Column:
    q = F.col(q) if isinstance(q, str) else q
    return F.transform(q, lambda x: x.cast("double") / scale)


def int8_roundtrip_error(a: Column | str) -> Column:
    """Mean |v − dequant(quant(v))| — the quantize_analyze_int8 error stat
    (quantization.c:463-1216)."""
    a = vec(a)
    s = int8_scale(a)
    deq = F.transform(
        a,
        lambda x: F.least(F.greatest(x * s, F.lit(-127.0)), F.lit(127.0))
        .cast("int")
        .cast("double")
        / s,
    )
    abs_err = F.zip_with(a, deq, lambda x, y: F.abs(x - y))
    return F.aggregate(abs_err, F.lit(0.0), lambda acc, x: acc + x) / F.size(a)


def vector_to_uint8(a: Column | str) -> Column:
    """(v−min)·255/(max−min), truncated; constant vector → all zeros
    (quantization.c:993-1037)."""
    a = vec(a)
    lo, hi = F.array_min(a), F.array_max(a)
    s = 255.0 / (hi - lo)
    return F.when(
        hi == lo, F.transform(a, lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            a, lambda x: F.least(F.greatest((x - lo) * s, F.lit(0.0)), F.lit(255.0)).cast("int")
        )
    )


def vector_to_ternary(a: Column | str, threshold: float = 0.33) -> Column:
    """{-1,0,1}: dead zone within threshold·max_abs (ml_quantization fp8/
    ternary family)."""
    a = vec(a)
    cut = _max_abs(a) * F.lit(float(threshold))
    return F.transform(
        a,
        lambda x: F.when(x > cut, F.lit(1))
        .when(x < -cut, F.lit(-1))
        .otherwise(F.lit(0)),
    )


def binary_signature_bits(a: Column | str) -> Column:
    """Sign-bit vector as array<int> of {0,1} (binary_quantize,
    quantization.c:754)."""
    a = vec(a)
    return F.transform(a, lambda x: F.when(x >= 0.0, F.lit(1)).otherwise(F.lit(0)))


def binary_hamming(a: Column | str, b: Column | str) -> Column:
    """binaryvec_hamming_distance: # of dims with differing sign bits."""
    return F.aggregate(
        F.zip_with(
            binary_signature_bits(a),
            binary_signature_bits(b),
            lambda x, y: F.when(x != y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def fp16_roundtrip_udf():
    """IEEE-754 half-precision round-trip (vector_to_halfvec →
    halfvec_to_vector), bit-exact via numpy float16."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<float>")
    def _rt(vs: pd.Series) -> pd.Series:
        return vs.map(
            lambda v: np.asarray(v, dtype=np.float32)
            .astype(np.float16)
            .astype(np.float32)
            .tolist()
        )

    return _rt
