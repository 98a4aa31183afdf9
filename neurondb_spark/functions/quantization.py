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


def int4_scale(a: Column | str) -> Column:
    """7 / max|v| — symmetric signed 4-bit range [-7, 7] (reference int4
    codec, quantization.c:91-1697); max_abs=0 → scale 1.0."""
    a = vec(a)
    m = _max_abs(a)
    return F.when(m == 0.0, F.lit(1.0)).otherwise(7.0 / m)


def vector_to_int4(a: Column | str) -> Column:
    """array<int> in [-7,7], C truncation semantics (mirrors int8)."""
    a = vec(a)
    s = int4_scale(a)
    return F.transform(
        a,
        lambda x: F.least(F.greatest(x * s, F.lit(-7.0)), F.lit(7.0)).cast("int"),
    )


def int4_pack(q: Column | str) -> Column:
    """Pack int4 values two-per-byte (lo nibble = even index, hi nibble =
    odd index; two's-complement nibbles) — the storage layout the reference
    uses for int4 vectors. Returns array<int> of bytes."""
    q = F.col(q) if isinstance(q, str) else q
    nbytes = ((F.size(q) + 1) / 2).cast("int")
    idx = F.sequence(F.lit(0), nbytes - 1)
    return F.transform(
        idx,
        lambda i: F.shiftleft(
            F.coalesce(F.element_at(q, i * 2 + 2), F.lit(0)).bitwiseAND(F.lit(15)), 4
        ).bitwiseOR(
            F.coalesce(F.element_at(q, i * 2 + 1), F.lit(0)).bitwiseAND(F.lit(15))
        ),
    )


def int4_unpack(p: Column | str, n: Column | None = None) -> Column:
    """Inverse of int4_pack (sign-extends each nibble). ``n`` trims a
    padded trailing nibble when the original length was odd."""
    p = F.col(p) if isinstance(p, str) else p

    def _ext(nib):
        return F.when(nib > 7, nib - 16).otherwise(nib)

    flat = F.flatten(
        F.transform(
            p,
            lambda b: F.array(
                _ext(b.bitwiseAND(F.lit(15))),
                _ext(F.shiftright(b, 4).bitwiseAND(F.lit(15))),
            ),
        )
    )
    return flat if n is None else F.slice(flat, 1, n)


def int4_roundtrip_error(a: Column | str) -> Column:
    """Mean |v − dequant(quant(v))| for the int4 codec (mirrors
    int8_roundtrip_error)."""
    a = vec(a)
    s = int4_scale(a)
    deq = F.transform(
        a,
        lambda x: F.least(F.greatest(x * s, F.lit(-7.0)), F.lit(7.0))
        .cast("int")
        .cast("double")
        / s,
    )
    abs_err = F.zip_with(a, deq, lambda x, y: F.abs(x - y))
    return F.aggregate(abs_err, F.lit(0.0), lambda acc, x: acc + x) / F.size(a)


# OCP 8-bit float formats: name -> (max_exp, min_normal_exp, mantissa_bits,
# max_finite). e4m3: bias 7, max 1.75·2^8 = 448; e5m2: bias 15,
# max 1.75·2^15 = 57344. (reference ml_quantization_fp8.c)
FP8_FORMATS = {
    "e4m3": (8, -6, 3, 448.0),
    "e5m2": (15, -14, 2, 57344.0),
}


def fp8_round(x: Column, fmt: str = "e4m3") -> Column:
    """Round a double onto the fp8 grid of ``fmt``, saturating at the max
    finite value (training-style saturation, no inf/nan production).

    Cross-engine-exact by construction: the exponent is found by a
    comparison ladder against exact power-of-two literals (no log), the
    quantization step is a power of two (division exact), and rounding is
    floor(|x|/step + 0.5) — half away from zero, matching the reference's
    (int)(x/step + 0.5f) on magnitudes. Subnormals use the fixed step
    2^(min_exp − mantissa_bits)."""
    if fmt not in FP8_FORMATS:
        raise ValueError(f"neurondb: unknown fp8 format {fmt!r}")
    max_exp, min_exp, man, max_val = FP8_FORMATS[fmt]
    xa = F.abs(x)
    w = None
    for k in range(max_exp, min_exp - 1, -1):
        c = xa >= F.lit(2.0 ** k)
        s = F.lit(2.0 ** (k - man))
        w = F.when(c, s) if w is None else w.when(c, s)
    step = w.otherwise(F.lit(2.0 ** (min_exp - man)))
    q = F.floor(xa / step + F.lit(0.5)).cast("double") * step
    q = F.least(q, F.lit(max_val))
    sign = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return sign * q


def vector_to_fp8(a: Column | str, fmt: str = "e4m3") -> Column:
    """Element-wise fp8 grid values as array<double> (the dequantized
    representation; the 1-byte encoding is storage detail)."""
    a = vec(a)
    return F.transform(a, lambda x: fp8_round(x, fmt))


def fp8_roundtrip_error(a: Column | str, fmt: str = "e4m3") -> Column:
    """Mean |v − fp8(v)| — quantize_analyze stat for fp8 codecs."""
    a = vec(a)
    abs_err = F.transform(a, lambda x: F.abs(x - fp8_round(x, fmt)))
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
