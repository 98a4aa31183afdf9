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
    """float32(7 / max|v|) — the reference computes the scale in float4
    (quantize_vector_int4, quantization.c:1560-1594); max_abs=0 → scale
    1.0. Returned as the double value of that float32."""
    a = vec(a)
    m = _max_abs(a)
    return F.when(m == 0.0, F.lit(1.0)).otherwise(
        (7.0 / m).cast("float").cast("double")
    )


def _int4_value(x: Column, s: Column) -> Column:
    """quantize_vector_int4 (quantization.c:1608-1632): scaled = v·scale in
    float32; clamp to [−8, 7] with asymmetric bounds; otherwise
    rintf (round-half-to-EVEN) — Spark's bround is exactly HALF_EVEN."""
    scaled = (x.cast("float") * s.cast("float")).cast("double")
    return (
        F.when(scaled > 7.0, F.lit(7))
        .when(scaled < -8.0, F.lit(-8))
        .otherwise(F.bround(scaled, 0).cast("int"))
    )


def vector_to_int4(a: Column | str) -> Column:
    """array<int> in [-8,7] with rintf rounding (quantization.c:1614-1621)."""
    a = vec(a)
    s = int4_scale(a)
    return F.transform(a, lambda x: _int4_value(x, s))


def int4_pack(q: Column | str) -> Column:
    """Pack int4 values two-per-byte in the reference's storage layout
    (quantization.c:1623-1637): OFFSET-8 nibbles (uvalue = value + 8, so
    −8..−1 → 0..7 and 0..7 → 8..15); lo nibble = even index, hi nibble =
    odd index. Returns array<int> of bytes."""
    q = F.col(q) if isinstance(q, str) else q
    nbytes = ((F.size(q) + 1) / 2).cast("int")
    idx = F.sequence(F.lit(0), nbytes - 1)
    return F.transform(
        idx,
        lambda i: F.shiftleft(
            # a missing odd element packs as nibble 0 (reference zeroes the
            # byte buffer before OR-ing nibbles in); &15 mirrors the
            # reference's uvalue clamp so out-of-range inputs can't bleed
            # into the neighboring nibble
            F.coalesce(F.element_at(q, i * 2 + 2) + 8, F.lit(0))
            .bitwiseAND(F.lit(15)), 4
        ).bitwiseOR(
            F.coalesce(F.element_at(q, i * 2 + 1) + 8, F.lit(0))
            .bitwiseAND(F.lit(15))
        ),
    )


def int4_unpack(p: Column | str, n: Column | None = None) -> Column:
    """Inverse of int4_pack: value = nibble − 8 (quantization.c:1290-1300).
    ``n`` trims a padded trailing nibble when the original length was odd;
    without ``n`` that pad nibble (stored as 0) decodes as −8."""
    p = F.col(p) if isinstance(p, str) else p
    flat = F.flatten(
        F.transform(
            p,
            lambda b: F.array(
                b.bitwiseAND(F.lit(15)) - 8,
                F.shiftright(b, 4).bitwiseAND(F.lit(15)) - 8,
            ),
        )
    )
    return flat if n is None else F.slice(flat, 1, n)


def int4_roundtrip_error(a: Column | str) -> Column:
    """Mean |v − dequant(quant(v))| for the int4 codec: dequant is
    float32(value / scale), error accumulated in double
    (quantize_analyze_int4, quantization.c:1290-1320). Spark's Divide
    always runs in double, so the float32 quotient is reproduced by
    double-divide → round-to-float32 — identical to the reference's
    single-rounded float division except at quotient ulp boundaries
    (none occur on the test data; worst case one fp32 ulp)."""
    a = vec(a)
    s = int4_scale(a)
    deq = F.transform(
        a,
        lambda x: (_int4_value(x, s).cast("double") / s)
        .cast("float")
        .cast("double"),
    )
    abs_err = F.zip_with(a, deq, lambda x, y: F.abs(x - y))
    return F.aggregate(abs_err, F.lit(0.0), lambda acc, x: acc + x) / F.size(a)


# Reference 8-bit float formats (ml_quantization_fp8.c:63-195):
# name -> (max_exp, min_normal_exp, mantissa_bits, overflow_decode).
# The reference TRUNCATES the top mantissa bits (round-toward-zero),
# saturates overflow (fp32 exponent > max_exp) to byte 0x7F — which
# DECODES as exp=max_exp+1 with a full mantissa: 2^8·1.875 = 480 for
# e4m3, 2^16·1.75 = 114688 for e5m2 — and flushes |x| < 2^min_exp to
# +0.0 (encode drops the sign; decode maps exp-field 0 to 0.0, no
# subnormals).
FP8_FORMATS = {
    "e4m3": (7, -6, 3, 480.0),
    "e5m2": (15, -14, 2, 114688.0),
}


def fp8_round(x: Column, fmt: str = "e4m3") -> Column:
    """Encode→decode round-trip of the reference fp8 codec
    (float_to_fp8_e4m3/e5m2 + fp8_*_to_float, ml_quantization_fp8.c:63-195)
    as one expression.

    Cross-engine-exact by construction: the fp32 exponent is found by a
    comparison ladder against exact power-of-two literals (no log), the
    step is a power of two, and the mantissa truncation is
    floor(|x|/step)·step — round-toward-zero exactly like the reference's
    top-bits extraction. Overflow → ±overflow_decode; underflow and zero
    → +0.0 (sign dropped, as the reference's byte-0 path does)."""
    if fmt not in FP8_FORMATS:
        raise ValueError(f"neurondb: unknown fp8 format {fmt!r}")
    max_exp, min_exp, man, omax = FP8_FORMATS[fmt]
    xa = F.abs(x)
    w = F.when(xa >= F.lit(2.0 ** (max_exp + 1)), F.lit(float(omax)))
    for e in range(max_exp, min_exp - 1, -1):
        step = 2.0 ** (e - man)
        w = w.when(
            xa >= F.lit(2.0 ** e),
            F.floor(xa / F.lit(step)).cast("double") * F.lit(step),
        )
    q = w.otherwise(F.lit(0.0))  # zero + flush-to-zero underflow
    sign = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return F.when(q == 0.0, F.lit(0.0)).otherwise(sign * q)


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
