"""Reference-parity tests for the int4 and fp8 codecs
(quantization.c:1560-1640 + 1290-1320, ml_quantization_fp8.c:63-195)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).head()["v"]


def _arr(vals):
    return F.array(*[F.lit(float(x)) for x in vals])


def test_int4_rint_and_clamp_semantics(spark):
    from neurondb_spark.functions.quantization import vector_to_int4

    # max_abs = 8 -> scale = float32(7/8) = 0.875
    # 7.6*0.875 = 6.65 -> rint 7; -8.0*0.875 = -7 -> -7; 2.0*0.875=1.75 -> 2
    # rint is half-to-EVEN: 2.857142857...*0.875 = 2.5 -> 2 (not 3)
    v = [7.6, -8.0, 2.0, 2.5 / 0.875]
    out = _one(spark, vector_to_int4(_arr(v)))
    assert out == [7, -7, 2, 2]


def test_int4_asymmetric_low_clamp(spark):
    from neurondb_spark.functions.quantization import vector_to_int4

    # scaled below -8 clamps to -8 (NOT -7): max_abs=70 -> scale=0.1;
    # craft: impossible via scale<=7/max... use values where scaled in (-8,-7):
    # max_abs=8.5 -> scale=float32(7/8.5)=0.8235294; -8.5*s = -7.0 -> rint -7
    v = [8.5, -8.5]
    out = _one(spark, vector_to_int4(_arr(v)))
    assert out[0] == 7 and out[1] == -7


def test_int4_pack_offset8_layout(spark):
    from neurondb_spark.functions.quantization import int4_pack, int4_unpack

    q = F.array(*[F.lit(x) for x in (-8, 7, 0, -1)])
    packed = _one(spark, int4_pack(q))
    # offset-8 nibbles: -8 -> 0, 7 -> 15, 0 -> 8, -1 -> 7
    # byte0 = lo nibble idx0 (0) | hi nibble idx1 (15<<4) = 0xF0
    # byte1 = lo nibble idx2 (8) | hi nibble idx3 (7<<4) = 0x78
    assert packed == [0xF0, 0x78]
    assert _one(spark, int4_unpack(F.array(*[F.lit(x) for x in packed]))) == [-8, 7, 0, -1]


def test_fp8_truncate_saturate_flush(spark):
    from neurondb_spark.functions.quantization import fp8_round

    c = lambda x, fmt: _one(spark, fp8_round(F.lit(float(x)), fmt))  # noqa: E731
    # truncation toward zero: 3.7 -> exp 1, step 0.25 -> 3.5 (not 3.75)
    assert c(3.7, "e4m3") == 3.5
    # overflow (fp32 exp > 7) saturates to the 0x7F DECODE value 480
    assert c(300.0, "e4m3") == 480.0
    assert c(-300.0, "e4m3") == -480.0
    # exp == 7 is NOT overflow: 255.9 -> step 16 -> 240
    assert c(255.9, "e4m3") == 240.0
    # flush-to-zero below 2^-6, sign dropped (byte-0 path)
    assert c(0.001, "e4m3") == 0.0
    assert c(-0.001, "e4m3") == 0.0
    assert repr(c(-0.001, "e4m3")) == "0.0"  # +0.0, not -0.0
    # e5m2: overflow decode 114688, step 2^(e-2)
    assert c(1e6, "e5m2") == 114688.0
    assert c(3.7, "e5m2") == 3.5
    assert c(7.9, "e5m2") == 7.0  # exp 2, step 1.0, trunc


def test_int4_fp8_match_c_reference_on_real_data(spark):
    """Bit-parity vs a numpy simulation of the reference C code over the
    sf0.001 embeddings."""
    from tests.conftest import SF_DIR

    from neurondb_spark.functions.quantization import (
        fp8_roundtrip_error,
        int4_roundtrip_error,
        int4_scale,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    got = {
        r["vec_id"]: (r["s"], r["e"], r["f4"], r["f5"])
        for r in emb.select(
            "vec_id",
            int4_scale("embedding").alias("s"),
            int4_roundtrip_error("embedding").alias("e"),
            fp8_roundtrip_error("embedding", "e4m3").alias("f4"),
            fp8_roundtrip_error("embedding", "e5m2").alias("f5"),
        ).collect()
    }

    def c_int4(v):
        v = np.asarray(v, dtype=np.float32)
        max_abs = np.float32(np.abs(v).max())
        scale = np.float32(1.0) if max_abs == 0 else np.float32(np.float32(7.0) / max_abs)
        scaled = (v * scale).astype(np.float32)
        vals = np.where(scaled > 7.0, 7, np.where(scaled < -8.0, -8, np.rint(scaled).astype(np.int8)))
        deq = (vals.astype(np.float32) / scale).astype(np.float32)
        err = np.abs(v.astype(np.float64) - deq.astype(np.float64))
        s = 0.0
        for x in err:
            s += x
        return float(scale), s / len(v)

    def c_fp8(v, man, max_exp, min_exp, omax):
        out = []
        for x in np.asarray(v, dtype=np.float32):
            if x == 0.0:
                out.append(0.0)
                continue
            b = np.float32(x).view(np.uint32)
            sign = -1.0 if (b >> 31) & 1 else 1.0
            exp = int((b >> 23) & 0xFF) - 127
            mant = int((b >> (23 - man)) & ((1 << man) - 1))
            if exp > max_exp:
                out.append(sign * omax)
            elif exp < min_exp:
                out.append(0.0)
            else:
                out.append(sign * (2.0 ** exp) * (1 + mant / (2 ** man)))
        err = np.abs(np.asarray(v, dtype=np.float64) - np.asarray(out))
        s = 0.0
        for x in err:
            s += x
        return s / len(v)

    for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50).collect():
        vid, v = r["vec_id"], r["embedding"]
        sc, e = c_int4(v)
        assert got[vid][0] == sc
        assert got[vid][1] == pytest.approx(e, abs=0.0)
        assert got[vid][2] == c_fp8(v, 3, 7, -6, 480.0)
        assert got[vid][3] == c_fp8(v, 2, 15, -14, 114688.0)
