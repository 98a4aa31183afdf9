"""Product quantization (SURVEY §2.10; reference
NeuronDB/src/ml/ml_product_quantization.c + OPQ ml_opq.c).

- train: split dims into M subspaces; per-subspace KMeans (MLlib,
  sampled like IVF) → M codebooks of K centroids.
- encode: per subspace, nearest-codeword id — a pure Column expression
  (argmin over codeword literals via array_min on (dist, idx) structs):
  distributed, codegen'd, no UDF. Output: array<int> of M codes
  (M·log2(K) bits vs 32·dim — e.g. 64-d float32 → 8 bytes at M=8,K=256).
- adc_distance: asymmetric distance — Σ_m ||q_m − codebook_m[code_m]||²
  with the per-query lookup table inlined as literals (the classic ADC
  scan; JVM-side, no shuffle).
"""

from __future__ import annotations

import json
import os

import pandas as pd  # noqa: F401  (resolves pandas_udf type hints)
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neurondb_spark.functions.vector import vec


class PQCodebook:
    def __init__(self, m: int, k: int, dim: int, codebooks: list[list[list[float]]]):
        self.m = m
        self.k = k
        self.dim = dim
        self.codebooks = codebooks  # [m][k][dim/m]
        self.sub = dim // m

    @staticmethod
    def train(
        df: DataFrame, vec_col: str, dim: int, m: int = 8, k: int = 16,
        sample_cap: int = 10_000, seed: int = 42, max_iter: int = 25,
    ) -> "PQCodebook":
        if dim % m != 0:
            raise ValueError("neurondb: dim must be divisible by m")
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        sub = dim // m
        total = df.count()
        frac = min(1.0, sample_cap / max(total, 1))
        sample = (df.sample(fraction=frac, seed=seed) if frac < 1.0 else df).cache()
        books = []
        for mi in range(m):
            feats = sample.select(
                array_to_vector(
                    F.slice(vec(vec_col), mi * sub + 1, sub)
                ).alias("features")
            )
            km = KMeans(k=k, seed=seed + mi, maxIter=max_iter, initMode="k-means||")
            model = km.fit(feats)
            books.append([[float(x) for x in c] for c in model.clusterCenters()])
        return PQCodebook(m, k, dim, books)

    @staticmethod
    def train_lloyd_exact(
        df: DataFrame, vec_col: str, id_col: str, dim: int,
        m: int = 8, k: int = 16, iters: int = 2,
    ) -> "PQCodebook":
        """Deterministic, oracle-replayable per-subspace codebook
        (pq_ops.c trains per-subspace kmeans; here the trainer is the
        same fixed-Lloyd recipe as ``ml/stats.kmeans_lloyd_exact``, run
        for all m subspaces in ONE relational flow): init code c =
        sub-slices of the (c+1)-th lowest-id row, then ``iters`` rounds
        of fixed-point (bsum) assignment with ties to the lower code and
        decimal-exact (davg) means; a code left empty by an assignment
        round carries its previous centroid forward. Every arithmetic
        step is replayed bit-for-bit by a portable SQL CTE chain.

        Scale: the exploded join shuffles n·dim·k rows per round (the
        honest distributed Lloyd shape — subspaces add a grouping column,
        not a pass); only the final m·k·(dim/m) codebook (KBs) collects.
        """
        from pyspark.sql import Window as W

        from neurondb_spark.functions.aggregates import bsum, davg

        if dim % m != 0:
            raise ValueError("neurondb: dim must be divisible by m")
        sub = dim // m
        ex = df.select(
            id_col, F.posexplode(vec(vec_col)).alias("_p0", "val")
        ).select(
            id_col,
            (F.col("_p0") / sub).cast("int").alias("mi"),
            (F.col("_p0") % sub + 1).cast("int").alias("spos"),
            "val",
        )
        init = (
            df.select(id_col).orderBy(id_col).limit(k)
            .select(
                id_col,
                (F.row_number().over(W.orderBy(id_col)) - 1).alias("code"),
            )
        )
        cent = init.join(ex, id_col).select(
            "mi", "code", "spos", F.col("val").alias("cval")
        )
        for _ in range(iters):
            d = (
                ex.join(cent, ["mi", "spos"])
                .groupBy(id_col, "mi", "code")
                .agg(bsum((F.col("val") - F.col("cval"))
                          * (F.col("val") - F.col("cval"))).alias("dist"))
            )
            w = W.partitionBy(id_col, "mi").orderBy(
                F.col("dist").asc(), F.col("code").asc()
            )
            assign = (
                d.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .select(id_col, "mi", "code")
            )
            means = (
                assign.join(ex, [id_col, "mi"])
                .groupBy("mi", "code", "spos")
                .agg(davg("val").alias("cval"))
            )
            cent = (
                cent.select("mi", "code", "spos", F.col("cval").alias("_prev"))
                .join(means, ["mi", "code", "spos"], "left")
                .select(
                    "mi", "code", "spos",
                    F.coalesce("cval", "_prev").alias("cval"),
                )
            )
        books = [[[0.0] * sub for _ in range(k)] for _ in range(m)]
        for r in cent.collect():
            books[r["mi"]][r["code"]][r["spos"] - 1] = float(r["cval"])
        return PQCodebook(m, k, dim, books)

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "pq.json"), "w") as f:
            json.dump(
                {"m": self.m, "k": self.k, "dim": self.dim, "codebooks": self.codebooks},
                f,
            )

    @staticmethod
    def load(path: str) -> "PQCodebook":
        with open(os.path.join(path, "pq.json")) as f:
            d = json.load(f)
        return PQCodebook(d["m"], d["k"], d["dim"], d["codebooks"])

    # -------------------------------------------------------- expressions

    def _sub_dist_sq(self, subvec: Column, codeword: list[float]) -> Column:
        s = None
        for j, w in enumerate(codeword):
            d = F.element_at(subvec, j + 1) - F.lit(float(w))
            term = d * d
            s = term if s is None else s + term
        return s

    def encode_expr(self, vec_col: Column | str) -> Column:
        """array<int> of per-subspace nearest-codeword ids."""
        v = vec(vec_col)
        codes = []
        for mi in range(self.m):
            subvec = F.slice(v, mi * self.sub + 1, self.sub)
            pairs = F.array(
                *[
                    F.struct(
                        self._sub_dist_sq(subvec, cw).alias("d"),
                        F.lit(ci).alias("i"),
                    )
                    for ci, cw in enumerate(self.codebooks[mi])
                ]
            )
            codes.append(F.array_min(pairs)["i"])
        return F.array(*codes)

    def encode_udf(self):
        """Arrow-batched numpy encoder — the corpus-scale path.

        The expression form (``encode_expr``) unrolls m·k·(dim/m)
        sub-distance terms; at m=8,k=16,dim=64 the generated method blows
        janino's 64 KB limit and the whole stage silently runs
        interpreted (~20× slower). The batch form is one (rows, k) GEMM
        per subspace per Arrow batch — vectorized, constant code size.
        Same argmin (lowest index wins ties in both numpy argmin and the
        struct array_min), so codes are identical."""
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        books = [np.array(b, dtype=np.float64) for b in self.codebooks]
        m, sub = self.m, self.sub

        @pandas_udf("array<int>")
        def _encode(vecs: pd.Series) -> pd.Series:
            x = np.array(vecs.tolist(), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for mi in range(m):
                xs = x[:, mi * sub:(mi + 1) * sub]
                cb = books[mi]
                # ||x-c||² = |x|² - 2x·c + |c|²; argmin unaffected by |x|²
                d = -2.0 * (xs @ cb.T) + (cb * cb).sum(axis=1)
                codes[:, mi] = np.argmin(d, axis=1)
            return pd.Series([row.tolist() for row in codes])

        return _encode

    def encode_udf_exact(self):
        """Arrow-batched numpy encoder BIT-IDENTICAL to ``encode_expr``:
        the squared sub-distance accumulates with an explicit left-assoc
        loop (d = t0²; d = d + t1²; …) of elementwise float64 ops — the
        same IEEE rounding sequence as the expression fold — instead of
        ``encode_udf``'s expanded −2x·c+|c|² GEMM (whose BLAS summation
        order is unspecified). numpy argmin ties → lowest index, matching
        the struct array_min. Use for oracle-checked paths; at m=8,k=16
        it is ~50× faster than the interpreted expression (which falls
        out of whole-stage codegen past janino's 64 KB)."""
        import numpy as np
        from pyspark.sql.functions import pandas_udf

        books = [np.array(b, dtype=np.float64) for b in self.codebooks]
        m, sub = self.m, self.sub

        @pandas_udf("array<int>")
        def _encode(vecs: pd.Series) -> pd.Series:
            x = np.asarray(vecs.tolist(), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for mi in range(m):
                xs = x[:, mi * sub:(mi + 1) * sub]
                cb = books[mi]
                diff = xs[:, None, 0] - cb[None, :, 0]
                d = diff * diff
                for j in range(1, sub):
                    diff = xs[:, None, j] - cb[None, :, j]
                    d = d + diff * diff
                codes[:, mi] = np.argmin(d, axis=1)
            return pd.Series([row.tolist() for row in codes])

        return _encode

    def decode_expr(self, codes_col: Column | str) -> Column:
        """Reconstruct the (approximate) vector from codes."""
        c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
        parts = []
        for mi in range(self.m):
            code = F.element_at(c, mi + 1)
            for j in range(self.sub):
                val = None
                for ci, cw in enumerate(self.codebooks[mi]):
                    lit = F.lit(float(cw[j]))
                    val = (
                        F.when(code == ci, lit)
                        if val is None
                        else val.when(code == ci, lit)
                    )
                parts.append(val)
        return F.array(*parts)

    def adc_distance_expr(self, codes_col: Column | str, query: list[float]) -> Column:
        """Asymmetric distance: the per-query LUT (m×k squared sub-dists)
        is computed in Python and inlined — each row does m array lookups."""
        c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
        total = None
        for mi in range(self.m):
            qsub = query[mi * self.sub: (mi + 1) * self.sub]
            lut = [
                sum((a - b) ** 2 for a, b in zip(qsub, cw))
                for cw in self.codebooks[mi]
            ]
            lut_arr = F.array(*[F.lit(float(x)) for x in lut])
            term = F.element_at(lut_arr, F.element_at(c, mi + 1) + 1)
            total = term if total is None else total + term
        return F.sqrt(total)


def pq_search(
    df_codes: DataFrame, codebook: PQCodebook, codes_col: str, query: list[float],
    k: int = 10, id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over PQ codes — the memory-light ANN scan (reads M bytes
    per row instead of 4·dim)."""
    d = codebook.adc_distance_expr(codes_col, query)
    return (
        df_codes.withColumn("adc_distance", d)
        .orderBy(F.col("adc_distance").asc(), F.col(id_col).asc())
        .limit(k)
    )
