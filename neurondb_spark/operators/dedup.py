"""Deduplication operators for large-scale training-data pipelines (the
BASELINE north star adds these as first-class engine ops beyond the
reference surface; the reference's closest machinery is vec_join
similarity-join, NeuronDB/src/core/operators.c:535-744).

All hashing is md5-derived so Spark and a SQL oracle agree bit-for-bit
(no engine-specific hash functions). Scale design per operator:

- exact_dedup: groupBy fingerprint — one shuffle, combiner-heavy.
- minhash_lsh_pairs: shingle→K minhashes→bands; candidate pairs only meet
  inside a band bucket (shuffle key = (band, band_hash)) — never O(n²).
- ngram_jaccard_pairs: blocked self-join + exact Jaccard on token n-gram
  sets.
- simhash: 16-bit signature per doc via per-token md5 bit votes.
- embedding_neardup_pairs: cosine threshold inside coarse sign-prefix
  buckets (cheap LSH over the embedding's first bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from neurondb_spark.functions.distance import cosine_similarity
from neurondb_spark.functions.text import doc_fingerprint, tokenize


def _md5_long(c: Column) -> Column:
    """First 15 hex digits of md5 → non-negative BIGINT (60 bits) —
    cross-engine-stable hash."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup on normalized content fingerprint: one representative
    (min/max id) per fingerprint + duplicate count."""
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    return (
        df.withColumn("fingerprint", doc_fingerprint(text_col))
        .groupBy("fingerprint")
        .agg(agg_id.alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def shingles(text, n: int = 3) -> Column:
    """Word n-gram shingles as strings (dedup primitive). Documents shorter
    than n tokens yield their full token join."""
    toks = tokenize(text)
    nt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(nt - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))


def minhash_signature(text, num_hashes: int = 8, shingle_n: int = 3) -> Column:
    """MinHash signature: per hash i, min over shingles of
    md5_long(concat(shingle, '#', i)). Seeded by suffixing — identical in
    SQL. Returns array<bigint> of length num_hashes."""
    sh = shingles(text, shingle_n)

    def _seeded(i: int):
        # closure, not default arg: pyspark passes (element, index) to
        # 2-arg lambdas
        suffix = F.lit(f"#{i}")
        return lambda s: _md5_long(F.concat(s, suffix))

    sig = []
    for i in range(num_hashes):
        sig.append(F.array_min(F.transform(sh, _seeded(i))))
    return F.array(*sig)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH: docs sharing any
    band (rows_per_band consecutive minhashes) meet in a bucket.
    Returns distinct (id_a, id_b) with id_a < id_b.

    Scale: the only shuffle keys are (band_idx, band_signature) — bucket
    sizes are data-dependent but never global; skewed buckets (boilerplate
    docs) are handled by AQE skew-join when joined back.
    """
    if num_hashes % bands != 0:
        raise ValueError("neurondb: num_hashes must be divisible by bands")
    rpb = num_hashes // bands
    sig = minhash_signature(text_col, num_hashes, shingle_n)
    base = df.select(F.col(id_col), sig.alias("_sig"))
    bands_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.array_join(
                    F.transform(
                        F.slice("_sig", b * rpb + 1, rpb), lambda x: x.cast("string")
                    ),
                    "_",
                ).alias("bsig"),
            )
            for b in range(bands)
        ]
    )
    exploded = base.select(id_col, F.explode(bands_arr).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bsig").alias("bsig")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
    block_col: str | None = None,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold via an inverted shingle index:
    explode distinct shingles, self-join on the shingle (only pairs sharing
    ≥1 shingle ever meet — valid because threshold > 0), count the common
    shingles, then |A∪B| = |A|+|B|−common.

    Scale: shuffles on the shingle key instead of materializing O(n²)
    pairs — candidate count is Σ_shingle df(s)², bounded by shingle
    selectivity, not corpus size. ``max_df`` is the stop-shingle cap:
    shingles occurring in more than max_df docs are dropped BEFORE pairing
    (Jaccard is then over the rare-shingle sets — the standard
    set-similarity-join trick for boilerplate; it also removes the skew
    keys). None = exact over all shingles.
    """
    if threshold <= 0.0:
        raise ValueError("neurondb: ngram_jaccard_pairs needs threshold > 0")
    # single-file parquet scans arrive as one partition; the shingle
    # computation is CPU-heavy per row, so spread it across the cluster
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism, id_col)
    blk = [F.col(block_col)] if block_col else []
    base = df.select(
        F.col(id_col), *blk,
        F.array_distinct(shingles(text_col, shingle_n)).alias("_sh"),
    )
    ex = base.select(F.col(id_col), *blk, F.explode("_sh").alias("_s"))
    if max_df is not None:
        dfreq = ex.groupBy("_s").agg(F.count(F.lit(1)).alias("_df"))
        ex = ex.join(dfreq.where(F.col("_df") <= max_df).select("_s"), "_s")
    # materialize the inverted index once — it feeds the self-join twice
    # plus the size aggregation (at warehouse scale this is a written
    # table, sparse_index_create-style)
    ex = ex.persist()
    sizes = ex.groupBy(F.col(id_col), *blk).agg(F.count(F.lit(1)).alias("_n"))
    a, b = ex.alias("a"), ex.alias("b")
    cond = (F.col("a._s") == F.col("b._s")) & (
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    )
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    common = (
        a.join(b, cond)
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    sim = F.col("_common").cast("double") / (
        (F.col("_na") + F.col("_nb") - F.col("_common")).cast("double")
    )
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", sim.alias("jaccard_sim"))
        .where(F.col("jaccard_sim") >= F.lit(float(threshold)))
    )


def simhash(text, bits: int = 16) -> Column:
    """SimHash signature over tokens: bit j set iff Σ_tokens (±1 by md5 bit
    j) > 0. 16 bits keeps the oracle SQL tractable; the operator accepts up
    to 60."""
    toks = tokenize(text)
    h = F.transform(toks, _md5_long)
    def _vote(j: int):
        jl = F.lit(j)
        return lambda acc, x: acc + F.when(
            F.shiftright(x, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    sig = None
    for j in range(bits):
        vote = F.aggregate(h, F.lit(0), _vote(j))
        bit = F.when(vote > 0, F.lit(2 ** j)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return sig.cast("long")


def simhash_neardup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 2, bits: int = 16
) -> DataFrame:
    """Near-dup candidates by SimHash Hamming distance ≤ max_hamming,
    blocked on the signature's high byte to avoid O(n²) at scale."""
    base = df.select(F.col(id_col), simhash(text_col, bits).alias("_sh"))
    base = base.withColumn("_blk", F.shiftright("_sh", bits // 2))
    a, b = base.alias("a"), base.alias("b")
    xor = F.col("a._sh").bitwiseXOR(F.col("b._sh"))
    hamming = F.bit_count(xor)
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    dim: int | None = None,
    sign_bits: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicates: pairs with cosine sim ≥ threshold.
    Blocked by the sign pattern of the first ``sign_bits`` dimensions (a
    1-permutation hyperplane LSH): true near-dups almost always share the
    block; at scale raise sign_bits or use index/lsh.py multi-probe."""
    sign_key = F.concat_ws(
        "",
        *[
            F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(sign_bits)
        ],
    )
    base = df.select(F.col(id_col), F.col(vec_col), sign_key.alias("_blk"))
    a, b = base.alias("a"), base.alias("b")
    sim = cosine_similarity(
        F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), dim=dim, checked=False
    )
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= F.lit(float(threshold)))
    )
