"""Z-order layout key (operators/layout.py) and CCNet-style per-language
perplexity bucketing (operators/corpus.py ppl_bucket_assign)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def _morton(x, y, bits):
    z = 0
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def test_zorder_key_matches_reference_bit_layout(spark):
    from neurondb_spark.operators.layout import zorder_key

    rows = [(x, y) for x in (0, 1, 5, 63) for y in (0, 2, 31, 63)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=6).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _morton(x, y, 6), (x, y)


def test_zorder_key_masks_high_bits_and_validates(spark):
    from neurondb_spark.operators.layout import zorder_key

    df = spark.createDataFrame([(64 + 5, 3)], "x long, y long")
    z = df.select(zorder_key(["x", "y"], bits=6).alias("z")).head()["z"]
    assert z == _morton(5, 3, 6)  # high bits masked, not an error
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key(["x", "y"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([], bits=4)


def test_zorder_layout_clusters_files(spark):
    """After the layout pass, each partition covers a narrow z-range —
    the property that makes parquet min/max skipping effective."""
    from neurondb_spark.operators.layout import zorder_key, zorder_layout

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cols = [F.col("user_id").bitwiseAND(63), F.col("event_id").bitwiseAND(63)]
    out = zorder_layout(ev, cols, bits=6, num_partitions=8)
    assert sorted(out.columns) == sorted(ev.columns)
    assert out.count() == ev.count()
    spans = (
        out.withColumn("z", zorder_key(cols, bits=6))
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg((F.max("z") - F.min("z")).alias("span"))
        .collect()
    )
    full_span = 2 ** 12 - 1
    assert len(spans) > 1
    # range partitioning on z: every partition's span is a fraction of
    # the key space (unclustered input would give ~full_span per part)
    assert all(r["span"] < full_span / 2 for r in spans)


def test_ppl_buckets_tercile_sizes_and_ordering(spark):
    from neurondb_spark.operators.corpus import ppl_bucket_assign

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    b = ppl_bucket_assign(docs, "text", "doc_id", "lang").cache()
    per_lang = {
        (r["lang"], r["bucket"]): r["n"]
        for r in b.groupBy("lang", "bucket").agg(F.count("*").alias("n")).collect()
    }
    langs = {k[0] for k in per_lang}
    for lang in langs:
        sizes = [per_lang.get((lang, bk), 0) for bk in ("head", "middle", "tail")]
        n = sum(sizes)
        # nearest-rank terciles: each bucket within 2 of n/3
        assert all(abs(s - n / 3) <= 2 for s in sizes), (lang, sizes)
    # ordering invariant: every head score > every tail score within lang
    agg = (
        b.groupBy("lang")
        .agg(
            F.min(F.when(F.col("bucket") == "head", F.col("mean_tri_prob"))).alias("min_head"),
            F.max(F.when(F.col("bucket") == "tail", F.col("mean_tri_prob"))).alias("max_tail"),
        )
        .collect()
    )
    for r in agg:
        assert r["min_head"] > r["max_tail"], r["lang"]
    b.unpersist()


def test_grouped_lm_conditions_on_group_only(spark):
    """A document's score under the per-language LM must depend only on
    its language's text: adding documents in ANOTHER language must not
    change it (the property the corpus-wide LM does not have)."""
    from neurondb_spark.operators.corpus import trigram_lm_scores_grouped

    rows_en = [(1, "the quick brown fox jumps", "en"),
               (2, "the lazy dog sleeps all day", "en")]
    rows_de = [(3, "der schnelle braune fuchs", "de")]
    df_en = spark.createDataFrame(rows_en, "doc_id long, text string, lang string")
    df_all = spark.createDataFrame(rows_en + rows_de,
                                   "doc_id long, text string, lang string")
    s1 = {r["doc_id"]: r["mean_tri_prob"]
          for r in trigram_lm_scores_grouped(df_en, "text", "doc_id", "lang").collect()}
    s2 = {r["doc_id"]: r["mean_tri_prob"]
          for r in trigram_lm_scores_grouped(df_all, "text", "doc_id", "lang").collect()}
    assert s1[1] == s2[1] and s1[2] == s2[2]


def test_ppl_threshold_sample_frac(spark):
    """Sampled threshold fit (CCNet's own recipe): full-fit and
    sampled-fit agree on per-(lang, bucket) counts at sf0.01 tolerances;
    a fraction that misses a whole language refuses instead of silently
    dropping its documents; bad fractions raise."""
    import pytest

    from neurondb_spark.operators.corpus import ppl_bucket_assign
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = ppl_bucket_assign(docs, "text", "doc_id", "lang")
    sampled = ppl_bucket_assign(docs, "text", "doc_id", "lang",
                                threshold_sample_frac=0.5)
    def counts(b):
        return {(r["lang"], r["bucket"]): r["n"]
                for r in b.groupBy("lang", "bucket")
                .agg(F.count("*").alias("n")).collect()}
    cf, cs = counts(full), counts(sampled)
    assert set(k[0] for k in cf) == set(k[0] for k in cs)
    # every document still assigned, and bucket shares stay close to the
    # exact terciles (sampled cutoffs shift boundaries only)
    for lang in {k[0] for k in cf}:
        n_full = sum(v for k, v in cf.items() if k[0] == lang)
        n_samp = sum(v for k, v in cs.items() if k[0] == lang)
        assert n_full == n_samp, lang
        for bk in ("head", "middle", "tail"):
            share_f = cf.get((lang, bk), 0) / n_full
            share_s = cs.get((lang, bk), 0) / n_samp
            assert abs(share_f - share_s) < 0.15, (lang, bk, share_f, share_s)
    with pytest.raises(ValueError, match="threshold_sample_frac"):
        ppl_bucket_assign(docs, "text", "doc_id", "lang",
                          threshold_sample_frac=1.5)
    # a one-doc language cannot survive a tiny sample fraction: hash of
    # a single id either keeps it (fine) or the guard must refuse
    tiny = spark.createDataFrame(
        [(1, "aaaa bbbb cccc dddd", "zz")] +
        [(i, f"text number {i} common words here", "en")
         for i in range(2, 200)],
        "doc_id long, text string, lang string",
    )
    try:
        out = ppl_bucket_assign(tiny, "text", "doc_id", "lang",
                                threshold_sample_frac=0.02)
        assert out.where(F.col("lang") == "zz").count() == 1
    except ValueError as e:
        assert "zero sampled documents" in str(e)


def test_zorder_overflow_validation(spark):
    """validate=True surfaces the silent low-bit masking: an
    out-of-range column raises with its overflow count; in-range data
    passes; zorder_overflow_counts reports per column."""
    import pytest

    from neurondb_spark.operators.layout import (
        zorder_layout,
        zorder_overflow_counts,
    )

    df = spark.createDataFrame(
        [(1, 5), (2, 300), (-3, 7), (4, 2)], "x long, y long"
    )
    over = zorder_overflow_counts(df, ["x", "y"], bits=8)
    assert over == {"col_0": 1, "col_1": 1}  # -3 and 300 alias at 8 bits
    with pytest.raises(ValueError, match="outside"):
        zorder_layout(df, ["x", "y"], bits=8, validate=True)
    ok = spark.createDataFrame([(1, 5), (2, 250)], "x long, y long")
    assert zorder_overflow_counts(ok, ["x", "y"], bits=8) == {
        "col_0": 0, "col_1": 0
    }
    assert zorder_layout(ok, ["x", "y"], bits=8, validate=True).count() == 2
    # default stays permissive (layout keys order data, not validate it)
    assert zorder_layout(df, ["x", "y"], bits=8).count() == 4
