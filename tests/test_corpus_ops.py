"""Corpus-level training-data ops: deterministic sampling / mixing
(operators/corpus.py) and streaming MinHash-LSH near-dup
(streaming/dedup.lsh_pairs_stream)."""

from __future__ import annotations

import os
import sys
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_hash_sample_deterministic_and_calibrated(spark, docs):
    from neurondb_spark.operators.corpus import hash_sample

    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=1).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=1).collect()}
    assert a == b  # pure function of the row — no RNG state
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # calibrated-ish at n=500
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=2).collect()}
    assert a != c  # seed changes the selection
    # nested property: a 0.1 sample is a subset of the 0.3 sample
    d = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1, seed=1).collect()}
    assert d <= a


def test_stratified_mix_caps_and_shares(spark, docs):
    from neurondb_spark.operators.corpus import stratified_mix

    targets = {"en": 0.4, "de": 0.2, "es": 0.2, "fr": 0.1, "zh": 0.1}
    out = stratified_mix(docs, "lang", "doc_id", targets, total=400, seed=42)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["lang"]: r["n"] for r in
            docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # capped strata (target exceeds stratum size) keep EVERY row
    for lang in ("de", "es"):
        assert per[lang] == full[lang]
    # uncapped strata land near their target count
    assert abs(per["en"] - 160) < 60
    # strata not in targets are dropped entirely
    out2 = stratified_mix(docs, "lang", "doc_id", {"en": 1.0}, total=100)
    assert out2.where(F.col("lang") != "en").count() == 0


def test_trigram_lm_scores_properties(spark):
    from neurondb_spark.operators.corpus import trigram_lm_scores

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows += [(100, "zxq qzx xqz zqx qxz")]  # statistically atypical
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           trigram_lm_scores(df, "text", "doc_id").collect()}
    assert len(out) == 21
    for r in out.values():
        assert 0.0 < r["mean_tri_prob"] < 1.0
        assert r["n_trigrams"] > 0
    # the common sentence scores higher than the gibberish doc
    assert out[0]["mean_tri_prob"] > out[100]["mean_tri_prob"]
    # identical docs get identical scores (pure function of corpus+text)
    assert out[0]["mean_tri_prob"] == out[1]["mean_tri_prob"]


def test_stream_lsh_pairs_equal_batch_any_arrival(spark, docs):
    from neurondb_spark.streaming.dedup import lsh_pairs_batch, lsh_pairs_stream

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text") \
               .where(F.col("doc_id") <= 200)
    src = os.path.join(tempfile.mkdtemp(prefix="neurondb_slsh_t_"), "docs")
    base.repartition(4).write.mode("overwrite").parquet(src)
    stream = lsh_pairs_stream(spark, src, schema, "text", "doc_id")
    q = (
        stream.writeStream.format("memory").queryName("slsh_t")
        .outputMode("append").trigger(availableNow=True).start()
    )
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
    got = {(r["id_a"], r["id_b"])
           for r in spark.table("slsh_t").distinct().collect()}
    want = {(r["id_a"], r["id_b"])
            for r in lsh_pairs_batch(
                spark.read.schema(schema).parquet(src), "text", "doc_id"
            ).collect()}
    assert got == want


def test_decontaminate_flags_verbatim_inclusion(spark):
    from neurondb_spark.operators.corpus import decontaminate

    bench = spark.createDataFrame(
        [(1, "the secret benchmark question about spark shuffles and joins")],
        "bid long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (10, "prefix text the secret benchmark question about spark "
                 "shuffles and joins suffix text"),   # verbatim inclusion
            (11, "completely unrelated document about cooking pasta at home "
                 "with fresh tomatoes and basil leaves"),
            (12, "the secret benchmark question is mentioned only partially"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           decontaminate(corpus, "text", "doc_id", bench, "text",
                         ngram_n=8).collect()}
    assert out[10]["contaminated"] and out[10]["n_contaminated_ngrams"] >= 1
    assert not out[11]["contaminated"] and out[11]["n_contaminated_ngrams"] == 0
    assert not out[12]["contaminated"]  # shares < 8 consecutive words


def test_pii_counts_and_redaction(spark):
    from neurondb_spark.operators.corpus import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@sub.example.org or +1 (555) 123-4567"),
            (2, "server at 192.168.0.17 responded"),
            (3, "nothing sensitive here, just 3.14 and the number 42"),
        ],
        "doc_id long, text string",
    )
    cnts = pii_counts("text")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", cnts["email"].alias("e"), cnts["phone"].alias("p"),
        cnts["ipv4"].alias("i"), redact_pii("text").alias("red"),
    ).collect()}
    assert (out[1]["e"], out[1]["p"]) == (1, 1)
    assert out[2]["i"] == 1
    assert (out[3]["e"], out[3]["p"], out[3]["i"]) == (0, 0, 0)
    assert "jane" not in out[1]["red"] and "[PII]" in out[1]["red"]
    assert "192.168" not in out[2]["red"]
    assert out[3]["red"] == "nothing sensitive here, just 3.14 and the number 42"


def test_lsh_drain_equals_stateful_and_batch(spark, docs):
    """The foreachBatch incremental drain, the GroupState operator and
    the batch operator must produce the same distinct pair set."""
    from neurondb_spark.streaming.dedup import lsh_pairs_batch, lsh_pairs_drain

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"), "text") \
               .where(F.col("doc_id") <= 200)
    root = tempfile.mkdtemp(prefix="neurondb_slshd_t_")
    src = os.path.join(root, "docs")
    base.repartition(4).write.mode("overwrite").parquet(src)
    got = {(r["id_a"], r["id_b"]) for r in lsh_pairs_drain(
        spark, src, schema, "text", "doc_id",
        work_dir=os.path.join(root, "work"),
    ).collect()}
    want = {(r["id_a"], r["id_b"]) for r in lsh_pairs_batch(
        spark.read.schema(schema).parquet(src), "text", "doc_id"
    ).collect()}
    assert got == want
    # incremental: NEW files after the first drain only add new pairs
    extra = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text") \
                .where(F.col("doc_id") <= 1_000_050)
    extra.coalesce(1).write.mode("append").parquet(src)
    got2 = {(r["id_a"], r["id_b"]) for r in lsh_pairs_drain(
        spark, src, schema, "text", "doc_id",
        work_dir=os.path.join(root, "work"),
    ).collect()}
    want2 = {(r["id_a"], r["id_b"]) for r in lsh_pairs_batch(
        spark.read.schema(schema).parquet(src), "text", "doc_id"
    ).collect()}
    assert got2 == want2
    assert got2 > got  # the planted near-dups (exact text copies) pair up


def test_quality_classifier_separates_planted_classes(spark):
    """The fixed-GD quality classifier (registry gate row) must actually
    LEARN: on the mixed corpus (odd doc_ids vowel-stripped = 'crawl',
    label 0) its predictions should recover the planted split."""
    from neurondb_spark.registry.text_pipeline import _q_quality_classifier

    rows = _q_quality_classifier(spark, SF_DIR).collect()
    assert len(rows) > 0
    acc = sum(
        1 for r in rows if r["prediction"] == (1 - r["doc_id"] % 2)
    ) / len(rows)
    assert acc >= 0.95, f"classifier failed to separate: acc={acc}"
    probs = [r["quality_prob"] for r in rows]
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert max(probs) - min(probs) > 0.2  # non-degenerate spread


def test_pack_sequences_invariants(spark):
    """Concat-and-slice packing must tile each shard's token stream
    exactly: per-document slices sum to the doc's token count, every
    bin except a shard's last is exactly full, offsets stay in range,
    and slices within a bin are disjoint and contiguous."""
    from collections import defaultdict

    from neurondb_spark.functions.text import token_count
    from neurondb_spark.operators.corpus import pack_sequences, packing_stats

    L = 128
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    packed = pack_sequences(docs, token_count("text"), "lang", "doc_id", L)
    rows = packed.collect()
    assert rows

    toks = {
        (r["lang"], r["doc_id"]): r["n"]
        for r in docs.select(
            "lang", "doc_id", token_count("text").cast("long").alias("n")
        ).collect()
    }
    per_doc = defaultdict(int)
    bins = defaultdict(list)
    for r in rows:
        assert 0 < r["take_tokens"] <= L
        assert 0 <= r["bin_offset"] < L
        assert r["bin_offset"] + r["take_tokens"] <= L
        assert 0 <= r["doc_offset"] < toks[(r["shard"], r["id"])]
        per_doc[(r["shard"], r["id"])] += r["take_tokens"]
        bins[(r["shard"], r["bin_id"])].append(
            (r["bin_offset"], r["take_tokens"])
        )
    # every nonzero-token doc fully placed, nothing else
    expect = {k: n for k, n in toks.items() if n > 0}
    assert per_doc == expect
    # bins tile [0, L) contiguously; only a shard's max bin may be short
    last_bin = {}
    for (shard, b) in bins:
        last_bin[shard] = max(last_bin.get(shard, -1), b)
    for (shard, b), slices in bins.items():
        slices.sort()
        pos = 0
        for off, take in slices:
            assert off == pos, f"gap in bin {(shard, b)}"
            pos += take
        if b < last_bin[shard]:
            assert pos == L, f"non-final bin {(shard, b)} not full"
    # stats agree with the exploded view
    for s in packing_stats(packed, L).collect():
        sh = s["shard"]
        assert s["n_bins"] == last_bin[sh] + 1
        assert s["total_tokens"] == sum(
            n for (l, _d), n in expect.items() if l == sh
        )
        assert 0.0 < s["fill_ratio"] <= 1.0


def test_pack_sequences_rejects_bad_seq_len(spark):
    from neurondb_spark.functions.text import token_count
    from neurondb_spark.operators.corpus import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(docs, token_count("text"), "lang", "doc_id", 0)


def test_split_corpus_disjoint_stable_and_weighted(spark):
    """Splits must cover every row exactly once, be stable across
    re-evaluation (pure function of id+seed), and land near the
    requested weights."""
    from neurondb_spark.operators.corpus import split_corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_corpus(docs, "doc_id", w, seed=7)
    n = docs.count()
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == n  # total coverage, no dup/drop
    for k, v in w.items():
        assert abs(counts.get(k, 0) / n - v) < 0.08, (k, counts)
    # stability: identical assignment on re-evaluation and other orders
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"]
         for r in split_corpus(docs.orderBy(F.desc("doc_id")), "doc_id",
                               w, seed=7).collect()}
    assert a == b
    with pytest.raises(ValueError, match="sum to 1"):
        split_corpus(docs, "doc_id", {"a": 0.5}, seed=1)


def test_exact_group_quantiles_matches_sorted_definition(spark):
    """The histogram + cumulative-rank quantiles must equal the naive
    sorted nearest-rank definition (value at index ceil(q*n) in the
    1-indexed sorted list) for every group and q."""
    import math

    from neurondb_spark.operators.corpus import exact_group_quantiles

    rows = [("a", v) for v in [5, 1, 9, 1, 7, 3, 3, 3]] + [
        ("b", v) for v in [10, 20]] + [("c", 4)]
    df = spark.createDataFrame(rows, "g string, v long")
    qs = [0.25, 0.5, 0.9, 0.99, 1.0]
    got = {r["g"]: r.asDict() for r in
           exact_group_quantiles(df, "v", "g", qs).collect()}
    by_g = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        vals.sort()
        for q in qs:
            name = f"p{q * 100:g}".replace(".", "_")
            want = vals[math.ceil(q * len(vals)) - 1]
            assert got[g][name] == want, (g, q, got[g])
    with pytest.raises(ValueError, match="quantiles"):
        exact_group_quantiles(df, "v", "g", [0.0])


def test_temperature_mix_upsamples_low_resource(spark):
    """tau<1 must push shares toward uniform: the rarest stratum's share
    of the sample exceeds its corpus share; tau=1 keeps ~natural
    proportions; rates are deterministic (re-run equality)."""
    from neurondb_spark.operators.corpus import temperature_mix

    rows = [("big", i) for i in range(900)] + [("small", i + 1000)
                                               for i in range(100)]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    out = temperature_mix(df, "lang", "doc_id", 0.5, 500, seed=3)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot = sum(counts.values())
    # corpus share of 'small' is 0.1; sqrt-temperature target is
    # sqrt(.1)/(sqrt(.9)+sqrt(.1)) ≈ 0.25
    assert counts["small"] / tot > 0.15
    again = {r["doc_id"] for r in
             temperature_mix(df, "lang", "doc_id", 0.5, 500, seed=3)
             .select("doc_id").collect()}
    assert again == {r["doc_id"] for r in out.select("doc_id").collect()}
    with pytest.raises(ValueError, match="tau"):
        temperature_mix(df, "lang", "doc_id", 0.0, 500)


def test_quantiles_and_packing_properties(spark):
    """Property check over randomized inputs (hypothesis strategies,
    driven manually to reuse ONE Spark session): exact_group_quantiles
    equals the naive sorted nearest-rank definition, and pack_sequences
    tiles exactly (per-doc conservation + full non-final bins) for
    arbitrary group shapes, values and seq_len."""
    import math
    import random as _random

    from neurondb_spark.operators.corpus import (
        exact_group_quantiles,
        pack_sequences,
    )

    rng = _random.Random(20260815)
    for trial in range(6):
        n_groups = rng.randint(1, 4)
        rows = []
        for g in range(n_groups):
            for i in range(rng.randint(1, 40)):
                rows.append((f"g{g}", rng.randint(0, 30)))
        df = spark.createDataFrame(rows, "g string, v long")
        qs = sorted(rng.sample([0.1, 0.25, 0.5, 0.75, 0.9, 1.0], 3))
        got = {r["g"]: r.asDict() for r in
               exact_group_quantiles(df, "v", "g", qs).collect()}
        by_g = {}
        for g, v in rows:
            by_g.setdefault(g, []).append(v)
        for g, vals in by_g.items():
            vals.sort()
            for q in qs:
                name = f"p{q * 100:g}".replace(".", "_")
                assert got[g][name] == vals[math.ceil(q * len(vals)) - 1]

        L = rng.choice([1, 7, 64])
        docs = [(f"s{i % n_groups}", i, rng.randint(0, 3 * L))
                for i in range(rng.randint(1, 60))]
        ddf = spark.createDataFrame(docs, "shard string, id long, n long")
        packed = pack_sequences(ddf, F.col("n"), "shard", "id", L).collect()
        per_doc = {}
        for r in packed:
            assert 0 < r["take_tokens"] <= L
            assert 0 <= r["bin_offset"] < L
            per_doc[(r["shard"], r["id"])] = per_doc.get(
                (r["shard"], r["id"]), 0) + r["take_tokens"]
        assert per_doc == {(s, i): n for s, i, n in docs if n > 0}


def test_temperature_mix_preserves_strata_dtype_and_rejects_null(spark):
    """r11 ADVICE: the rates frame must use the strata column's REAL
    DataType (an int domain id used to be built as string → mis-join),
    and NULL strata must raise instead of silently vanishing in the
    inner rate join."""
    from neurondb_spark.operators.corpus import temperature_mix

    df = spark.createDataFrame(
        [(i % 4, i) for i in range(400)], "domain int, doc_id long"
    )
    out = temperature_mix(df, "domain", "doc_id", 0.5, 200, seed=1)
    assert dict(out.dtypes)["domain"] == "int"
    got = out.groupBy("domain").count().collect()
    assert len(got) == 4  # every int stratum joined and sampled

    with_null = df.union(
        spark.createDataFrame([(None, 9999)], "domain int, doc_id long")
    )
    with pytest.raises(ValueError, match="NULL"):
        temperature_mix(with_null, "domain", "doc_id", 0.5, 200)


def test_temperature_mix_tau_monotonicity(spark):
    """τ<1 must shift sampled shares toward uniform: the low-resource
    stratum's share of the τ=0.3 sample exceeds its share of the τ=1
    sample, which itself tracks the natural corpus share (verdict r11
    #8 — covers the pow() branch the hash gate pins out at τ=0.5)."""
    from neurondb_spark.operators.corpus import temperature_mix

    rows = [("big", i) for i in range(1800)] + [
        ("small", 10_000 + i) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long")

    def small_share(tau):
        got = temperature_mix(df, "lang", "doc_id", tau, 600, seed=5)
        counts = {r["lang"]: r["count"]
                  for r in got.groupBy("lang").count().collect()}
        tot = sum(counts.values())
        return counts.get("small", 0) / tot

    s_nat, s_t3 = small_share(1.0), small_share(0.3)
    # natural share is 0.1; τ=0.3 target is p^0.3-normalized ≈ 0.33
    assert s_nat < 0.2
    assert s_t3 > s_nat + 0.1


def test_exact_group_quantiles_rejects_colliding_names(spark):
    """r11 ADVICE: two qs that render to the same p-column name (or
    literal duplicates) must raise at the API boundary, not produce an
    ambiguous frame."""
    from neurondb_spark.operators.corpus import exact_group_quantiles

    df = spark.createDataFrame([("g", 1), ("g", 2)], "g string, v long")
    with pytest.raises(ValueError, match="colliding"):
        exact_group_quantiles(df, "v", "g", [0.5, 0.5])
    with pytest.raises(ValueError, match="colliding"):
        # distinct qs, identical 6-sig-digit %g rendering
        exact_group_quantiles(df, "v", "g", [0.123456, 0.1234561])
    # sanity: a clean list still works
    ok = exact_group_quantiles(df, "v", "g", [0.5, 1.0]).collect()
    assert ok[0]["p50"] == 1 and ok[0]["p100"] == 2


def test_pack_sequences_balanced_equals_window_under_skew(spark):
    """r11 verdict #3: the distributed-prefix-sum packer must emit the
    EXACT pack_sequences layout even when one shard holds 10x the rows
    of the others (the case where the per-shard window serializes), for
    several num_splits including splits that slice mid-shard."""
    from neurondb_spark.operators.corpus import (
        pack_sequences,
        pack_sequences_balanced,
    )

    rows = [("big", i, 3 + (i * 11) % 60) for i in range(1000)]
    rows += [(f"s{j}", 10_000 + j * 100 + i, 5 + i % 17)
             for j in range(4) for i in range(100)]
    # a zero-token doc must drop in both paths
    rows.append(("big", 5000, 0))
    df = spark.createDataFrame(rows, "shard string, id long, n long")
    L = 128
    want = sorted(
        tuple(r) for r in pack_sequences(df, F.col("n"), "shard", "id", L)
        .collect()
    )
    for splits in (1, 3, 16):
        got = sorted(
            tuple(r) for r in pack_sequences_balanced(
                df, F.col("n"), "shard", "id", L, num_splits=splits
            ).collect()
        )
        assert got == want, f"num_splits={splits}"

    with pytest.raises(ValueError, match="num_splits"):
        pack_sequences_balanced(df, F.col("n"), "shard", "id", L, 0)


def test_score_weighted_sample_proportional_and_deterministic(spark):
    """Soft quality filtering: keep-rate tracks the score (2x score →
    ~2x keep-rate), score 0 is never kept, the expected kept count hits
    the target, and the sample is identical under repartitioning."""
    from neurondb_spark.operators.corpus import score_weighted_sample

    rows = [(i, 0.2 if i % 2 else 0.4) for i in range(10_000)]
    rows += [(100_000 + i, 0.0) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, w double")
    target = 3000
    kept = score_weighted_sample(df, "w", "id", target).cache()
    n_low = kept.where(F.col("w") == 0.2).count()
    n_high = kept.where(F.col("w") == 0.4).count()
    assert kept.where(F.col("w") == 0.0).count() == 0
    # rates: 0.2*3000/3000=0.2 and 0.4 → expect ~1000 and ~2000 (±10%)
    assert abs(n_low - 1000) < 100 and abs(n_high - 2000) < 150
    assert abs((n_low + n_high) - target) < 200
    ids_a = {r["id"] for r in kept.collect()}
    kept.unpersist()
    ids_b = {
        r["id"]
        for r in score_weighted_sample(df.repartition(17), "w", "id", target)
        .collect()
    }
    assert ids_a == ids_b


def test_score_weighted_sample_caps_rate_at_one(spark):
    """A score big enough to push rate past 1 keeps the row always but
    never more than once (least(1, .) cap)."""
    from neurondb_spark.operators.corpus import score_weighted_sample

    df = spark.createDataFrame(
        [(1, 100.0)] + [(i, 0.001) for i in range(2, 200)], "id long, w double"
    )
    kept = score_weighted_sample(df, "w", "id", 150)
    assert kept.where(F.col("id") == 1).count() == 1
