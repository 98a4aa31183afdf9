"""Exact-substring dedup via winnowing fingerprints (operators/dedup.py;
Schleimer et al. SIGMOD'03): the guarantee is any shared substring of
length >= window + k - 1 produces a common fingerprint in both docs."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neurondb_spark.operators.dedup import substring_dup_stats, winnow_fingerprints

SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _md5_long_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow_py(text: str, k: int, window: int) -> set[tuple[int, int]]:
    """Reference winnowing: rightmost minimum of every window."""
    npos = max(len(text) - k + 1, 1)
    h = [_md5_long_py(text[p - 1:p - 1 + k]) for p in range(1, npos + 1)]
    out = set()
    if npos < window:
        m = min(h)
        p = max(i for i, v in enumerate(h) if v == m) + 1
        return {(p, m)}
    for w in range(0, npos - window + 1):
        seg = h[w:w + window]
        m = min(seg)
        p = w + max(i for i, v in enumerate(seg) if v == m) + 1
        out.add((p, m))
    return out


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog while rain falls softly"),
    # shares a 40+ char span with doc 1
    (2, "INTRO> fox jumps over the lazy dog while rain falls softly <OUTRO padding text"),
    (3, "completely different content about distributed query processing engines"),
    (4, "short doc"),
    (5, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),  # repetitive: all-equal hashes
]


def test_winnow_matches_reference_implementation(spark):
    k, window = 5, 4
    df = spark.createDataFrame(CORPUS, SCHEMA)
    got = {}
    for r in winnow_fingerprints(df, "text", "doc_id", k=k, window=window).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_pos"], r["fp_hash"]))
    for doc_id, text in CORPUS:
        assert got.get(doc_id, set()) == _winnow_py(text, k, window), doc_id


def test_shared_long_substring_guarantee(spark):
    k, window = 5, 4  # guarantee length t = 8
    df = spark.createDataFrame(CORPUS, SCHEMA)
    fps = winnow_fingerprints(df, "text", "doc_id", k=k, window=window)
    h1 = {r["fp_hash"] for r in fps.where(F.col("doc_id") == 1).collect()}
    h2 = {r["fp_hash"] for r in fps.where(F.col("doc_id") == 2).collect()}
    h3 = {r["fp_hash"] for r in fps.where(F.col("doc_id") == 3).collect()}
    assert h1 & h2, "shared >=t substring must share a fingerprint"
    assert not (h1 & h3) and not (h2 & h3)


def test_substring_dup_stats_flags_cross_doc_spans(spark):
    df = spark.createDataFrame(CORPUS, SCHEMA)
    stats = {
        r["doc_id"]: (r["n_fp"], r["n_dup_fp"], r["dup_ratio"])
        for r in substring_dup_stats(df, "text", "doc_id", k=5, window=4).collect()
    }
    assert set(stats) == {1, 2, 3, 4, 5}
    assert stats[1][1] > 0 and stats[2][1] > 0  # the shared span flagged
    assert stats[3][1] == 0 and stats[4][1] == 0 and stats[5][1] == 0
    for doc_id, (n_fp, n_dup, ratio) in stats.items():
        assert 0 <= n_dup <= n_fp
        assert ratio == pytest.approx(n_dup / n_fp)


def test_substring_dup_pairs_and_max_df_cap(spark):
    from neurondb_spark.operators.dedup import substring_dup_pairs

    df = spark.createDataFrame(CORPUS, SCHEMA)
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in substring_dup_pairs(df, "text", "doc_id", k=5, window=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1  # the planted shared span
    assert all(3 not in p and 4 not in p for p in pairs)
    # a boilerplate hash present in >max_df docs is dropped before pairing
    # tails are runs of distinct letters so no two boiler docs share any
    # k>=5 substring OUTSIDE the boilerplate itself
    boiler = [
        (i, f"{'abcdef'[i - 10] * 6} SHARED BOILERPLATE STRING {'uvwxyz'[i - 10] * 6}")
        for i in range(10, 16)
    ]
    df2 = spark.createDataFrame(CORPUS + boiler, SCHEMA)
    capped = {
        (r["id_a"], r["id_b"])
        for r in substring_dup_pairs(
            df2, "text", "doc_id", k=5, window=4, max_df=3
        ).collect()
    }
    boiler_pairs = {p for p in capped if p[0] >= 10 and p[1] >= 10}
    assert not boiler_pairs, "boilerplate bucket should be capped away"
    assert (1, 2) in capped  # low-df pairs survive the cap
