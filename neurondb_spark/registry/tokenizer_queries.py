"""Tokenizer-training + loader-order gate rows (round 12): the
distributed BPE merge loop (operators/bpe.py) and the deterministic
epoch shuffle (operators/corpus.epoch_shuffle).

Reference analog: the HF tokenizer surface applies a pretrained
tokenizer (neurondb--1.0.sql:5117-5157, src/onnx/neurondb_tokenizer.c);
training it — and fixing the per-epoch loader order — are the two
remaining first-class LLM-pipeline steps the north-star brief names.

Both oracles replay the FULL computation in DuckDB: the BPE oracle is a
chained CTE per merge round (pair counts → deterministic argmax → greedy
list_reduce fold — every step integer counts and string compares, so the
merge table and re-tokenized counts are value-hash exact), and the epoch
oracle replays the md5 rank keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark.functions.text import sql_tokenize
from neurondb_spark.registry.common import t

_BPE_MERGES = 10
_BPE_TOP = 50


def _q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table: rank-ordered (pair_left, pair_right,
    pair_count) for a fixed-K training run over the documents corpus."""
    from neurondb_spark.operators.bpe import bpe_train, bpe_word_table

    docs = t(spark, sf_dir, "documents")
    merges, _ = bpe_train(bpe_word_table(docs, "text"), _BPE_MERGES)
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, pair_left string, pair_right string, pair_count long",
    )


def _q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-tokenized corpus counts under the learned table: top subword
    tokens by occurrences (ties to token) after the K merges."""
    from neurondb_spark.operators.bpe import (
        bpe_token_counts,
        bpe_train,
        bpe_word_table,
    )

    docs = t(spark, sf_dir, "documents")
    _, final = bpe_train(bpe_word_table(docs, "text"), _BPE_MERGES)
    return (
        bpe_token_counts(final)
        .orderBy(F.col("occurrences").desc(), F.col("token").asc())
        .limit(_BPE_TOP)
    )


def _bpe_ctes() -> str:
    """The shared chained-CTE replay of bpe_word_table + K merge rounds.
    Round i: p{i} = adjacent-pair counts over w{i} (overlapping positions
    both count), m{i} = deterministic argmax, w{i+1} = the greedy
    left-to-right fold (list-of-lists list_reduce — seeds with the first
    symbol, then per symbol extends the merged tail or appends, exactly
    operators/bpe.merge_pair_expr)."""
    toks = sql_tokenize("text")
    parts = [
        f"""w0 AS (
  SELECT word, cnt,
         list_transform(range(1, length(word) + 1),
                        i -> substr(word, CAST(i AS INT), 1)) AS symbols
  FROM (SELECT token AS word, COUNT(*) AS cnt
        FROM (SELECT unnest({toks}) AS token FROM documents)
        GROUP BY token))"""
    ]
    for i in range(_BPE_MERGES):
        parts.append(
            f"""p{i} AS (
  SELECT symbols[CAST(t.i AS INT)] AS l,
         symbols[CAST(t.i AS INT) + 1] AS r,
         CAST(SUM(cnt) AS BIGINT) AS pair_count
  FROM w{i}, UNNEST(range(1, len(symbols))) t(i)
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"""m{i} AS (
  SELECT l, r, pair_count FROM p{i}
  ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1)"""
        )
        parts.append(
            f"""w{i + 1} AS (
  SELECT word, cnt,
         list_reduce(list_transform(symbols, s -> [s]),
                     (acc, x) -> CASE WHEN acc[-1] = m.l AND x[1] = m.r
                                 THEN list_append(acc[:-2], m.l || m.r)
                                 ELSE list_concat(acc, x) END) AS symbols
  FROM w{i} CROSS JOIN m{i} m)"""
        )
    return "WITH " + ",\n".join(parts)


def _sql_bpe_merges() -> str:
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({i + 1} AS INT) AS rank, l AS pair_left, "
        f"r AS pair_right, pair_count FROM m{i}"
        for i in range(_BPE_MERGES)
    )
    return f"{_bpe_ctes()}\n{rows}"


def _sql_bpe_token_counts() -> str:
    return f"""{_bpe_ctes()}
SELECT token, CAST(SUM(cnt) AS BIGINT) AS occurrences
FROM (SELECT unnest(symbols) AS token, cnt FROM w{_BPE_MERGES})
GROUP BY token
ORDER BY occurrences DESC, token ASC
LIMIT {_BPE_TOP}"""


_EPOCH_SEED = 0


def _q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two epochs of the deterministic loader order over documents
    (shard = lang): same rows, different md5-keyed permutations —
    replayable with no stored state."""
    from neurondb_spark.operators.corpus import epoch_shuffle

    docs = t(spark, sf_dir, "documents")
    e0 = epoch_shuffle(docs, "doc_id", "lang", epoch=0, seed=_EPOCH_SEED)
    e1 = epoch_shuffle(docs, "doc_id", "lang", epoch=1, seed=_EPOCH_SEED)
    return e0.unionByName(e1)


def _sql_epoch_shuffle() -> str:
    def key(epoch: int) -> str:
        return (
            f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
            f"'#e{epoch}#{_EPOCH_SEED}'), 1, 15)) AS BIGINT)"
        )

    def one(epoch: int) -> str:
        return f"""SELECT lang AS shard, doc_id AS id,
       CAST({epoch} AS INT) AS epoch,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY lang ORDER BY {key(epoch)} ASC, doc_id ASC
       ) AS BIGINT) AS position
FROM documents"""

    return f"{one(0)}\nUNION ALL\n{one(1)}"


QUERIES = {
    "bpe_merges_topk": (_q_bpe_merges, _sql_bpe_merges()),
    "bpe_tokenize_counts": (_q_bpe_token_counts, _sql_bpe_token_counts()),
    "epoch_shuffle_order": (_q_epoch_shuffle, _sql_epoch_shuffle()),
}
