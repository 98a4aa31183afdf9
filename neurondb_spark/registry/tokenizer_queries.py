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


def _q_bpe_hybrid_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HYBRID trainer's merge table (operators/bpe_local.py —
    distributed word count + driver-side heap merge loop) under the SAME
    chained-CTE oracle as bpe_merges_topk: the driver gate itself proves
    the production-scale path is bit-equal to the distributed loop."""
    from neurondb_spark.operators.bpe import bpe_word_table
    from neurondb_spark.operators.bpe_local import bpe_train_hybrid

    docs = t(spark, sf_dir, "documents")
    merges, _ = bpe_train_hybrid(bpe_word_table(docs, "text"), _BPE_MERGES)
    return spark.createDataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, pair_left string, pair_right string, pair_count long",
    )


_BPE_PROD_K = 2000


def _q_bpe_hybrid_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-vocab training run (K=2000) through the hybrid loop —
    the bench row proving tokenizer training no longer pays one Spark
    job per merge (the distributed loop would be 2000 sequential jobs).
    The synthetic documents corpus's natural-language vocabulary
    exhausts after <100 merges (early-stop, hash-gated elsewhere), so
    this row trains on a symbol-rich DETERMINISTIC word table derived
    from the corpus — md5 hex of each doc id (32 symbols over a 16-char
    alphabet, all counts tied → the total-order argmax is exercised
    every round). No oracle by design: the K=10 replay IS hash-gated
    twice (bpe_merges_topk distributed / bpe_hybrid_merges hybrid, same
    chained-CTE oracle); a 2000-round CTE chain is the same construction
    at a size DuckDB cannot plan. Output: one summary row, deterministic
    (integer counts, total-order argmax)."""
    from neurondb_spark.operators.bpe import char_symbols
    from neurondb_spark.operators.bpe_local import bpe_train_hybrid_summary

    docs = t(spark, sf_dir, "documents")
    words = (
        docs.select(F.md5(F.col("doc_id").cast("string")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("symbols", char_symbols("word"))
    )
    # (r16) summary variant: same training loop, same three values, but
    # the vocabulary aggregate is computed over the trainer's own
    # driver-resident table instead of round-tripping it back into a
    # LocalTableScan → explode → groupBy job (guide §5; the table is
    # Heaps-bounded BY the hybrid trainer's design — it was already
    # collected). Values proven equal to the old bpe_token_counts(final)
    # aggregate in tests/test_bpe_hybrid.py.
    n_merges, n_tokens, total = bpe_train_hybrid_summary(words, _BPE_PROD_K)
    return spark.createDataFrame(
        [(int(n_merges), int(n_tokens),
          None if total is None else int(total))],
        "n_merges int, n_tokens long, total_occurrences long",
    )


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


def _epoch_key_sql(epoch: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || "
        f"'#e{epoch}#{_EPOCH_SEED}'), 1, 15)) AS BIGINT)"
    )


def _sql_epoch_shuffle() -> str:
    key = _epoch_key_sql

    def one(epoch: int) -> str:
        return f"""SELECT lang AS shard, doc_id AS id,
       CAST({epoch} AS INT) AS epoch,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY lang ORDER BY {key(epoch)} ASC, doc_id ASC
       ) AS BIGINT) AS position
FROM documents"""

    return f"{one(0)}\nUNION ALL\n{one(1)}"


def _q_bpe_saved_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer PERSISTENCE round-trip under the hash gate: train K=10
    through the engine facade (hybrid loop), save the artifact to the
    catalog (operators/tokenizer_io), load it back, and re-tokenize the
    corpus AT VOCABULARY COST (the loaded merges fold once per distinct
    word via word_symbols_udf — the same Zipf trick
    bpe_tokenize_via_vocab uses corpus-wide; nesting the expression form
    K=10 deep is an O(4^K) expression tree that hangs analysis). Must
    hash-equal the same chained-CTE replay as bpe_tokenize_counts: a
    drifted save/load — a dropped merge, reordered table, lossy
    roundtrip — breaks the hash."""
    import os
    import tempfile

    from neurondb_spark.engine import NeuronSparkEngine
    from neurondb_spark.operators.bpe import bpe_token_counts, bpe_word_table
    from neurondb_spark.operators.bpe_local import word_symbols_udf
    from neurondb_spark.operators.tokenizer_io import load_tokenizer

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.rstrip("/"))
    cat = os.path.join(tempfile.gettempdir(), f"neurondb_tok_v1_{tag}")
    eng = NeuronSparkEngine(spark, cat)
    docs = t(spark, sf_dir, "documents")
    if eng.catalog.get("tokenizers", "gate_bpe") is None:
        eng.train_tokenizer("gate_bpe", docs, "text",
                            num_merges=_BPE_MERGES)
    merges, _meta = load_tokenizer(
        eng.catalog.get("tokenizers", "gate_bpe")["path"]
    )
    words = bpe_word_table(docs, "text")
    final = words.withColumn(
        "symbols", word_symbols_udf(F.col("word"), merges)
    )
    return (
        bpe_token_counts(final)
        .orderBy(F.col("occurrences").desc(), F.col("token").asc())
        .limit(_BPE_TOP)
    )


def _q_bpe_hf_import_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HF tokenizer IMPORT under the hash gate (VERDICT r14 stretch #8):
    export the saved gate tokenizer as the standard vocab.json +
    merges.txt pair (operators/tokenizer_io.export_hf_tokenizer), re-read
    the EMITTED merges.txt via load_hf_merges — counts come back as 0,
    proving apply depends on merge ORDER alone — and re-tokenize the
    corpus with those imported merges at vocabulary cost. Must hash-equal
    the same chained-CTE replay as bpe_tokenize_counts: a lossy export or
    import (dropped/reordered merge line, separator corruption) breaks
    the hash. Reference analog: the pretrained-file loading surface
    (NeuronDB/src/onnx/neurondb_tokenizer.c reads merges from disk)."""
    import os
    import tempfile

    from neurondb_spark.engine import NeuronSparkEngine
    from neurondb_spark.operators.bpe import bpe_token_counts, bpe_word_table
    from neurondb_spark.operators.bpe_local import word_symbols_udf
    from neurondb_spark.operators.tokenizer_io import (
        export_hf_tokenizer,
        load_hf_merges,
        load_tokenizer,
    )

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.rstrip("/"))
    cat = os.path.join(tempfile.gettempdir(), f"neurondb_tok_v1_{tag}")
    eng = NeuronSparkEngine(spark, cat)
    docs = t(spark, sf_dir, "documents")
    if eng.catalog.get("tokenizers", "gate_bpe") is None:
        eng.train_tokenizer("gate_bpe", docs, "text",
                            num_merges=_BPE_MERGES)
    merges, _meta = load_tokenizer(
        eng.catalog.get("tokenizers", "gate_bpe")["path"]
    )
    _vocab_path, merges_path = export_hf_tokenizer(
        os.path.join(cat, "hf_gate_bpe"), merges
    )
    imported = load_hf_merges(merges_path)
    assert [m[:2] for m in imported] == [m[:2] for m in merges]
    words = bpe_word_table(docs, "text")
    final = words.withColumn(
        "symbols", word_symbols_udf(F.col("word"), imported)
    )
    return (
        bpe_token_counts(final)
        .orderBy(F.col("occurrences").desc(), F.col("token").asc())
        .limit(_BPE_TOP)
    )


def _q_bpe_facade_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """engine.tokenize_with END-TO-END under the hash gate, including
    the corpus-scale auto-route id (round-15): apply the saved gate
    tokenizer to the documents SCAN through the facade with NO id_col —
    K=10 > MAX_EXPR_MERGES routes through the vocabulary join, and
    because the frame is one file scan the reassembly id is the
    deterministic ``_metadata`` file_path#row_index (no localCheckpoint
    materialization, the 100 TB path) — then explode the per-document
    token arrays to corpus counts. Must hash-equal the same chained-CTE
    replay as bpe_tokenize_counts: a wrong/unstable row id would scramble
    token-to-document reassembly and break the hash."""
    import os
    import tempfile

    from neurondb_spark.engine import NeuronSparkEngine

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.rstrip("/"))
    cat = os.path.join(tempfile.gettempdir(), f"neurondb_tok_v1_{tag}")
    eng = NeuronSparkEngine(spark, cat)
    docs = t(spark, sf_dir, "documents")  # plain scan — NOT tp(); the
    # row exists to drive the metadata-id route, which needs one
    # file-source leaf under row-identity nodes
    if eng.catalog.get("tokenizers", "gate_bpe") is None:
        eng.train_tokenizer("gate_bpe", docs, "text",
                            num_merges=_BPE_MERGES)
    toks = eng.tokenize_with("gate_bpe", docs, "text", out_col="toks")
    return (
        toks.select(F.explode("toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .orderBy(F.col("occurrences").desc(), F.col("token").asc())
        .limit(_BPE_TOP)
    )


_EPP_SEQ_LEN = 512
_EPP_EPOCH = 1


def _q_epoch_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loader-order composite: epoch_shuffle fixes each shard's epoch-1
    document order, pack_sequences packs the token stream IN THAT ORDER
    into 512-token bins — the two newest pipeline operators chained as
    one deterministic layout (the rag_ingest composite playbook). The
    oracle replays the md5 ranks AND the running-sum slicing, so a
    hash match proves the composition end to end."""
    from neurondb_spark.functions.text import token_count
    from neurondb_spark.operators.corpus import epoch_shuffle, pack_sequences

    docs = t(spark, sf_dir, "documents")
    order = epoch_shuffle(docs, "doc_id", "lang",
                          epoch=_EPP_EPOCH, seed=_EPOCH_SEED)
    toks = docs.select(
        F.col("lang").alias("shard"), F.col("doc_id").alias("id"),
        token_count("text").cast("long").alias("n_tokens"),
    )
    seq = toks.join(order, ["shard", "id"]).select(
        "shard", F.col("id").alias("doc_id"), "position", "n_tokens"
    )
    packed = pack_sequences(seq, "n_tokens", "shard", "position",
                            _EPP_SEQ_LEN)
    # map the pack's id (= epoch position) back to the document id —
    # co-partitioned on (shard, position), no extra exchange shape
    return packed.join(
        seq.select("shard", F.col("position").alias("id"), "doc_id"),
        ["shard", "id"],
    ).select(
        "shard", "bin_id", "doc_id", F.col("id").alias("position"),
        "doc_offset", "bin_offset", "take_tokens",
    )


def _sql_epoch_pack() -> str:
    from neurondb_spark.functions.text import sql_tokenize

    L, key = _EPP_SEQ_LEN, _epoch_key_sql(_EPP_EPOCH)
    toks = sql_tokenize("text")
    return f"""WITH ord AS (
  SELECT lang AS shard, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang
           ORDER BY {key} ASC, doc_id ASC) AS BIGINT) AS position,
         CAST(len({toks}) AS BIGINT) AS n
  FROM documents),
pos AS (
  SELECT shard, doc_id, position, n,
         CAST(SUM(n) OVER (PARTITION BY shard ORDER BY position
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS e
  FROM ord WHERE n > 0),
spans AS (SELECT shard, doc_id, position, e - n AS s, e FROM pos),
ex AS (
  SELECT shard, doc_id, position, s, e,
         unnest(generate_series(s // {L}, (e - 1) // {L})) AS bin_id
  FROM spans)
SELECT shard, CAST(bin_id AS BIGINT) AS bin_id, doc_id, position,
  CAST(greatest(s, bin_id * {L}) - s AS BIGINT) AS doc_offset,
  CAST(greatest(s, bin_id * {L}) - bin_id * {L} AS BIGINT) AS bin_offset,
  CAST(least(e, (bin_id + 1) * {L}) - greatest(s, bin_id * {L}) AS BIGINT)
    AS take_tokens
FROM ex"""


QUERIES = {
    "bpe_merges_topk": (_q_bpe_merges, _sql_bpe_merges()),
    "bpe_tokenize_counts": (_q_bpe_token_counts, _sql_bpe_token_counts()),
    "bpe_hybrid_merges": (_q_bpe_hybrid_merges, _sql_bpe_merges()),
    "bpe_hybrid_train_k2000": (_q_bpe_hybrid_prod, None),
    "bpe_saved_tokenize_counts": (_q_bpe_saved_counts,
                                  _sql_bpe_token_counts()),
    "bpe_hf_import_counts": (_q_bpe_hf_import_counts,
                             _sql_bpe_token_counts()),
    "bpe_facade_tokenize_counts": (_q_bpe_facade_counts,
                                   _sql_bpe_token_counts()),
    "epoch_shuffle_order": (_q_epoch_shuffle, _sql_epoch_shuffle()),
    "epoch_pack_spans": (_q_epoch_pack, _sql_epoch_pack()),
}
