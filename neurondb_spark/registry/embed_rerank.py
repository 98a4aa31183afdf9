"""Embedding / reranker / sparse-retrieval queries (SURVEY §2.6-2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from neurondb_spark import oracle as O
from neurondb_spark.functions.embed import (
    hash_embed_expr,
    hash_embed_py,
    sql_hash_embed_cols,
)
from neurondb_spark.functions.text import _py_tokenize, sql_tokenize
from neurondb_spark.operators.rerank import (
    mmr_rerank,
    rerank_cross_encoder,
    rerank_ltr,
)
from neurondb_spark.operators.sparse import build_inverted_index, sparse_search
from neurondb_spark.registry.common import COMPILE_DIM, EMB_DIM, qvec, t

EMBED_DIM_Q = 8
RERANK_QUERY = "fast hash join on big table"
LTR_WEIGHTS = [0.5, -0.25, 1.5, 0.75]


def _q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    e = hash_embed_expr("text", EMBED_DIM_Q)
    cols = [F.element_at(e, i + 1).alias(f"e{i}") for i in range(EMBED_DIM_Q)]
    return docs.select("doc_id", *cols)


def _sql_hash_embed() -> str:
    cols = sql_hash_embed_cols("text", EMBED_DIM_Q)
    sel = ", ".join(f"{c} AS e{i}" for i, c in enumerate(cols))
    return f"SELECT doc_id, {sel} FROM documents WHERE doc_id <= 100"


def _q_rag_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG retrieval: deterministic query embedding (djb2) → cosine kNN
    over the embeddings corpus, joined back to document text metadata."""
    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    qv = hash_embed_py(RERANK_QUERY, EMB_DIM)
    from neurondb_spark.operators.knn import knn

    top = knn(emb, "embedding", qv, k=8, metric="cosine", dim=COMPILE_DIM, tiebreak=["vec_id"])
    return top.join(F.broadcast(docs), top.vec_id == docs.doc_id).select(
        "vec_id", "lang", "source", "distance"
    )


def _sql_rag_query() -> str:
    qv = hash_embed_py(RERANK_QUERY, EMB_DIM)
    lit = "[" + ", ".join(repr(x) for x in qv) + "]"
    d = O.sql_cosine_distance("e.embedding", "q.qe", EMB_DIM)
    return f"""WITH q AS (SELECT {lit}::DOUBLE[] AS qe),
top AS (
  SELECT e.vec_id, {d} AS distance
  FROM embeddings e CROSS JOIN q
  ORDER BY distance ASC, e.vec_id ASC LIMIT 8)
SELECT top.vec_id, d.lang, d.source, top.distance
FROM top JOIN documents d ON top.vec_id = d.doc_id"""


def _q_rag_ingest_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG ingest + retrieve in ONE plan (round 11): chunk
    the documents (120 chars, 20 overlap — the chunk_documents gate
    shape), hash-embed every chunk to 16-d, cosine top-10 against the
    embedded query, return (doc_id, chunk_idx, distance). This is the
    composition a RAG system actually runs at ingest+query time; each
    stage is individually gated (chunk_documents / hash_embed /
    rag_query) and this row proves they COMPOSE exactly. The whole
    chain is Column expressions — chunking, embedding and distance all
    inside one whole-stage-codegen'd scan + TakeOrdered; nothing
    materializes between stages. ASCII-safe id range (doc_id ≤ 50, the
    bound the hash-embed oracle covers)."""
    from neurondb_spark.functions.embed import hash_embed_expr
    from neurondb_spark.functions.text import chunk_text
    from neurondb_spark.operators.knn import knn

    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 50)
    ch = chunk_text("text", 120, 20)
    chunks = docs.select(
        "doc_id", F.posexplode(ch).alias("chunk_idx0", "chunk")
    ).select(
        "doc_id",
        (F.col("chunk_idx0") + 1).cast("int").alias("chunk_idx"),
        hash_embed_expr("chunk", 16).alias("cemb"),
    )
    qv = hash_embed_py(RERANK_QUERY, 16)
    top = knn(
        chunks, "cemb", qv, k=10, metric="cosine", dim=16,
        tiebreak=["doc_id", "chunk_idx"],
    )
    return top.select("doc_id", "chunk_idx", "distance")


def _sql_rag_ingest_e2e() -> str:
    qv = hash_embed_py(RERANK_QUERY, 16)
    qlit = "[" + ", ".join(repr(x) for x in qv) + "]"
    ecols = sql_hash_embed_cols("chunk", 16)
    arr = "[" + ", ".join(ecols) + "]"
    d = O.sql_cosine_distance("c.cemb", "q.qe", 16)
    return f"""WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), 100)) AS s
  FROM documents WHERE doc_id <= 50),
chunks AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s)
              AS INTEGER) AS chunk_idx,
         substr(text, s, 120) AS chunk
  FROM starts),
cemb AS (
  SELECT doc_id, chunk_idx, {arr}::DOUBLE[] AS cemb FROM chunks),
q AS (SELECT {qlit}::DOUBLE[] AS qe)
SELECT c.doc_id, c.chunk_idx, {d} AS distance
FROM cemb c CROSS JOIN q
ORDER BY distance ASC, c.doc_id ASC, c.chunk_idx ASC
LIMIT 10"""


def _q_rerank_lexical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return rerank_cross_encoder(
        docs, "text", RERANK_QUERY, k=15, tiebreak=["doc_id"]
    ).select("doc_id", "rerank_score")


def _sql_rerank_lexical() -> str:
    toks = sql_tokenize("text")
    qtok = []
    for tk in _py_tokenize(RERANK_QUERY):
        if tk not in qtok:
            qtok.append(tk)
    hits = " + ".join(
        f"(CASE WHEN list_contains({toks}, '{tk}') THEN 1.0 ELSE 0.0 END)"
        for tk in qtok
    )
    return f"""SELECT doc_id, ({hits}) / {float(len(qtok))!r} AS rerank_score
FROM documents ORDER BY rerank_score DESC, doc_id ASC LIMIT 15"""


def _q_ltr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return rerank_ltr(
        emb, "embedding", LTR_WEIGHTS, k=15, tiebreak=["vec_id"]
    ).select("vec_id", "ltr_score")


def _sql_ltr() -> str:
    terms = " + ".join(
        f"({O.elem('embedding', i + 1)}) * ({float(w)!r})"
        for i, w in enumerate(LTR_WEIGHTS)
    )
    return f"""SELECT vec_id, ({terms}) AS ltr_score
FROM embeddings ORDER BY ltr_score DESC, vec_id ASC LIMIT 15"""


def _q_sparse_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    inv = build_inverted_index(docs, "text", "doc_id")
    return sparse_search(inv, RERANK_QUERY, "doc_id", k=10)


def _sql_sparse_search() -> str:
    qtok = []
    for tk in _py_tokenize(RERANK_QUERY):
        if tk not in qtok:
            qtok.append(tk)
    inlist = ", ".join(f"'{tk}'" for tk in qtok)
    return f"""WITH ex AS (
  SELECT doc_id, unnest({sql_tokenize('text')}) AS term FROM documents),
postings AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM ex GROUP BY term, doc_id)
SELECT doc_id, SUM(CAST(tf AS DOUBLE) * 1.0) AS sparse_score
FROM postings WHERE term IN ({inlist})
GROUP BY doc_id ORDER BY sparse_score DESC, doc_id ASC LIMIT 10"""


def _q_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity rerank (driver-side greedy over a bounded candidate
    set — sequential by nature, ml_mmr.c:75). Deterministic (score DESC,
    id ASC argmax per step), so the greedy loop is SQL-expressible as a
    one-row-per-iteration recursive CTE — see _sql_mmr."""
    emb = t(spark, sf_dir, "embeddings")
    q = qvec(spark, sf_dir)
    from neurondb_spark.operators.knn import knn

    cands = knn(emb, "embedding", q, k=50, metric="cosine", dim=COMPILE_DIM, tiebreak=["vec_id"])
    sel = mmr_rerank(cands, "embedding", "vec_id", q, lam=0.7, k=10)
    return spark.createDataFrame(
        [(i + 1, int(v)) for i, v in enumerate(sel)], "mmr_rank int, vec_id bigint"
    )


def _sql_mmr() -> str:
    """Greedy MMR as a recursive CTE: the working table carries the
    selected-id list; each iteration appends the (score DESC, id ASC)
    argmax where score = λ·sim(q,c) − (1−λ)·max_{j∈S} sim(c,j). Float
    parity with operators/rerank.py:mmr_rerank holds because every
    sum is the same left-assoc chain and IEEE multiply is commutative
    (Python computes norm(q)·norm(v), SQL norm(v)·norm(q))."""
    cs_q = O.sql_cosine_similarity("e.embedding", "q.qe", EMB_DIM)
    cd_q = O.sql_cosine_distance("e.embedding", "q.qe", EMB_DIM)
    cs_ab = O.sql_cosine_similarity("a.embedding", "b.embedding", EMB_DIM)
    score = """(0.7 * c.qsim - (1.0 - 0.7) * COALESCE((SELECT MAX(p.s) FROM ps p
              WHERE p.ia = c.vec_id AND list_contains(s.sel_ids, p.ib)), 0.0))"""
    return f"""WITH RECURSIVE q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 1),
cand AS (
  SELECT e.vec_id, e.embedding, {cs_q} AS qsim
  FROM embeddings e CROSS JOIN q
  ORDER BY {cd_q} ASC, e.vec_id ASC LIMIT 50),
ps AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {cs_ab} AS s
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
sel AS (
  SELECT 1 AS mmr_rank,
         first(vec_id ORDER BY 0.7 * qsim DESC, vec_id ASC) AS vec_id,
         [first(vec_id ORDER BY 0.7 * qsim DESC, vec_id ASC)] AS sel_ids
  FROM cand
  UNION ALL
  SELECT s.mmr_rank + 1,
         first(c.vec_id ORDER BY {score} DESC, c.vec_id ASC) AS vec_id,
         list_append(s.sel_ids,
           first(c.vec_id ORDER BY {score} DESC, c.vec_id ASC)) AS sel_ids
  FROM sel s JOIN cand c ON NOT list_contains(s.sel_ids, c.vec_id)
  WHERE s.mmr_rank < 10
  GROUP BY s.mmr_rank, s.sel_ids
)
SELECT CAST(mmr_rank AS INT) AS mmr_rank, vec_id FROM sel ORDER BY mmr_rank"""


def _q_embed_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embed_cached (embeddings.c:1104-1123): text-keyed cache join —
    hits keep the cached embedding untouched, misses run the hash
    embedder, union back. Cache = even doc_ids ≤ 100 with a sentinel
    embedding derived from the MIN doc_id per text (duplicate texts
    collapse, so the join stays 1:1); the oracle reproduces the exact
    hit/miss routing including cross-doc text matches."""
    from neurondb_spark.functions.embed import embed_cached

    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    sentinel = F.array(*[
        (F.col("_cid").cast("double") + F.lit(float(i)))
        for i in range(EMBED_DIM_Q)
    ])
    cache = (
        docs.where(F.col("doc_id") % 2 == 0)
        .groupBy("text").agg(F.min("doc_id").alias("_cid"))
        .select("text", sentinel.alias("embedding"))
    )
    out = embed_cached(docs.select("doc_id", "text"), cache, "text",
                       out_col="embedding", dim=EMBED_DIM_Q)
    cols = [F.element_at("embedding", i + 1).alias(f"e{i}")
            for i in range(EMBED_DIM_Q)]
    return out.select("doc_id", *cols)


def _sql_embed_cached() -> str:
    hcols = sql_hash_embed_cols("d.text", EMBED_DIM_Q)
    cid = ("(SELECT MIN(d2.doc_id) FROM documents d2 "
           "WHERE d2.doc_id <= 100 AND d2.doc_id % 2 = 0 "
           "AND d2.text = d.text)")
    sel = ", ".join(
        f"(CASE WHEN {cid} IS NOT NULL THEN CAST({cid} AS DOUBLE) + {float(i)!r} "
        f"ELSE {c} END) AS e{i}"
        for i, c in enumerate(hcols)
    )
    return f"SELECT d.doc_id, {sel} FROM documents d WHERE d.doc_id <= 100"


def _q_text_sim_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_similarity_semantic (ml_nlp_production.c): cosine of the
    16-d hash embeddings of two texts — doc i paired with doc i+50 over
    the ASCII-safe id range the hash_embed oracle already covers."""
    from neurondb_spark.functions.nlp import text_similarity_semantic

    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") <= 100)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = docs.select((F.col("doc_id") - 50).alias("id_a"),
                    F.col("text").alias("tb"))
    pairs = a.join(b, "id_a").where(F.col("id_a") <= 50)
    return pairs.select(
        "id_a", (F.col("id_a") + 50).alias("id_b"),
        text_similarity_semantic("ta", "tb", dim=16).alias("semantic_sim"),
    )


def _sql_text_sim_semantic() -> str:
    cols = sql_hash_embed_cols("text", 16)
    sel = ", ".join(f"{c} AS e{i}" for i, c in enumerate(cols))
    dot = " + ".join(f"(a.e{i}) * (b.e{i})" for i in range(16))
    na = " + ".join(f"(a.e{i}) * (a.e{i})" for i in range(16))
    nb = " + ".join(f"(b.e{i}) * (b.e{i})" for i in range(16))
    return f"""WITH emb AS (
  SELECT doc_id, {sel} FROM documents WHERE doc_id <= 100)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       ({dot}) / (sqrt({na}) * sqrt({nb})) AS semantic_sim
FROM emb a JOIN emb b ON b.doc_id = a.doc_id + 50
WHERE a.doc_id <= 50"""


QUERIES = {
    "text_similarity_semantic": (_q_text_sim_semantic, _sql_text_sim_semantic()),
    "embed_cached": (_q_embed_cached, _sql_embed_cached()),
    "hash_embed": (_q_hash_embed, _sql_hash_embed()),
    "rag_query": (_q_rag_query, _sql_rag_query()),
    "rag_ingest_e2e": (_q_rag_ingest_e2e, _sql_rag_ingest_e2e()),
    "rerank_lexical": (_q_rerank_lexical, _sql_rerank_lexical()),
    "ltr_rerank": (_q_ltr, _sql_ltr()),
    "sparse_search_tf": (_q_sparse_search, _sql_sparse_search()),
    "mmr_rerank": (_q_mmr, _sql_mmr()),
}
