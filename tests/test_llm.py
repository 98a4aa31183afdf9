"""HTTP LLM provider tier (neurondb_spark/llm.py) against an in-process
deterministic mock server — proves the Spark-side plumbing (config
resolution, Arrow batching, request shapes, fallback routing) without any
external dependency. Reference behavior: embeddings.c:332-438 (provider
call + hash fallback), llm_router.c:211+ (completion), reranking.c:320-751
(provider rerank + lexical tier)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest
from pyspark.sql import functions as F

from neurondb_spark.llm import (
    CONF_PREFIX,
    LLMConfig,
    embed_text_auto,
    embed_text_http,
    llm_complete,
    llm_config,
    rerank_llm,
)


def _mock_embedding(text: str) -> list[float]:
    return [float(len(text)), float(ord(text[0]) if text else 0), 7.0]


class _Handler(BaseHTTPRequestHandler):
    calls: list[tuple[str, dict]] = []

    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        n = int(self.headers["Content-Length"])
        payload = json.loads(self.rfile.read(n))
        type(self).calls.append((self.path, payload))
        if self.path == "/v1/embeddings":
            out = {"data": [
                {"index": i, "embedding": _mock_embedding(t)}
                for i, t in enumerate(payload["input"])
            ]}
        elif self.path == "/api/embed":
            out = {"embeddings": [_mock_embedding(t) for t in payload["input"]]}
        elif self.path == "/v1/chat/completions":
            out = {"choices": [{"message": {
                "content": "echo:" + payload["messages"][0]["content"]}}]}
        elif self.path == "/api/generate":
            out = {"response": "gen:" + payload["prompt"]}
        elif self.path == "/v1/rerank":
            out = {"results": [
                {"index": i, "relevance_score": float(len(d))}
                for i, d in enumerate(payload["documents"])
            ]}
        else:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps(out).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


@pytest.fixture()
def llm_conf(spark, server):
    spark.conf.set(CONF_PREFIX + "provider", "openai")
    spark.conf.set(CONF_PREFIX + "endpoint", server)
    spark.conf.set(CONF_PREFIX + "model", "test-model")
    spark.conf.set(CONF_PREFIX + "batch_size", "4")
    yield
    for k in ("provider", "endpoint", "model", "batch_size"):
        spark.conf.unset(CONF_PREFIX + k)


def _texts_df(spark, n=10):
    return spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(n)], ["id", "text"]
    ).repartition(2)


def test_config_resolution(spark, llm_conf):
    cfg = llm_config(spark)
    assert cfg.enabled and cfg.provider == "openai"
    assert cfg.batch_size == 4 and cfg.model == "test-model"


def test_config_default_disabled(spark):
    assert not llm_config(spark).enabled


def test_embed_http_openai(spark, llm_conf):
    rows = embed_text_http(_texts_df(spark), "text").orderBy("id").collect()
    assert [r["embedding"] for r in rows] == [
        _mock_embedding(f"doc number {i}") for i in range(10)
    ]


def test_embed_http_ollama(spark, server):
    cfg = LLMConfig(provider="ollama", endpoint=server, model="m", batch_size=3)
    rows = embed_text_http(_texts_df(spark, 5), "text", cfg=cfg).orderBy("id").collect()
    assert rows[2]["embedding"] == _mock_embedding("doc number 2")


def test_embed_batching(spark, server):
    _Handler.calls.clear()
    cfg = LLMConfig(provider="openai", endpoint=server, model="m", batch_size=4)
    embed_text_http(_texts_df(spark, 10).coalesce(1), "text", cfg=cfg).collect()
    embed_calls = [p for p, _ in _Handler.calls if p == "/v1/embeddings"]
    assert len(embed_calls) == 3  # ceil(10/4) on one partition


def test_embed_auto_routes_to_provider(spark, llm_conf):
    out = embed_text_auto(_texts_df(spark, 3), "text").orderBy("id").collect()
    assert out[0]["embedding"] == _mock_embedding("doc number 0")


def test_embed_auto_falls_back_to_hash(spark):
    from neurondb_spark.functions.embed import hash_embed_py

    out = embed_text_auto(_texts_df(spark, 3), "text", dim=8).orderBy("id").collect()
    assert out[1]["embedding"] == pytest.approx(hash_embed_py("doc number 1", 8))


def test_complete_openai(spark, llm_conf):
    out = llm_complete(
        _texts_df(spark, 3).select("id", F.col("text").alias("prompt")), "prompt"
    ).orderBy("id").collect()
    assert out[0]["completion"] == "echo:doc number 0"


def test_complete_requires_provider(spark):
    with pytest.raises(ValueError, match="no llm provider"):
        llm_complete(_texts_df(spark, 1), "text")


def test_rerank_provider(spark, llm_conf):
    df = spark.createDataFrame(
        [(1, "short"), (2, "a much longer document"), (3, "mid text")],
        ["id", "text"],
    )
    out = rerank_llm(df, "text", "q", k=2, tiebreak=("id",)).collect()
    # mock scores by length → longest first
    assert [r["id"] for r in out] == [2, 3]


def test_rerank_fallback_lexical(spark):
    df = spark.createDataFrame(
        [(1, "hash join plan"), (2, "unrelated words")], ["id", "text"]
    )
    out = rerank_llm(df, "text", "hash join", k=2, tiebreak=("id",)).collect()
    assert [r["id"] for r in out] == [1, 2]
    assert out[0]["rerank_score"] == pytest.approx(1.0)


def test_unreachable_provider_raises(spark):
    cfg = LLMConfig(provider="openai", endpoint="http://127.0.0.1:9",
                    model="m", timeout_s=0.5, retries=0)
    with pytest.raises(Exception, match="failed"):
        embed_text_http(_texts_df(spark, 2), "text", cfg=cfg).collect()
