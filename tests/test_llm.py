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


# ----------------------------------------------------- local ONNX tier


def test_http_4xx_fails_fast(spark, server):
    # 4xx is a caller error: no retry burn, server status surfaced.
    cfg = LLMConfig(provider="openai", endpoint=server + "/nope",
                    model="m", timeout_s=2.0, retries=3)
    from neurondb_spark.llm import _post_json

    with pytest.raises(RuntimeError, match="rejected with HTTP 404"):
        _post_json(cfg.endpoint + "/v1/embeddings", {"input": []}, cfg)


def test_wordpiece_greedy_longest_match(tmp_path):
    from neurondb_spark.llm import _wordpiece_ids

    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "play", "##ing", "##er", "p", "##lay"]
    )}
    assert _wordpiece_ids("playing", vocab, 1) == [2, 3]
    assert _wordpiece_ids("player", vocab, 1) == [2, 4]
    assert _wordpiece_ids("play", vocab, 1) == [2]
    # no match anywhere -> whole word UNK
    assert _wordpiece_ids("zzz", vocab, 1) == [1]


def test_tokenize_ids_vocab_and_fallback(tmp_path):
    from neurondb_spark.llm import tokenize_ids

    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(["[PAD]", "[UNK]", "hello", "world", "##s"]) + "\n")
    cfg = LLMConfig(provider="onnx", model_path="m.onnx",
                    vocab_path=str(vp), max_tokens=16)
    ids, mask = tokenize_ids(["hello worlds", "hello"], cfg)
    # CLS + pieces + SEP, padded to batch width; mask marks real tokens
    assert ids[0] == [101, 2, 3, 4, 102]
    assert ids[1] == [101, 2, 102, 0, 0]
    assert mask[0] == [1, 1, 1, 1, 1] and mask[1] == [1, 1, 1, 0, 0]
    # hash-vocab fallback: deterministic, respects truncation
    cfg2 = LLMConfig(provider="onnx", model_path="m.onnx", max_tokens=8)
    a1, _ = tokenize_ids(["one two three four five six seven eight"], cfg2)
    a2, _ = tokenize_ids(["one two three four five six seven eight"], cfg2)
    assert a1 == a2 and len(a1[0]) == 8 and a1[0][-1] == 102


def test_onnx_embed_batch_pooling(monkeypatch):
    """Full local-tier readout against a fake session: token states are a
    deterministic function of input ids, so masked mean-pool + L2 norm is
    checkable by hand — proves feeds construction, pooling and caching
    without onnxruntime."""
    import numpy as np

    from neurondb_spark import llm as L

    class _Inp:
        def __init__(self, name):
            self.name = name

    class _FakeSession:
        runs = 0

        def get_inputs(self):
            return [_Inp("input_ids"), _Inp("attention_mask"),
                    _Inp("token_type_ids")]

        def run(self, _, feeds):
            type(self).runs += 1
            ids = feeds["input_ids"]
            # hidden state = [id, 2*id] per token -> (B, T, 2)
            h = np.stack([ids, 2 * ids], axis=2).astype(np.float64)
            return [h]

    cfg = LLMConfig(provider="onnx", model_path="/fake/model.onnx",
                    max_tokens=16)
    monkeypatch.setitem(L._ONNX_SESSIONS, "/fake/model.onnx", _FakeSession())
    out = L._onnx_embed_batch(["a b", "a"], cfg)
    ids, mask = L.tokenize_ids(["a b", "a"], cfg)
    for vec, row_ids, row_mask in zip(out, ids, mask):
        real = [i for i, m in zip(row_ids, row_mask) if m]
        mean = sum(real) / len(real)
        exp = np.array([mean, 2 * mean])
        exp = exp / np.linalg.norm(exp)
        assert vec == pytest.approx(exp.tolist())


def test_onnx_missing_runtime_strict(spark):
    """onnxruntime is not installed in this container: the configured
    local tier must raise the actionable error (never hash-fallback),
    end-to-end through the executor python worker."""
    try:
        import onnxruntime  # noqa: F401

        pytest.skip("onnxruntime installed; strict-missing path not testable")
    except ImportError:
        pass
    cfg = LLMConfig(provider="onnx", model_path="/tmp/none.onnx")
    assert cfg.enabled
    with pytest.raises(Exception, match="onnxruntime"):
        embed_text_http(_texts_df(spark, 2), "text", cfg=cfg).collect()
