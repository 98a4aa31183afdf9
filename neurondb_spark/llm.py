"""HTTP LLM/embedding/rerank provider tier (SURVEY §2.7).

Reference: embed_text and friends call configured HTTP providers —
OpenAI-compatible, Ollama, HuggingFace-style — and fall back to the
deterministic hash embedding when no provider/key is configured
(NeuronDB/src/ml/embeddings.c:332-438); completion routing lives in
src/llm/llm_router.c:211+, provider-backed reranking in
src/ml/reranking.c:320-751 with the lexical fallback tier.

Spark-first mapping:
- Configuration is the Spark conf namespace ``spark.neurondb.llm.*`` —
  resolved ONCE on the driver into a plain :class:`LLMConfig` that the
  Arrow-batched UDFs close over (executors never read the conf).
- ``embed_text_auto`` routes: provider configured → HTTP, else the
  deterministic hash fallback (functions/embed.py) — the exact
  no-API-key behavior of the reference, which is also what keeps the
  driver's correctness gate hermetic (the gate never sets a provider).
- HTTP calls happen INSIDE mapInPandas/pandas_udf workers: one request
  per ``batch_size`` texts, so a 1000-executor cluster fans requests out
  with no driver bottleneck and no per-row connection churn. stdlib
  urllib only — no extra dependency on the workers.

Wire formats (minimal, provider-shape only):
- ``openai``: POST {endpoint}/v1/embeddings {"model", "input": [...]}
  → data[i].embedding; POST /v1/chat/completions for completions;
  POST /v1/rerank (Cohere/Jina-shape) {"query", "documents": [...]}
  → results[].relevance_score.
- ``ollama``: POST {endpoint}/api/embed {"model", "input": [...]}
  → embeddings; POST /api/generate {"model", "prompt", "stream": false}
  → response. (No rerank endpoint — rerank falls back to lexical.)

- ``onnx`` (local-model tier, embeddings.c local dispatch +
  neurondb_tokenizer.c): ``model_path`` names an ONNX encoder; the
  session is created lazily inside each executor python worker and
  cached per-process. Optional ``vocab_path`` enables real wordpiece;
  otherwise the deterministic hash-vocab fallback tokenizer runs (the
  reference tokenizer's no-vocab behavior). onnxruntime is optional —
  absent → strict RuntimeError.

Failure contract: a configured-but-unreachable provider raises after
``retries`` attempts (strict, like the multimodal codecs) — silent
fallback would let a misconfigured 100-TB embed job burn a cluster-day
producing hash vectors nobody asked for.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from dataclasses import dataclass

import pandas as pd  # noqa: F401  (resolves pandas_udf type hints)

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CONF_PREFIX = "spark.neurondb.llm."


@dataclass(frozen=True)
class LLMConfig:
    provider: str = "none"  # none | openai | ollama | onnx
    endpoint: str = ""
    api_key: str = ""
    model: str = ""
    timeout_s: float = 30.0
    batch_size: int = 32
    retries: int = 1
    # local-model (onnx) tier only:
    model_path: str = ""
    vocab_path: str = ""
    max_tokens: int = 128

    @property
    def enabled(self) -> bool:
        if self.provider == "onnx":
            return bool(self.model_path)
        return self.provider not in ("", "none") and bool(self.endpoint)


def llm_config(spark: SparkSession) -> LLMConfig:
    """Resolve ``spark.neurondb.llm.*`` once, driver-side."""
    def g(key: str, default: str) -> str:
        return spark.conf.get(CONF_PREFIX + key, default)

    return LLMConfig(
        provider=g("provider", "none").lower(),
        endpoint=g("endpoint", "").rstrip("/"),
        api_key=g("api_key", ""),
        model=g("model", ""),
        timeout_s=float(g("timeout_s", "30")),
        batch_size=max(1, int(g("batch_size", "32"))),
        retries=int(g("retries", "1")),
        model_path=g("model_path", ""),
        vocab_path=g("vocab_path", ""),
        max_tokens=max(8, int(g("max_tokens", "128"))),
    )


def _post_json(url: str, payload: dict, cfg: LLMConfig) -> dict:
    """POST with retry — runs inside executor workers; keep it stdlib."""
    body = json.dumps(payload).encode("utf-8")
    headers = {"Content-Type": "application/json"}
    if cfg.api_key:
        headers["Authorization"] = f"Bearer {cfg.api_key}"
    last: Exception | None = None
    detail = ""
    for _ in range(cfg.retries + 1):
        try:
            req = urllib.request.Request(url, data=body, headers=headers)
            with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            try:
                detail = e.read().decode("utf-8", "replace")[:500]
            except Exception:
                detail = ""
            # 4xx = caller error (bad key/model/payload): retrying burns
            # retries×timeout per Arrow batch on every executor for the
            # same deterministic answer — fail fast with the server body.
            if 400 <= e.code < 500:
                raise RuntimeError(
                    f"neurondb: llm provider {cfg.provider!r} request to "
                    f"{url} rejected with HTTP {e.code}: {detail}"
                ) from e
            last = e
        except (urllib.error.URLError, OSError, ValueError) as e:
            last = e
    raise RuntimeError(
        f"neurondb: llm provider {cfg.provider!r} request to {url} failed "
        f"after {cfg.retries + 1} attempts: {last}"
        + (f" (last response body: {detail})" if detail else "")
    )


# ----------------------------------------------------- local ONNX tier
#
# Reference: embeddings.c:332-438 dispatches embed_text to a LOCAL model
# path as well as HTTP providers; the tokenizer lives in
# src/onnx/neurondb_tokenizer.c (wordpiece with a basic fallback when no
# vocab is loaded). Spark mapping: the ONNX session is created lazily
# INSIDE each executor's python worker and cached per-process keyed by
# model path — a 1000-executor cluster opens one session per worker, the
# driver never deserializes the model, and Arrow batches amortize the
# run() call exactly like the HTTP tier amortizes requests.
# onnxruntime is an optional dependency: absent → a strict, actionable
# RuntimeError (same failure contract as a configured-but-unreachable
# HTTP provider; silent hash-fallback would mislabel a 100-TB embed run).

_ONNX_SESSIONS: dict[str, object] = {}  # per-python-worker session cache
_VOCABS: dict[str, dict[str, int]] = {}


def _load_vocab(vocab_path: str) -> dict[str, int]:
    vocab = _VOCABS.get(vocab_path)
    if vocab is None:
        with open(vocab_path, encoding="utf-8") as f:
            vocab = {line.rstrip("\n"): i for i, line in enumerate(f)}
        _VOCABS[vocab_path] = vocab
    return vocab


def _wordpiece_ids(word: str, vocab: dict[str, int], unk: int) -> list[int]:
    """Greedy longest-match-first wordpiece (neurondb_tokenizer.c
    semantics): 'playing' → ['play', '##ing']; no match at any position →
    the whole word is UNK."""
    ids: list[int] = []
    start = 0
    while start < len(word):
        end = len(word)
        piece_id = None
        while end > start:
            piece = word[start:end] if start == 0 else "##" + word[start:end]
            if piece in vocab:
                piece_id = vocab[piece]
                break
            end -= 1
        if piece_id is None:
            return [unk]
        ids.append(piece_id)
        start = end
    return ids or [unk]


def tokenize_ids(texts: list[str], cfg: LLMConfig) -> tuple[list[list[int]], list[list[int]]]:
    """Deterministic tokenizer for the local tier: wordpiece over
    ``vocab_path`` when provided, else hash-vocab fallback (djb2 mod 30k,
    offset past the special ids — the no-vocab-loaded behavior of the
    reference tokenizer). Returns (input_ids, attention_mask), padded to
    the batch max and truncated at ``cfg.max_tokens``. CLS=101, SEP=102,
    PAD=0, UNK=100 (BERT-standard ids)."""
    cls_id, sep_id, pad_id, unk_id = 101, 102, 0, 100
    vocab = _load_vocab(cfg.vocab_path) if cfg.vocab_path else None
    all_ids: list[list[int]] = []
    for t in texts:
        words = ("" if t is None else str(t)).lower().split()
        ids = [cls_id]
        for w in words:
            if len(ids) >= cfg.max_tokens - 1:
                break
            if vocab is not None:
                ids.extend(_wordpiece_ids(w, vocab, vocab.get("[UNK]", unk_id)))
            else:
                h = 5381
                for ch in w:
                    h = ((h * 33) + ord(ch)) & 0xFFFFFFFF
                ids.append(1000 + (h % 30000))
        ids = ids[: cfg.max_tokens - 1] + [sep_id]
        all_ids.append(ids)
    width = max(len(i) for i in all_ids) if all_ids else 0
    input_ids = [i + [pad_id] * (width - len(i)) for i in all_ids]
    attention = [[1] * len(i) + [0] * (width - len(i)) for i in all_ids]
    return input_ids, attention


def _onnx_session(model_path: str):
    sess = _ONNX_SESSIONS.get(model_path)
    if sess is None:
        try:
            import onnxruntime as ort
        except ImportError as e:
            raise RuntimeError(
                "neurondb: llm provider 'onnx' requires the onnxruntime "
                "package on every executor (pip install onnxruntime); "
                f"cannot load {model_path!r}"
            ) from e
        sess = ort.InferenceSession(
            model_path, providers=["CPUExecutionProvider"]
        )
        _ONNX_SESSIONS[model_path] = sess
    return sess


def _onnx_embed_batch(texts: list[str], cfg: LLMConfig) -> list[list[float]]:
    """Run the local encoder: hidden states mean-pooled under the
    attention mask then L2-normalized (the standard sentence-embedding
    readout, matching the reference's pooled-output path)."""
    import numpy as np

    sess = _onnx_session(cfg.model_path)
    input_ids, attention = tokenize_ids(texts, cfg)
    ids_arr = np.asarray(input_ids, dtype=np.int64)
    mask_arr = np.asarray(attention, dtype=np.int64)
    feeds = {}
    for inp in sess.get_inputs():
        if "mask" in inp.name:
            feeds[inp.name] = mask_arr
        elif "type" in inp.name:
            feeds[inp.name] = np.zeros_like(ids_arr)
        else:
            feeds[inp.name] = ids_arr
    out = np.asarray(sess.run(None, feeds)[0], dtype=np.float64)
    if out.ndim == 3:  # (B, T, H) token states → masked mean-pool
        m = mask_arr[:, :, None].astype(np.float64)
        out = (out * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1.0)
    norms = np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
    return (out / norms).tolist()


def _embed_batch(texts: list[str], cfg: LLMConfig) -> list[list[float]]:
    if cfg.provider == "onnx":
        return _onnx_embed_batch(texts, cfg)
    if cfg.provider == "openai":
        out = _post_json(
            f"{cfg.endpoint}/v1/embeddings",
            {"model": cfg.model, "input": texts}, cfg,
        )
        data = sorted(out["data"], key=lambda d: d.get("index", 0))
        return [[float(x) for x in d["embedding"]] for d in data]
    if cfg.provider == "ollama":
        out = _post_json(
            f"{cfg.endpoint}/api/embed",
            {"model": cfg.model, "input": texts}, cfg,
        )
        return [[float(x) for x in e] for e in out["embeddings"]]
    raise ValueError(f"neurondb: unknown llm provider {cfg.provider!r}")


def _complete_one(prompt: str, cfg: LLMConfig) -> str:
    if cfg.provider == "openai":
        out = _post_json(
            f"{cfg.endpoint}/v1/chat/completions",
            {"model": cfg.model,
             "messages": [{"role": "user", "content": prompt}]}, cfg,
        )
        return out["choices"][0]["message"]["content"]
    if cfg.provider == "ollama":
        out = _post_json(
            f"{cfg.endpoint}/api/generate",
            {"model": cfg.model, "prompt": prompt, "stream": False}, cfg,
        )
        return out["response"]
    raise ValueError(f"neurondb: unknown llm provider {cfg.provider!r}")


def _rerank_batch(query: str, docs: list[str], cfg: LLMConfig) -> list[float]:
    if cfg.provider == "openai":  # Cohere/Jina-shape rerank endpoint
        out = _post_json(
            f"{cfg.endpoint}/v1/rerank",
            {"model": cfg.model, "query": query, "documents": docs}, cfg,
        )
        scores = [0.0] * len(docs)
        for r in out["results"]:
            scores[int(r["index"])] = float(r["relevance_score"])
        return scores
    raise ValueError(
        f"neurondb: provider {cfg.provider!r} has no rerank endpoint"
    )


# ------------------------------------------------------------- operators


def embed_text_http(
    df: DataFrame, text_col: str, out_col: str = "embedding",
    cfg: LLMConfig | None = None,
) -> DataFrame:
    """Provider-backed corpus embedding: Arrow-batched pandas UDF, one
    HTTP request per ``cfg.batch_size`` texts per partition."""
    from pyspark.sql.functions import pandas_udf

    cfg = cfg or llm_config(df.sparkSession)
    if not cfg.enabled:
        raise ValueError(
            "neurondb: no llm provider configured "
            f"(set {CONF_PREFIX}provider and {CONF_PREFIX}endpoint, or "
            f"{CONF_PREFIX}model_path for provider=onnx)"
        )

    @pandas_udf("array<double>")
    def _embed(texts: pd.Series) -> pd.Series:
        vals = ["" if t is None else str(t) for t in texts]
        out: list[list[float]] = []
        for i in range(0, len(vals), cfg.batch_size):
            out.extend(_embed_batch(vals[i:i + cfg.batch_size], cfg))
        return pd.Series(out)

    return df.withColumn(out_col, _embed(F.col(text_col)))


def embed_text_auto(
    df: DataFrame, text_col: str, out_col: str = "embedding",
    dim: int = 384, model: str | None = None,
) -> DataFrame:
    """The reference's embed_text routing (embeddings.c:332-438): HTTP
    provider when configured, deterministic hash fallback otherwise."""
    cfg = llm_config(df.sparkSession)
    if cfg.enabled:
        return embed_text_http(df, text_col, out_col, cfg)
    from neurondb_spark.functions.embed import embed_text

    return embed_text(df, text_col, out_col, dim=dim, model=model)


def llm_complete(
    df: DataFrame, prompt_col: str, out_col: str = "completion",
    cfg: LLMConfig | None = None,
) -> DataFrame:
    """llm_router completion surface (llm_router.c:211+): one completion
    per row. Sequential per batch (providers rate-limit; parallelism
    comes from partitions)."""
    from pyspark.sql.functions import pandas_udf

    cfg = cfg or llm_config(df.sparkSession)
    if not cfg.enabled:
        raise ValueError(
            "neurondb: no llm provider configured "
            f"(set {CONF_PREFIX}provider and {CONF_PREFIX}endpoint, or "
            f"{CONF_PREFIX}model_path for provider=onnx)"
        )

    @pandas_udf("string")
    def _complete(prompts: pd.Series) -> pd.Series:
        return pd.Series(
            [_complete_one("" if p is None else str(p), cfg) for p in prompts]
        )

    return df.withColumn(out_col, _complete(F.col(prompt_col)))


def rerank_llm(
    df: DataFrame, text_col: str, query: str, k: int = 10,
    score_col: str = "rerank_score", tiebreak: tuple = (),
    cfg: LLMConfig | None = None,
) -> DataFrame:
    """Provider-backed rerank (reranking.c:320-751): candidates scored by
    the rerank endpoint in executor-side batches; falls back to the
    deterministic lexical tier when no provider (or a provider with no
    rerank shape) is configured — the reference's exact tiering."""
    from pyspark.sql.functions import pandas_udf

    cfg = cfg or llm_config(df.sparkSession)
    if not cfg.enabled or cfg.provider != "openai":
        from neurondb_spark.operators.rerank import rerank_cross_encoder

        return rerank_cross_encoder(
            df, text_col, query, k=k, score_col=score_col, tiebreak=tiebreak
        )

    @pandas_udf("double")
    def _score(docs: pd.Series) -> pd.Series:
        vals = ["" if d is None else str(d) for d in docs]
        out: list[float] = []
        for i in range(0, len(vals), cfg.batch_size):
            out.extend(_rerank_batch(query, vals[i:i + cfg.batch_size], cfg))
        return pd.Series(out)

    out = df.withColumn(score_col, _score(F.col(text_col)))
    order = [F.col(score_col).desc(), *[F.col(c).asc() for c in tiebreak]]
    return out.orderBy(*order).limit(k)
