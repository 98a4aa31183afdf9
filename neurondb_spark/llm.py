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
    provider: str = "none"  # none | openai | ollama
    endpoint: str = ""
    api_key: str = ""
    model: str = ""
    timeout_s: float = 30.0
    batch_size: int = 32
    retries: int = 1

    @property
    def enabled(self) -> bool:
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
    )


def _post_json(url: str, payload: dict, cfg: LLMConfig) -> dict:
    """POST with retry — runs inside executor workers; keep it stdlib."""
    body = json.dumps(payload).encode("utf-8")
    headers = {"Content-Type": "application/json"}
    if cfg.api_key:
        headers["Authorization"] = f"Bearer {cfg.api_key}"
    last: Exception | None = None
    for _ in range(cfg.retries + 1):
        try:
            req = urllib.request.Request(url, data=body, headers=headers)
            with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except (urllib.error.URLError, OSError, ValueError) as e:
            last = e
    raise RuntimeError(
        f"neurondb: llm provider {cfg.provider!r} request to {url} failed "
        f"after {cfg.retries + 1} attempts: {last}"
    )


def _embed_batch(texts: list[str], cfg: LLMConfig) -> list[list[float]]:
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
            f"(set {CONF_PREFIX}provider and {CONF_PREFIX}endpoint)"
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
            f"(set {CONF_PREFIX}provider and {CONF_PREFIX}endpoint)"
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
