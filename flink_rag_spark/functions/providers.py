"""Pluggable embedding / chat providers.

The reference hits OpenAI synchronously once per record from inside a Flink
``map`` (embed: ``RAG.java:47``, ``StreamingStoreKnowledge.java:94``; chat:
``RAG.java:95``) and even rebuilds the clients per record on the query path
(``RAG.java:31-44,87-94``). The engine replaces that with Arrow-batched
``mapInPandas``/pandas-UDF providers constructed ONCE PER PARTITION (the
analog of Flink's ``RichMapFunction.open``, ``StreamingStoreKnowledge.java:86-89``)
and called once per BATCH, not per row.

Default providers are deterministic and local (FIXTURES.md §C): a seeded
hash-projection embedder and a template-echo chat model, so the whole RAG
path is machine-checkable without network. A real HTTP provider implements
the same two-method interface.
"""

from __future__ import annotations

import hashlib
import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig


class Provider:
    """Interface: batch-in, batch-out. Implementations must be picklable so
    executors can construct them per partition."""

    def embed_batch(self, texts: "pd.Series") -> "pd.Series":  # -> Series[list[float]]
        raise NotImplementedError

    def chat_batch(self, prompts: "pd.Series") -> "pd.Series":  # -> Series[str]
        raise NotImplementedError

    def rerank_batch(self, questions: "pd.Series",
                     texts: "pd.Series") -> "pd.Series":  # -> Series[float]
        """Cross-encoder seam: relevance score per (question, text) pair.
        Batch-in, batch-out like the other two calls."""
        raise NotImplementedError


class LocalDeterministicProvider(Provider):
    """Seeded hash-projection embedder + template-echo chat.

    embed(text): average of per-token pseudo-random unit vectors, where each
    token's vector is seeded from md5(token) — stable across processes,
    partitions, and runs (no PYTHONHASHSEED dependence).
    chat(prompt): echoes a deterministic function of the prompt, mimicking the
    reference chat step's shape (RAG.java:95) without network.
    """

    def __init__(self, dims: int = DEFAULT_CONFIG.embedding_dims,
                 seed: int = DEFAULT_CONFIG.seed):
        self.dims = dims
        self.seed = seed
        self._cache: dict[str, np.ndarray] = {}

    def __getstate__(self):
        # the token cache is a pure memo — never ship it to executors
        state = self.__dict__.copy()
        state["_cache"] = {}
        return state

    def _token_vec(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            h = hashlib.md5(f"{self.seed}:{token}".encode()).digest()
            rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
            v = rng.standard_normal(self.dims)
            v /= np.linalg.norm(v)
            if len(self._cache) < 1_000_000:  # bound executor memory
                self._cache[token] = v
        return v

    def embed_one(self, text: str) -> list[float]:
        toks = text.lower().split()
        if not toks:
            v = np.zeros(self.dims)
            v[0] = 1.0
        else:
            v = np.mean([self._token_vec(t) for t in toks], axis=0)
            n = np.linalg.norm(v)
            v = v / n if n > 0 else v
        return [float(x) for x in v]

    def embed_batch(self, texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(self.embed_one)

    def chat_batch(self, prompts: pd.Series) -> pd.Series:
        def answer(p: str) -> str:
            digest = hashlib.md5(p.encode()).hexdigest()[:8]
            return f"[answer:{digest}] {p[:200]}"
        return prompts.fillna("").map(answer)

    def rerank_batch(self, questions: pd.Series,
                     texts: pd.Series) -> pd.Series:
        """Deterministic cross-encoder stand-in: distinct-token overlap
        |q ∩ t| / |q| — an UNROUNDED int/int IEEE division, so the DuckDB
        oracle's len()/len() division produces the bit-identical double
        (rounding here would re-open the banker's-vs-half-away gap; ties
        resolve downstream by first-stage score, then id)."""
        def score(q: str, t: str) -> float:
            qt = set(q.lower().split())
            if not qt:
                return 0.0
            return len(qt & set(t.lower().split())) / len(qt)
        return pd.Series([score(q or "", t or "")
                          for q, t in zip(questions, texts)],
                         index=questions.index, dtype="float64")


class OpenAIHttpProvider(Provider):
    """OpenAI-compatible HTTP provider: batched /embeddings + /chat/completions.

    Mirrors the reference's client semantics — embed model
    ``text-embedding-3-small`` (EmbeddingConfig.java:4), chat model /
    temperature / top_p / max_tokens / 60 s timeout (RAG.java:89-93) — but
    batched and amortized: ONE /embeddings request carries up to
    ``batch_size`` texts, and chat requests fan out over a bounded thread
    pool per Arrow batch, instead of the reference's three synchronous
    round-trips per record inside the hot ``map`` (RAG.java:47-95) with
    clients rebuilt per record (RAG.java:31-44,87-94).

    Executor-safe by construction: instances hold ONLY plain config (fully
    picklable); the API key is read from ``api_key_env`` on the executor at
    call time so credentials never travel inside closures; stdlib urllib
    only, no extra dependencies. Tests drive it against a local fake server
    (tests/test_http_provider.py); the deterministic local provider remains
    the engine-wide default — network use is always explicit opt-in.
    """

    def __init__(self, base_url: str,
                 embed_model: str = "text-embedding-3-small",
                 chat_model: str = "gpt-4.1-mini-2025-04-14",
                 api_key_env: str = "OPENAI_API_KEY",
                 timeout_s: float = 60.0,       # RAG.java:93
                 max_retries: int = 3,
                 batch_size: int = 256,
                 max_concurrency: int = 4,
                 temperature: float = 0.25,     # RAG.java:90
                 top_p: float = 0.9,            # RAG.java:91
                 max_tokens: int = 256,         # RAG.java:92
                 chat_on_error: str = "raise"):
        self.base_url = base_url.rstrip("/")
        self.embed_model = embed_model
        self.chat_model = chat_model
        self.api_key_env = api_key_env
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.batch_size = batch_size
        self.max_concurrency = max_concurrency
        self.temperature = temperature
        self.top_p = top_p
        self.max_tokens = max_tokens
        if chat_on_error not in ("raise", "null"):
            raise ValueError(
                f"chat_on_error must be 'raise' or 'null', got "
                f"{chat_on_error!r}")
        # per-row failure policy for chat: "raise" fails the Spark task
        # (and with it the batch — Spark's retry then re-runs the whole
        # partition); "null" converts a row whose request exhausted its
        # bounded retries (incl. a HUNG upstream, cut by timeout_s per
        # attempt) into a NULL answer so one bad row can't poison a
        # 10k-row Arrow batch. Either way the executor is never wedged:
        # every attempt carries timeout_s, so worst-case wall per row is
        # (max_retries+1) × timeout_s + backoff.
        self.chat_on_error = chat_on_error

    # -- transport -----------------------------------------------------
    def _post(self, path: str, payload: dict) -> dict:
        """POST with bounded exponential-backoff retries.

        Delivery semantics: retrying a timed-out request that the server
        actually completed re-executes it — at-least-once. Harmless for
        /embeddings (idempotent); for /chat/completions it can duplicate a
        paid generation, matching the reference's behavior (its Flink task
        retries replay the whole synchronous call, RAG.java:87-95). Callers
        needing at-most-once chat should set max_retries=0."""
        import json
        import os
        import time
        import urllib.error
        import urllib.request
        body = json.dumps(payload).encode()
        headers = {"Content-Type": "application/json"}
        key = os.environ.get(self.api_key_env)
        if key:
            headers["Authorization"] = f"Bearer {key}"
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            req = urllib.request.Request(self.base_url + path, data=body,
                                         headers=headers, method="POST")
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                    return json.loads(r.read().decode())
            except urllib.error.HTTPError as e:
                last_err = e
                if e.code not in (429, 500, 502, 503, 504):
                    raise  # 4xx other than rate-limit: retrying won't help
            except (urllib.error.URLError, TimeoutError) as e:
                last_err = e
            if attempt < self.max_retries:  # no pointless sleep before raising
                time.sleep(min(0.2 * (2 ** attempt), 2.0))
        raise RuntimeError(
            f"provider request {path} failed after "
            f"{self.max_retries + 1} attempts: {last_err}")

    # -- Provider interface --------------------------------------------
    def embed_batch(self, texts: pd.Series) -> pd.Series:
        vals = texts.fillna("").tolist()
        out: list[list[float]] = []
        for i in range(0, len(vals), self.batch_size):
            chunk = vals[i:i + self.batch_size]
            resp = self._post("/embeddings",
                              {"model": self.embed_model, "input": chunk})
            data = sorted(resp["data"], key=lambda d: d["index"])
            out.extend([d["embedding"] for d in data])
        return pd.Series(out, index=texts.index)

    def chat_batch(self, prompts: pd.Series) -> pd.Series:
        from concurrent.futures import ThreadPoolExecutor
        vals = prompts.fillna("").tolist()

        def one(prompt: str) -> str | None:
            try:
                resp = self._post("/chat/completions", {
                    "model": self.chat_model,
                    "messages": [{"role": "user", "content": prompt}],
                    "temperature": self.temperature,
                    "top_p": self.top_p,
                    "max_tokens": self.max_tokens,
                })
            except Exception:
                if self.chat_on_error == "raise":
                    raise
                return None  # surfaced as a NULL answer for THIS row only
            return resp["choices"][0]["message"]["content"]

        with ThreadPoolExecutor(max_workers=self.max_concurrency) as ex:
            out = list(ex.map(one, vals))
        return pd.Series(out, index=prompts.index)

    def rerank_batch(self, questions: pd.Series,
                     texts: pd.Series) -> pd.Series:
        """Cohere/Jina-style ``/rerank``: one request per distinct
        question carrying that question's candidate documents (the API's
        natural batch unit), scores realigned by the returned indexes.
        Same transport/retry/timeout policy as the other calls."""
        import pandas as _pd
        df = _pd.DataFrame({"q": questions.fillna(""),
                            "t": texts.fillna("")})
        scores = _pd.Series(0.0, index=questions.index, dtype="float64")
        for q, grp in df.groupby("q", sort=False):
            resp = self._post("/rerank", {
                "model": self.chat_model,
                "query": q,
                "documents": grp["t"].tolist(),
            })
            for r in resp["results"]:
                scores.loc[grp.index[r["index"]]] = r["relevance_score"]
        return scores


def embed_text_col(provider: Provider | None = None,
                   cfg: EngineConfig = DEFAULT_CONFIG):
    """Return a pandas UDF column factory: embed_text(col) -> array<float>.

    Arrow-batched (SURVEY.md §2.1 A8 mapping): ~10-100× over row-at-a-time
    Python UDFs; the provider object is shipped once per task, not per row.
    """
    provider = provider or LocalDeterministicProvider(cfg.embedding_dims, cfg.seed)

    @F.pandas_udf("array<float>")
    def _embed(texts: pd.Series) -> pd.Series:
        return provider.embed_batch(texts)

    return _embed


def chat_col(provider: Provider | None = None,
             cfg: EngineConfig = DEFAULT_CONFIG):
    """pandas UDF: chat_answer(prompt) -> string (SURVEY.md §2.1 A11)."""
    provider = provider or LocalDeterministicProvider(cfg.embedding_dims, cfg.seed)

    @F.pandas_udf("string")
    def _chat(prompts: pd.Series) -> pd.Series:
        return provider.chat_batch(prompts)

    return _chat


def embed_documents(df: DataFrame, text_col: str = "text",
                    out_col: str = "embedding",
                    provider: Provider | None = None,
                    cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Attach an embedding column to a document DataFrame (batch analog of
    the reference's ingestion embedder, StreamingStoreKnowledge.java:80-97)."""
    return df.withColumn(out_col, embed_text_col(provider, cfg)(F.col(text_col)))


def rerank_col(provider: Provider | None = None,
               cfg: EngineConfig = DEFAULT_CONFIG):
    """pandas UDF: rerank_score(question, text) -> double — the
    second-stage (cross-encoder) scorer of a retrieve-then-rerank
    pipeline, Arrow-batched with the provider shipped once per task."""
    provider = provider or LocalDeterministicProvider(cfg.embedding_dims,
                                                     cfg.seed)

    @F.pandas_udf("double")
    def _rerank(questions: pd.Series, texts: pd.Series) -> pd.Series:
        return provider.rerank_batch(questions, texts)

    return _rerank
