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

    def _token_vec(self, token: str) -> np.ndarray:
        h = hashlib.md5(f"{self.seed}:{token}".encode()).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        v = rng.standard_normal(self.dims)
        return v / np.linalg.norm(v)

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
