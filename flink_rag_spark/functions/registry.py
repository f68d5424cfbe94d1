"""SQL-callable function registry — the engine's user-extensibility surface.

The reference hardcodes its two scalar functions (embed: ``RAG.java:47``,
chat: ``RAG.java:95``) inside job code; here they are registered into the
session catalog so ``spark.sql`` queries can call them like built-ins, plus a
pure-SQL cosine and a UDTF. Registration is idempotent per session.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from flink_rag_spark.config import DEFAULT_CONFIG, EngineConfig
from flink_rag_spark.functions.providers import LocalDeterministicProvider


def register_engine_functions(spark: SparkSession,
                              cfg: EngineConfig = DEFAULT_CONFIG,
                              provider=None) -> None:
    """Register embed_text / chat_answer (Arrow-batched pandas UDFs),
    cosine_sim (vectorized numpy pandas UDF), and split_tokens (UDTF-style
    via explode-ready array return)."""
    provider = provider or LocalDeterministicProvider(cfg.embedding_dims, cfg.seed)

    @F.pandas_udf("array<float>")
    def embed_text(texts: pd.Series) -> pd.Series:
        return provider.embed_batch(texts)

    @F.pandas_udf("string")
    def chat_answer(prompts: pd.Series) -> pd.Series:
        return provider.chat_batch(prompts)

    @F.pandas_udf("double")
    def cosine_sim(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        def cs(x, y):
            if x is None or y is None:
                return None
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            d = float(np.linalg.norm(xv) * np.linalg.norm(yv))
            return float(np.dot(xv, yv) / d) if d else None
        return pd.Series([cs(x, y) for x, y in zip(a, b)])

    spark.udf.register("embed_text", embed_text)
    spark.udf.register("chat_answer", chat_answer)
    spark.udf.register("cosine_sim", cosine_sim)

    # UDTF surface (Spark ≥3.5): one input row → N output rows, usable with
    # LATERAL in SQL. Tokenization-with-position as the demonstrator.
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class SplitTokens:
        def eval(self, text: str):  # noqa: ANN001
            for i, t in enumerate((text or "").lower().split()):
                yield (t, i)

    spark.udtf.register("split_tokens", SplitTokens)
