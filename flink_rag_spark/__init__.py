"""flink_rag_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference streaming-RAG system
(zonbloop/flink-rag), generalized to a relational + LLM-data-pipeline surface.

Design stance (SURVEY.md §7.0): everything is declared through the DataFrame /
Spark SQL API so Catalyst sees the whole plan; Python only runs inside
Arrow-batched pandas UDFs for genuinely external work (embedding / chat
providers, multimodal decode). No RDDs anywhere.

Layout:
    config.py     — one engine config (mirrors reference EmbeddingConfig/Variables)
    session.py    — SparkSession factory + runtime confs
    sources/      — table loaders (parquet testdata), streaming sources
    functions/    — column-level building blocks (vector math, shared hashing,
                    text metrics, pluggable embed/chat providers)
    operators/    — composite operators (similarity top-k/join, dedup family,
                    as-of/range join, multimodal plumbing)
    plans/        — the query catalog: every named query + its DuckDB oracle SQL
    streaming/    — Structured Streaming jobs mirroring the reference's two
                    Flink jobs, plus event-time operators the reference lacks
"""

from flink_rag_spark.config import EngineConfig, DEFAULT_CONFIG

__all__ = ["EngineConfig", "DEFAULT_CONFIG"]
__version__ = "0.1.0"
