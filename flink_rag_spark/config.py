"""Engine configuration.

Mirrors the reference's scattered constants (reference
``utils/EmbeddingConfig.java:4-6``, ``utils/Variables.java:6-9``,
``RAG.java:53-54,67-84,89-93``, topic/group names in ``AiJob.java:19-33`` and
``StreamingStoreKnowledge.java:30-37``) as ONE dataclass, fixing the
reference's write-vs-read embedding-config split (SURVEY.md §2.1 "known
inconsistencies": ``StreamingStoreKnowledge.java:88`` vs ``RAG.java:33``).
"""

from __future__ import annotations

from dataclasses import dataclass

# Two-slot prompt with the same template semantics as the reference
# (RAG.java:67-74: a system persona, a {{question}} slot, an {{information}}
# slot filled with retrieved context).
DEFAULT_PROMPT_TEMPLATE = (
    "You are Blip-Blop, an expert home-care assistant. "
    "Answer the question using only the provided information.\n"
    "Question:\n{question}\n\n"
    "Information:\n{information}"
)


@dataclass(frozen=True)
class EngineConfig:
    # --- retrieval (RAG.java:51-59) ---
    retrieval_k: int = 10              # RAG.java:53 maxResults
    min_score: float = 0.0             # RAG.java:54 minScore
    context_separator: str = "\n\n"    # RAG.java:78 joining separator
    prompt_template: str = DEFAULT_PROMPT_TEMPLATE  # RAG.java:67-74

    # --- embeddings (EmbeddingConfig.java:4-5) ---
    # The reference hardcodes 1536 (text-embedding-3-small). The engine treats
    # dimensionality as data-driven (FIXTURES.md: driver vectors are 64-dim);
    # this value is only the default for the local deterministic provider.
    embedding_dims: int = 64
    embedding_model: str = "local-hash-projection"  # pluggable; ref: text-embedding-3-small

    # --- chat (RAG.java:89-93) ---
    chat_model: str = "local-template-echo"  # ref: gpt-4.1-mini-2025-04-14
    chat_temperature: float = 0.25
    chat_top_p: float = 0.9
    chat_max_tokens: int = 256
    chat_timeout_s: int = 60

    # --- streaming topology (AiJob.java:19-33, StreamingStoreKnowledge.java:30-37) ---
    questions_topic: str = "questions"
    answers_topic: str = "answers"
    knowledge_topic: str = "knowledge_updates"
    questions_group: str = "rag-question-consumer"
    knowledge_group: str = "embedding-ingestor"
    kafka_bootstrap: str = "kafka:29092"   # AiJob.java:20

    # --- engine knobs (no reference analog; Spark-native) ---
    provider_batch_size: int = 256     # rows per provider call inside mapInPandas
    lsh_num_hashes: int = 16           # minhash signature length
    lsh_bands: int = 4                 # bands for LSH bucketing (rows = 16/4)
    shingle_size: int = 3              # word-shingle width for near-dup
    lsh_max_bucket: int = 4096         # LSH buckets above this switch from
    #                                    all-pairs to star reduction (O(B))
    simhash_bits: int = 64             # simhash fingerprint width (16-bit
    #                                    quarter blocking → 262,144 join keys)
    ann_num_planes: int = 8            # random-hyperplane bits per LSH table
    ann_num_tables: int = 4            # independent LSH tables (recall lever)
    ivf_n_centroids: int = 64          # IVF coarse-quantizer cells
    ivf_n_probe: int = 16              # cells probed per query (recall lever)
    ivf_probe_frac: float = 0.25       # probe budget as a fraction of cells:
    #                                    THE recall/throughput knob — raise it
    #                                    toward 1.0 to approach exact recall,
    #                                    lower it for throughput (floor stays
    #                                    ivf_n_probe). 0.25 measures ≥7/10
    #                                    recall on the weak-similarity corpus.
    max_driver_queries: int = 8192     # query batches up to this size take the
    #                                    driver-probe + fused-scorer k-NN path
    #                                    (one bounded collect, like a broadcast
    #                                    build side); larger batches stay fully
    #                                    distributed
    partial_topk_min_rows: int = 100_000  # corpus-row estimate above which the
    #                                    map-side partial top-k pays for its
    #                                    Arrow pass (below it, the ranking
    #                                    window's shuffle is already tiny)
    # deterministic seeds for all hashing — never wall-clock derived
    seed: int = 42

    @classmethod
    def from_env(cls, **overrides) -> "EngineConfig":
        """Config with deployment facts taken from the environment —
        currently the Kafka bootstrap address (KAFKA_BOOTSTRAP_SERVERS),
        so the same job code runs against any broker."""
        import os
        env_bootstrap = os.environ.get("KAFKA_BOOTSTRAP_SERVERS")
        if env_bootstrap and "kafka_bootstrap" not in overrides:
            overrides["kafka_bootstrap"] = env_bootstrap
        return cls(**overrides)


DEFAULT_CONFIG = EngineConfig()
