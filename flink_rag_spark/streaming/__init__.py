from flink_rag_spark.streaming.ingest import run_ingest
from flink_rag_spark.streaming.answer import run_answer_stream
from flink_rag_spark.streaming.events import (
    tumbling_counts, sliding_counts, session_windows, dedup_within_watermark,
)

__all__ = [
    "run_ingest", "run_answer_stream",
    "tumbling_counts", "sliding_counts", "session_windows",
    "dedup_within_watermark",
]
