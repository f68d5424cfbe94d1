"""Gated Kafka integration: the real connector path for A1/A2/A7.

The reference's only transport is Kafka (AiJob.java:19-33,
StreamingStoreKnowledge.java:30-37). This container has no broker and no
maven access, so by default every test here SKIPS — run against a real
broker with:

    KAFKA_BOOTSTRAP_SERVERS=localhost:9092 \
        python -m pytest tests/test_kafka_integration.py -q

The roundtrip runs in a SUBPROCESS because the connector jar
(session.kafka_package) must be on the classpath at JVM launch — the
suite's shared session was built without it, and a JVM can't add jars
after the fact.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _broker_reachable() -> bool:
    addr = os.environ.get("KAFKA_BOOTSTRAP_SERVERS", "")
    if not addr:
        return False
    host, _, port = addr.split(",")[0].partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout=2):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not _broker_reachable(),
    reason="no Kafka broker (set KAFKA_BOOTSTRAP_SERVERS=host:port)")


_ROUNDTRIP = textwrap.dedent("""
    import os, sys, tempfile, uuid
    sys.path.insert(0, {repo!r})
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F
    from flink_rag_spark.config import EngineConfig
    from flink_rag_spark.session import kafka_package
    from flink_rag_spark.sources.streams import kafka_string_source, kafka_string_sink

    cfg = EngineConfig.from_env()
    topic_in = "frs_it_in_" + uuid.uuid4().hex[:8]
    topic_out = "frs_it_out_" + uuid.uuid4().hex[:8]
    spark = (SparkSession.builder.master("local[2]")
             .config("spark.jars.packages", kafka_package())
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false").getOrCreate())

    # produce 5 values with the batch Kafka writer
    (spark.createDataFrame([(f"msg-{{i}}",) for i in range(5)], "value string")
     .write.format("kafka")
     .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
     .option("topic", topic_in).save())

    # A2: earliest-offset string source sees all 5
    src = kafka_string_source(spark, topic_in, cfg, starting_offsets="earliest")
    ck1 = tempfile.mkdtemp()
    # A7: at-least-once Kafka sink into a second topic
    q = (kafka_string_sink(src, topic_out, ck1, cfg)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = (spark.read.format("kafka")
           .option("kafka.bootstrap.servers", cfg.kafka_bootstrap)
           .option("subscribe", topic_out)
           .option("startingOffsets", "earliest").load()
           .select(F.col("value").cast("string")).collect())
    vals = sorted(r["value"] for r in got)
    assert vals == [f"msg-{{i}}" for i in range(5)], vals
    print("ROUNDTRIP_OK")
""").format(repo=REPO)


def test_kafka_source_sink_roundtrip():
    env = dict(os.environ)
    out = subprocess.run([sys.executable, "-c", _ROUNDTRIP], env=env,
                         capture_output=True, text=True, timeout=600)
    assert "ROUNDTRIP_OK" in out.stdout, out.stdout + "\n" + out.stderr
