"""Kafka round-trip integration tests — GATED on a real broker.

This sandbox has no Kafka broker (and no connector jar), so the Kafka
source/sink wrappers (context.stream_kafka, Stream.write_kafka) carry
only option-plumbing tests (tests/test_fixes3.py). The day an
environment provides a broker, coverage is a flag flip:

    KAFKA_BOOTSTRAP=host:9092 python -m pytest tests/test_kafka_integration.py

Requires the Structured Streaming Kafka connector on the session
classpath (spark-sql-kafka-0-10 for the running Spark/Scala version,
e.g. via spark.jars.packages). Every test skips cleanly when
KAFKA_BOOTSTRAP is unset.
"""

import os
import time
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP, reason="KAFKA_BOOTSTRAP not set (no broker in sandbox)"
)


@pytest.fixture()
def topic():
    return f"renoir_spark_it_{uuid.uuid4().hex[:12]}"


def test_bounded_write_then_stream_roundtrip(ctx, spark, topic, tmp_path):
    """Bounded write_kafka publishes each row as a JSON value; a
    stream_kafka availableNow drain must read the same payloads back."""
    from pyspark.sql import functions as F

    from renoir_spark.streaming import run_to_completion

    rows = [(i, f"payload-{i}") for i in range(50)]
    s = ctx.stream_iter(rows, "id long, body string")
    s.write_kafka(BOOTSTRAP, topic)

    src = ctx.stream_kafka(BOOTSTRAP, topic, starting_offsets="earliest")
    parsed = src.map(
        F.from_json(
            F.col("value").cast("string"), "id long, body string"
        ).alias("j")
    ).map(F.col("j.id").alias("id"), F.col("j.body").alias("body"))
    got = sorted(
        (r.id, r.body)
        for r in run_to_completion(parsed.df, output_mode="append")
    )
    assert got == sorted(rows)


def test_streaming_write_kafka_checkpointed(ctx, spark, topic, tmp_path):
    """Unbounded write_kafka (writeStream path): spool two files,
    drain the sink with availableNow + checkpoint, then read the topic
    back and compare counts."""
    from renoir_spark.streaming import run_to_completion

    ch = ctx.stream_channel("id long, body string")
    ch.push([(1, "a"), (2, "b")])
    ch.push([(3, "c")])
    q = ch.stream(max_files_per_trigger=1).write_kafka(
        BOOTSTRAP, topic, checkpoint=str(tmp_path / "ck")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    time.sleep(1)  # broker-side visibility

    src = ctx.stream_kafka(BOOTSTRAP, topic, starting_offsets="earliest")
    out = run_to_completion(src.df, output_mode="append")
    assert len(out) == 3
