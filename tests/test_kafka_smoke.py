"""Kafka pipeline smoke (SURVEY §2.1 S1/S4, `HotItems.scala:37-48`,
`KafkaProducer.scala:13-28`).

No broker exists in this environment, so the transport is a file-backed
topic fake with the SAME record contract (CSV ``value`` strings) and the
same serializer/parser code paths as the real Kafka functions; the
broker-dependent path itself is skip-gated.
"""

import os

import pytest

from userbehavioranalysis_spark import schemas
from userbehavioranalysis_spark.sources.readers import parse_csv_values
from userbehavioranalysis_spark.streaming.sources import (
    file_topic_events,
    file_topic_feeder,
    kafka_events,
)

ROWS = [
    (543462, 1715, 1464116, "pv", 1511658000),
    (662867, 2244074, 1575622, "pv", 1511658000),
    (561558, 3611281, 965809, "pv", 1511658001),
    (894923, 3076029, 1879194, "buy", 1511658002),
    (834377, 4541270, 3738615, "cart", 1511658003),
]


def test_file_topic_round_trip_matches_batch(spark, tmp_path):
    # CSV rows → feeder (kafka_feeder's serialization) → topic → source
    # → the reference's split/trim/cast parse → identical typed rows
    src = spark.createDataFrame(ROWS, schemas.USER_BEHAVIOR)
    topic = os.path.join(str(tmp_path), "topic_hotitems")
    file_topic_feeder(src, topic)

    parsed = parse_csv_values(
        file_topic_events(spark, topic), schemas.USER_BEHAVIOR, "ts", "s"
    )
    assert parsed.isStreaming
    q = (
        parsed.writeStream.format("memory")
        .queryName("kafka_smoke")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    got = {
        (r["user_id"], r["item_id"], r["category_id"], r["behavior"], r["ts"])
        for r in spark.table("kafka_smoke").collect()
    }
    assert got == set(ROWS)
    # event_ts derived exactly as the batch reader derives it (epoch s)
    ts = {r["ts"]: r["event_ts"].timestamp() for r in spark.table("kafka_smoke").collect()}
    assert all(abs(k - v) < 1e-6 for k, v in ts.items())


def test_feeder_appends_like_a_topic(spark, tmp_path):
    # a topic is an append-only log: two feeder calls accumulate
    src = spark.createDataFrame(ROWS, schemas.USER_BEHAVIOR)
    topic = os.path.join(str(tmp_path), "topic_append")
    file_topic_feeder(src, topic)
    file_topic_feeder(src, topic)
    assert spark.read.text(topic).count() == 2 * len(ROWS)


def test_kafka_source_wiring_or_skip(spark):
    # exercises the real kafka source path end-to-end IF the connector
    # jar is on the classpath (it is not in this container) — the plan
    # construction + option plumbing is identical either way
    try:
        df = kafka_events(spark, "localhost:9092", topic="hotitems")
    except Exception as e:  # missing spark-sql-kafka package
        msg = str(e)
        assert "kafka" in msg.lower()
        pytest.skip(f"kafka connector not available: {msg[:80]}")
    assert df.isStreaming and df.columns == ["value"]
