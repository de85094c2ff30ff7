"""Streaming sources (SURVEY §2.1 S1-S4, Spark-first).

- ``file_replay``     — the batch fixtures replayed as a file stream
  (the Structured-Streaming analog of the reference's
  ``env.readTextFile`` jobs, which are really bounded replays).
- ``kafka_events``    — the Kafka consumer wiring (S1,
  `HotItems.scala:37-44`); constructed lazily so environments without a
  broker can still import the module.
- ``marketing_generator`` — the reference's synthetic
  ``RichSourceFunction`` (S3, `AppMarketingByChannel.scala:44-74`):
  ~rate events/sec with uuid users, random behavior/channel — rebuilt
  on the rate source + deterministic column expressions (including the
  reference's 'UNISTALL' misspelling, replicated per SURVEY §7.3.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def file_replay(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay a directory of files as a stream, one file per micro-batch
    (deterministic batch boundaries for tests)."""
    return (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def kafka_events(
    spark: SparkSession,
    bootstrap: str,
    topic: str = "hotitems",
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka string-value stream (S1).  The reference subscribes to
    topic 'hotitems' with latest offsets (`HotItems.scala:37-44`);
    values come back as cast strings for downstream CSV parsing."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_feeder(
    df: DataFrame,
    bootstrap: str,
    topic: str = "hotitems",
    value_cols: list[str] | None = None,
) -> None:
    """Replay a DataFrame into a Kafka topic (S4, the reference's
    ``KafkaProducer`` feeder, `KafkaProducer.scala:13-28`).

    The reference loops a CSV line-by-line through a producer; here the
    rows serialize to CSV strings JVM-side (`concat_ws`) and the Kafka
    batch sink writes them in parallel — one job, no driver loop.
    ``value_cols`` defaults to all columns, joined with ','.
    """
    cols = value_cols or df.columns
    (
        df.select(
            F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("value")
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )


def file_topic_feeder(
    df: DataFrame, topic_dir: str, value_cols: list[str] | None = None
) -> None:
    """File-backed stand-in for ``kafka_feeder`` (S4) — same record
    contract (CSV-serialized ``value`` strings, appended to a log), with
    a text directory playing the topic.  Serialization is byte-identical
    to ``kafka_feeder``'s (`concat_ws(",")` over cast columns), so the
    round-trip exercises everything but the broker transport.
    """
    cols = value_cols or df.columns
    (
        df.select(
            F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("value")
        )
        .write.mode("append")
        .format("text")
        .save(topic_dir)
    )


def file_topic_events(spark: SparkSession, topic_dir: str) -> DataFrame:
    """File-backed stand-in for ``kafka_events`` (S1): a streaming
    DataFrame with the same single ``value: string`` column shape the
    Kafka source produces, read from a ``file_topic_feeder`` directory.
    Downstream parsing (``sources.readers.parse_csv_values``) is shared
    with the real Kafka path, so swapping the fake for a broker is a
    one-line source change."""
    return spark.readStream.format("text").load(topic_dir)


BEHAVIORS = ("CLICK", "DOWNLOAD", "INSTALL", "UNISTALL")  # sic — ref :49
CHANNELS = ("wechat", "weibo", "appstore", "huaweistore")


def marketing_generator(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic marketing stream on the rate source (S3).

    uuid user ids, uniform behavior/channel picks, wall-clock event
    time — the declarative twin of the reference's 10 ms-sleep source
    loop (~100 ev/s, `AppMarketingByChannel.scala:67`).
    """
    b = ", ".join(f"'{x}'" for x in BEHAVIORS)
    c = ", ".join(f"'{x}'" for x in CHANNELS)
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.expr("uuid()").alias("user_id"),
            F.expr(f"element_at(array({b}), cast(rand() * 4 as int) + 1)").alias(
                "behavior"
            ),
            F.expr(f"element_at(array({c}), cast(rand() * 4 as int) + 1)").alias(
                "channel"
            ),
            F.col("timestamp").alias("ts"),
        )
    )
