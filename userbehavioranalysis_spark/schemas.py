"""Schema catalog — the reference's record types as explicit StructTypes.

Mirrors SURVEY §1.2 exactly (one StructType per case class).  The
reference fixes schemas at compile time via Scala case classes
(`HotItems.scala:24`, `NetworkFlow.scala:21`, `AdStatisticsByGeo.scala:16`,
`LoginFail.scala:20`, `OrderTimeout.scala:13`, `TxMacthDetect.scala:10`,
`AppMarketingByChannel.scala:18`); here they are data, shared by the CSV
readers, the synthetic generators and the streaming jobs.

Timestamp convention (SURVEY §1.3): raw epoch **seconds** longs in every
CSV (`ts`), epoch **milliseconds** for apache-log and marketing events.
Readers keep the raw long AND add a proper ``TimestampType`` column
``event_ts`` so downstream windowing is typed while golden-output
fidelity against the reference stays possible.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t(), nullable=True) for n, t in fields])


# UserBehavior — HotItems.scala:24 (userId, itemId, categoryId, behavior, ts[s])
USER_BEHAVIOR = _struct(
    ("user_id", LongType),
    ("item_id", LongType),
    ("category_id", IntegerType),
    ("behavior", StringType),
    ("ts", LongType),
)

# ApacheLogEvent — NetworkFlow.scala:21 (ip, userId, eventTime[ms], method, url)
APACHE_LOG_EVENT = _struct(
    ("ip", StringType),
    ("user_id", StringType),
    ("event_time_ms", LongType),
    ("method", StringType),
    ("url", StringType),
)

# MarketingUserBehavior — AppMarketingByChannel.scala:18
MARKETING_USER_BEHAVIOR = _struct(
    ("user_id", StringType),
    ("behavior", StringType),
    ("channel", StringType),
    ("ts_ms", LongType),
)

# AdClickEvent — AdStatisticsByGeo.scala:16
AD_CLICK_EVENT = _struct(
    ("user_id", LongType),
    ("ad_id", LongType),
    ("province", StringType),
    ("city", StringType),
    ("ts", LongType),
)

# LoginEvent — LoginFail.scala:20
LOGIN_EVENT = _struct(
    ("user_id", LongType),
    ("ip", StringType),
    ("event_type", StringType),
    ("ts", LongType),
)

# OrderEvent — OrderTimeout.scala:13
ORDER_EVENT = _struct(
    ("order_id", LongType),
    ("event_type", StringType),
    ("tx_id", StringType),
    ("ts", LongType),
)

# ReceiptEvent — TxMacthDetect.scala:10
RECEIPT_EVENT = _struct(
    ("tx_id", StringType),
    ("pay_channel", StringType),
    ("ts", LongType),
)

# Driver testdata `events` table (TESTDATA.md) — the generic behavior
# stream the batch analytics run on: event_id, ts(timestamp), user_id,
# event_type(view|click|purchase|signup|error), value(double), props(json).
# The parquet stores ts as an INT64 timestamp whose unit has varied
# across driver testdata generations (ns, then us); EVENTS_RAW types it
# LongType so the scan works on ANY session (no nanosAsLong legacy conf),
# with unit-agnostic epoch→micro normalization done in the reader
# (sources/readers.epoch_any_to_ts).
EVENTS_RAW = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
