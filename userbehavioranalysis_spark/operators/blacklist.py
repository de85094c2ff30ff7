"""Click-fraud blacklist filter (SURVEY §2.7 C5, §2.2 F5).

Reference: ``FilterBlackListUser`` (`AdStatisticsByGeo.scala:59-101`) —
per-(userId, adId) ``ValueState`` click counter; clicks 1..100 of a day
pass through, the 101st triggers one ``BlackListWarning`` to a side
output and further clicks are suppressed; a processing-time timer at
midnight clears all counters.

Batch-declaratively the daily counter is a calendar-day bucket (the
deterministic replacement for the reference's midnight *processing-time*
reset, SURVEY §7.3.4) and the pass/suppress decision is a per-key
``row_number`` in event-time order:

- pass-through stream: rows with ``row_number() OVER (PARTITION BY key,
  day ORDER BY ts) <= threshold``;
- warning side output: one row per (key, day) whose total exceeds the
  threshold — the reference fires exactly once per key per day too
  (``isSentBlackList`` latch, `AdStatisticsByGeo.scala:80-86`).

Both derive from one shuffle on (key, day); Catalyst reuses the
exchange.  Per-key daily partitions are tiny at any scale, so the
window sort never spills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_day(events: DataFrame, ts_col: str) -> DataFrame:
    return events.withColumn(
        "day_start",
        (F.floor(F.unix_micros(F.col(ts_col)) / F.lit(86_400_000_000)) * 86400).cast(
            "long"
        ),
    )


def blacklist_filter(
    events: DataFrame,
    threshold: int,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Pass-through stream: the first ``threshold`` events per key per day.

    Returns the FULL input rows plus ``day_start`` and ``seq`` (the
    1-based event-time position within the (key, day) bucket).  Keeping
    every column means downstream consumers (ad_statistics_job's window
    agg) never join back to the source — a join-back on a non-unique
    content hash multiplies exact-duplicate input rows (the reference
    fixture AdClickLog.csv contains such duplicates), and is an extra
    shuffle besides.
    """
    key_cols = key_cols or ["user_id"]
    df = _with_day(events, ts_col)
    w = Window.partitionBy(*key_cols, "day_start").orderBy(ts_col, "event_id")
    return (
        df.withColumn("seq", F.row_number().over(w).cast("int"))
        .filter(F.col("seq") <= threshold)
    )


def blacklist_warnings(
    events: DataFrame,
    threshold: int,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Warning side output: one row per (key, day) exceeding the cap.

    Returns (user_id, day_start, total_count, warning_msg); message text
    follows `AdStatisticsByGeo.scala:84`.
    """
    key_cols = key_cols or ["user_id"]
    df = _with_day(events, ts_col)
    return (
        df.groupBy(*key_cols, "day_start")
        .agg(F.count(F.lit(1)).alias("total_count"))
        .filter(F.col("total_count") > threshold)
        .select(
            *key_cols,
            "day_start",
            "total_count",
            F.format_string(
                "Click over %d times today.", F.lit(threshold)
            ).alias("warning_msg"),
        )
    )
