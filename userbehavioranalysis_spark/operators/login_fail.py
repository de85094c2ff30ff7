"""Malicious-login detection (SURVEY §2.7 C1/C2).

The reference detects "two consecutive login failures within 2 s per
user" two ways:

- ``LoginFailWithCep.scala:30-38`` — a Flink CEP pattern
  ``begin(fail).next(fail).within(2s)`` — **strict contiguity**: any
  other event (a success) between the two failures breaks the match.
- ``LoginFail.scala:51-105`` — a hand-rolled ``ListState`` state
  machine with the same pair semantics (warning per overlapping fail
  pair, cleared on success).

Batch-declaratively the NFA collapses to a ``lag()`` over an event-time
ordered per-user window:

- strict  : lag over ALL the user's events — previous event must itself
            be a failure (an intervening success breaks contiguity);
- relaxed : lag over the user's FAILURE events only (CEP ``followedBy``
            semantics, kept for completeness — C3 uses it).

Both are a single shuffle on user_id and a sort within partition —
WindowExec spills if a user's history exceeds memory, and at 100 TB the
per-user slices are small; no driver-side iteration anywhere.

Testdata mapping: ``event_type = 'error'`` plays 'fail'; the pair gap is
configurable (the reference's 2 s matches its dense fixture; the
testdata stream is sparser, so the registry uses a wider gap to keep the
query's output non-trivial while the operator logic is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def login_fail_warnings(
    events: DataFrame,
    max_gap_seconds: int,
    strict: bool = True,
    fail_type: str = "error",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Warnings for consecutive failure pairs within ``max_gap_seconds``.

    Returns (user_id, first_fail_ts_us, last_fail_ts_us, warning_msg) —
    the shape of the reference's ``Warning`` (`LoginFail.scala:23`),
    with epoch-microsecond bigints for engine-portable hashing.  Emits
    one warning per qualifying pair (the reference's chained-pair
    behavior: 3 fails in a row → 2 warnings, `LoginFail.scala:67-83`).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    base = events if strict else events.filter(F.col("event_type") == fail_type)
    lagged = base.withColumn("prev_type", F.lag("event_type").over(w)).withColumn(
        "prev_ts", F.lag(ts_col).over(w)
    )
    pairs = lagged.filter(
        (F.col("event_type") == fail_type)
        & (F.col("prev_type") == fail_type)
        & (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("prev_ts"))
            <= max_gap_seconds * 1_000_000
        )
    )
    return pairs.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col("prev_ts")).alias("first_fail_ts_us"),
        F.unix_micros(F.col(ts_col)).alias("last_fail_ts_us"),
        F.lit("login fail!").alias("warning_msg"),
    )
