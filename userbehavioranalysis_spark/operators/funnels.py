"""Funnel + cohort-retention analytics (build-brief extension).

Two classic user-behavior analytics that round out the reference's
event-stream family (the reference detects per-user *patterns* — C1-C5;
these aggregate the same behavioral sequences corpus-wide):

- ``funnel_counts``      ordered view→click→purchase conversion: how
  many users reached each stage, where a stage counts only if it
  happens at-or-after the user's previous stage.
- ``retention_cohorts``  day-0 cohort × day-offset retention matrix.

Scale + determinism discipline:

- All event-time math is **integer microseconds / integer day numbers**
  (``unix_micros``, ``floor div 86400e6``) — no session-timezone
  dependence (the driver's oracle harness runs a vanilla session whose
  TZ we don't control) and bit-identical in DuckDB via ``epoch_us``.
- Each stage/cohort pass is a keyed aggregation with automatic partial
  aggregation; the funnel's three stage resolutions reuse the SAME
  user-id partitioning, so at scale the extra passes are cheap
  (no re-shuffle after the first exchange under co-partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def funnel_counts(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel stage population: users reaching each stage.

    Stage ``i`` counts a user iff they have an event of stage ``i``'s
    type at-or-after their earliest qualifying time for stage ``i-1``
    (the standard unordered-within-step, ordered-across-steps funnel).
    Returns (stage_no, stage, users) — one row per stage.

    Plan shape: one keyed aggregation per stage over the same user_id
    partitioning (conditional ``min`` with an event-type predicate),
    then a tiny union of per-stage counts.  The events scan is shared
    and cached by Catalyst reuse where the session enables it; the
    per-stage aggregate is partial-agg'd map-side, so each pass moves
    one row per user per partition.
    """
    us = F.unix_micros(F.col(ts_col))
    cur = events.select(F.col("user_id"), F.col("event_type"), us.alias("us"))
    stage_times = cur.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == stages[0], F.col("us"))).alias("s0")
    )
    for i, stage in enumerate(stages[1:], start=1):
        joined = cur.join(stage_times, on="user_id")
        prev = f"s{i - 1}"
        stage_times = joined.groupBy("user_id", *[f"s{j}" for j in range(i)]).agg(
            F.min(
                F.when(
                    (F.col("event_type") == stage) & (F.col("us") >= F.col(prev)),
                    F.col("us"),
                )
            ).alias(f"s{i}")
        )
    counts = stage_times.agg(
        *[
            F.count(F.col(f"s{i}")).cast("bigint").alias(f"n{i}")
            for i in range(len(stages))
        ]
    )
    rows = [
        F.struct(
            F.lit(i).cast("int").alias("stage_no"),
            F.lit(stage).alias("stage"),
            F.col(f"n{i}").alias("users"),
        )
        for i, stage in enumerate(stages)
    ]
    return counts.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.stage_no", "r.stage", "r.users"
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    max_offset: int = 30,
) -> DataFrame:
    """Cohort retention matrix: users active N days after first seen.

    Cohort = integer epoch-day of a user's first event; a user is
    retained at offset N if they have any event on cohort-day + N.
    Returns (cohort_day, day_offset, users), offsets 0..max_offset.

    Plan shape: first-day per user (one keyed agg), distinct
    (user, day) activity (partial-agg'd distinct), then an equi-join on
    user_id — both sides already partitioned by user_id from their
    aggregations — and a final small (cohort, offset) count.
    """
    # long `div` long: exact integer day number, no double rounding
    day = F.expr(f"unix_micros({ts_col}) div {US_PER_DAY}")
    ud = events.select(F.col("user_id"), day.alias("day"))
    first = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ud.distinct()
    return (
        active.join(first, on="user_id")
        .withColumn("day_offset", (F.col("day") - F.col("cohort_day")).cast("int"))
        .filter(F.col("day_offset") <= max_offset)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("users"))
    )
