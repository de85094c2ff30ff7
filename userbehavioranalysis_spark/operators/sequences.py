"""Event-sequence analytics: transition matrices, rolling actives,
and semi-structured property extraction (build-brief extension).

Rounds out the behavioral-analytics family next to funnels/retention:
the reference's CEP operators (C1–C5) detect per-user *patterns*;
these summarize the same event sequences corpus-wide.

- ``event_transitions``    per-user consecutive event-type pairs →
  corpus-wide Markov transition counts + per-source probabilities.
- ``rolling_active_users`` trailing-N-day distinct active users per
  day — the classic DAU/WAU engagement curve.
- ``event_props_stats``    typed extraction from the semi-structured
  JSON ``props`` column (``get_json_object`` — JVM-side, no Python).

Determinism + scale discipline (shared with funnels.py):

- all event-time math is integer day numbers (``unix_micros`` floor
  division) — no session-timezone dependence;
- sequence windows order by (ts, event_id) so timestamp ties cannot
  flip neighbors between engines;
- averages are emitted as exact integer (sum, count) pairs plus a
  rounded ratio, never a bare float aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def event_transitions(events: DataFrame) -> DataFrame:
    """Markov transition matrix over per-user event sequences.

    For each user, order events by (ts, event_id) and pair each event
    with its predecessor; count every (prev_type, event_type) pair
    corpus-wide and attach the per-``prev_type`` transition
    probability.

    Plan shape: ONE shuffle — the lag window partitions by user_id,
    and at 100 TB that exchange is the whole cost (per-user sequences
    are short, so no single partition is skewed beyond a power user's
    event count; a pathological single-user firehose would be salted
    by pre-splitting its sequence, which changes pair counts only at
    split boundaries).  The transition aggregate and the probability
    window both run over the tiny |types|² matrix.
    """
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").asc(), F.col("event_id").asc()
    )
    pairs = (
        events.select("user_id", "event_id", "ts", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    per_prev = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.round(
            F.col("n_transitions")
            / F.sum("n_transitions").over(per_prev).cast("double"),
            6,
        ).alias("transition_prob_r6"),
    )


def rolling_active_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Trailing-``window_days`` distinct active users per calendar day.

    Returns one row per day that appears in the data: (day_no — epoch
    days —, n_active) where n_active counts users with ≥1 event in
    [day − window_days + 1, day].

    Plan shape: dedupe to (day, user) first (one exchange over the
    day+user key — at 100 TB this is the big shrink: billions of raw
    events reduce to |days|·|actives| rows), then a map-side
    ``explode(sequence(...))`` fans each (day, user) row into the
    ``window_days`` trailing days it contributes to, a broadcast
    semi-join prunes fan-out days absent from the data, and a final
    distinct-count per day lands the curve.  The fan-out factor is the
    constant ``window_days`` — bounded amplification on the SMALL
    deduped set, which beats the quadratic day×day range self-join and
    never materializes per-day user sets in driver memory.
    """
    day_user = (
        events.select(
            F.expr(f"unix_micros(ts) div {US_PER_DAY}").alias("day_no"),
            "user_id",
        )
        .distinct()
    )
    real_days = day_user.select("day_no").distinct()
    fanned = day_user.select(
        F.explode(
            F.sequence(
                F.col("day_no"), F.col("day_no") + F.lit(window_days - 1)
            )
        ).alias("day_no"),
        "user_id",
    )
    return (
        fanned.join(F.broadcast(real_days), "day_no", "left_semi")
        .groupBy("day_no")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def event_props_stats(events: DataFrame, key: str = "k") -> DataFrame:
    """Typed aggregation over the semi-structured JSON ``props`` column:
    per event type, count / sum / mean of the integer property ``key``.

    The extraction is ``get_json_object`` — a Catalyst expression
    evaluated JVM-side inside the scan's codegen stage, so the JSON
    never crosses to Python and the filter/projection still push down.
    Rows whose props lack the key (or hold non-numeric values) drop
    out via the null cast, mirroring SQL semantics.  The mean is
    derived from the exact integer (sum, n) pair, so it is bit-stable
    across engines and partition orders.
    """
    # try_cast, not cast: the session runs ANSI mode (Spark 4 default),
    # where a malformed numeric string would fail the query instead of
    # nulling out — try_cast restores the SQL drop-the-row semantics
    v = F.get_json_object("props", f"$.{key}").try_cast("long")
    return (
        events.select("event_type", v.alias("v"))
        .where(F.col("v").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_with_key"),
            F.sum("v").alias("sum_v"),
            F.round(F.sum("v") / F.count(F.lit(1)).cast("double"), 4).alias(
                "mean_v_r4"
            ),
        )
    )
