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


def attribution_last_touch(events: DataFrame, key: str = "k") -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the
    campaign (the integer ``props.$key`` of the user's most recent
    *click* strictly before the purchase); campaigns are scored by
    conversions and attributed revenue.  Purchases with no preceding
    click fall into the NULL-campaign bucket — surfacing unattributed
    conversions instead of silently dropping them.

    Plan shape: ONE user-keyed exchange carries everything — the
    carry-forward is ``last(campaign, ignorenulls) OVER (user ROWS
    UNBOUNDED PRECEDING TO 1 PRECEDING)``, evaluated JVM-side over the
    same sort the lag-based operators reuse; the per-campaign rollup
    then aggregates a tiny |campaigns| frame.  'Strictly before' is the
    1-PRECEDING frame bound, so a click and purchase sharing a
    timestamp attribute by (ts, event_id) order — the engine's one
    total order, identical in the oracle.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    campaign = F.when(
        F.col("event_type") == "click",
        F.get_json_object("props", f"$.{key}").try_cast("long"),
    )
    attributed = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.last(campaign, ignorenulls=True).over(w).alias("campaign"),
    ).where(F.col("event_type") == "purchase")
    return attributed.groupBy("campaign").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("attributed_value_r2"),
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    max_events: int = 8,
    top: int = 20,
) -> DataFrame:
    """Top-``top`` session journey shapes: sessionize each user's
    events at ``gap_minutes`` of inactivity, render each session's
    first ``max_events`` event types as a '>'-joined path, and count
    sessions per path.

    Plan shape: the session assignment (gap flag + running sum), the
    intra-session rank, and the per-session collect all ride ONE
    user-keyed exchange (user_id partitioning satisfies the
    (user, session) clustering, so no re-shuffle).  The cap filters
    BEFORE the collect — a slice after collect_list would still
    materialize a bot session's full event array in the aggregation
    buffer, which is the classic skew OOM at 100 TB; rank-then-filter
    bounds the carried state at ``max_events`` structs per session.
    Sort keys are (us, event_id), so tied timestamps cannot flip path
    strings between engines.
    """
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy(us.asc(), F.col("event_id").asc())
    gap_us = gap_minutes * 60 * 1_000_000
    sessionized = events.select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("us"),
        F.when(
            (us - F.lag(us).over(w)) > F.lit(gap_us), F.lit(1)
        ).otherwise(F.lit(0)).alias("is_new"),
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    )
    sessionized = sessionized.withColumn("sess_no", F.sum("is_new").over(w2))
    w3 = Window.partitionBy("user_id", "sess_no").orderBy(
        F.col("us").asc(), F.col("event_id").asc()
    )
    capped = sessionized.withColumn(
        "evt_rank", F.row_number().over(w3)
    ).where(F.col("evt_rank") <= max_events)
    paths = (
        capped.groupBy("user_id", "sess_no")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("us", "event_id", "event_type"))
            ).alias("seq")
        )
        .select(F.array_join(F.col("seq.event_type"), ">").alias("path"))
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    # no global sort — an unpartitioned rank window would funnel every
    # distinct path through one partition); the rank window then runs
    # over only the ``top`` survivors
    order = (F.desc("n_sessions"), F.asc("path"))
    return (
        counted.orderBy(*order)
        .limit(top)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .select("rank", "path", "n_sessions")
    )


def anomaly_zscore(events: DataFrame, trailing_hours: int = 24) -> DataFrame:
    """Volume-anomaly detection: per event type, each hour's event
    count scored against the trailing ``trailing_hours`` observed
    hours.  Emits only hours with a FULL trailing window, with the
    z-score and a ±3σ anomaly flag.

    The z-score algebra is integer until the last step:
    ``z = (n·x − Σ) / sqrt(n·Σx² − Σ²)`` over exact integer counts —
    no running float mean/variance, so the score is bit-identical on
    any engine and partition order (and the sqrt operand cannot go
    negative through float cancellation, a real hazard of the
    mean/variance form).  Degenerate windows (all counts equal →
    variance 0) emit a NULL z rather than ±inf.  The int64 algebra is
    exact below ~6×10⁸ events per (type, hour) — beyond that (n·Σx²
    approaches 2⁶³) flip the three window sums to ``decimal(38,0)``,
    which changes no value below the threshold.

    Plan shape: the hourly rollup is one groupBy over (type, hour);
    the trailing stats are ONE window over the tiny hourly frame —
    |types|·|hours| rows, thousands at most even for 100 TB of raw
    events, so the window cost is nil and the heavy exchange is only
    the first rollup (partial-agg combined map-side).
    """
    hour_no = F.expr("unix_micros(ts) div 3600000000")
    hourly = (
        events.select(hour_no.alias("hour_no"), "event_type")
        .groupBy("event_type", "hour_no")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return zscore_over_hourly(hourly, trailing_hours)


def zscore_over_hourly(hourly: DataFrame, trailing_hours: int = 24) -> DataFrame:
    """The z-score core of ``anomaly_zscore`` over an already-built
    (event_type, hour_no, n_events) frame — shared by the batch
    operator and the streaming replay (whose hourly counts come from a
    watermark-closed streaming window aggregate)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("hour_no").asc())
        .rowsBetween(-trailing_hours, -1)
    )
    stats = hourly.select(
        "event_type",
        "hour_no",
        "n_events",
        F.count(F.lit(1)).over(w).alias("n_prev"),
        F.sum("n_events").over(w).alias("sum_prev"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("sumsq_prev"),
    ).where(F.col("n_prev") == trailing_hours)
    var_num = F.col("n_prev") * F.col("sumsq_prev") - F.col("sum_prev") * F.col(
        "sum_prev"
    )
    z = F.when(
        var_num > 0,
        (F.col("n_prev") * F.col("n_events") - F.col("sum_prev")).cast("double")
        / F.sqrt(var_num.cast("double")),
    )
    return stats.select(
        "event_type",
        "hour_no",
        "n_events",
        F.round(z, 4).alias("zscore_r4"),
        (F.abs(F.coalesce(z, F.lit(0.0))) >= 3.0).alias("is_anomaly"),
    )


def time_to_convert(events: DataFrame) -> DataFrame:
    """Click→purchase conversion-lag distribution: per user, the lag
    from FIRST click to the first purchase at-or-after it; summarized
    as exact percentiles over the per-user lags (seconds).

    Plan shape: the conversion time needs ``min(purchase ≥ first
    click)``, which no single aggregate pass can know — so the clean
    two-step: aggregate first-click per user (tiny), join it back onto
    the purchase rows only, and take the conditional min per user.
    Both exchanges move per-user rows, not raw events; the
    final percentile runs on ONE row per converted user.  Lags are
    integer seconds (``div``), percentiles linear-interpolated —
    matching the oracle's quantile_cont exactly (length_quantiles
    precedent).
    """
    us = F.unix_micros("ts")
    first_click = (
        events.where(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min(us).alias("fc_us"))
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), us.alias("p_us")
    )
    lags = (
        purchases.join(first_click, F.col("p_user") == F.col("user_id"))
        .where(F.col("p_us") >= F.col("fc_us"))
        .groupBy("user_id")
        .agg(
            F.expr("min(p_us - fc_us) div 1000000").alias("lag_sec")
        )
    )
    return lags.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(lag_sec, 0.5)"), 4).alias("p50_r4"),
        F.round(F.expr("percentile(lag_sec, 0.9)"), 4).alias("p90_r4"),
        F.round(F.expr("percentile(lag_sec, 0.99)"), 4).alias("p99_r4"),
        F.round(
            F.sum("lag_sec").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_r4"),
    )

