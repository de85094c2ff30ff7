"""Window-assignment and ranking semantics on hand-checkable fixtures."""

import pyspark.sql.functions as F

from userbehavioranalysis_spark.operators.topn import windowed_topn
from userbehavioranalysis_spark.operators.windowed_counts import (
    page_view,
    unique_visitors,
)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, item_id, epoch_seconds)"""
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, item_id long, sec long",
    )
    return df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")


def test_tumbling_window_boundary_inclusion(spark):
    # event exactly at a window end belongs to the NEXT window
    ev = _events(
        spark,
        [(1, 1, "view", 1, 3599), (2, 1, "view", 1, 3600), (3, 1, "view", 1, 3601)],
    )
    res = {r["window_start"]: r["pv_count"] for r in page_view(ev).collect()}
    assert res == {0: 1, 3600: 2}


def test_uv_per_event_running_counts(spark):
    # FIRE_AND_PURGE emission sequence: running distinct count per event,
    # resetting at the window boundary (no carry-over = PURGE semantics)
    from userbehavioranalysis_spark.operators.windowed_counts import uv_per_event

    ev = _events(
        spark,
        [
            (1, 10, "view", 1, 100),
            (2, 20, "view", 1, 200),
            (3, 10, "view", 1, 300),   # repeat user: count must not grow
            (4, 30, "click", 1, 400),  # filtered out
            (5, 10, "view", 1, 3700),  # next window: restarts at 1
        ],
    )
    rows = sorted(uv_per_event(ev).collect(), key=lambda r: r["event_id"])
    assert [(r["event_id"], r["window_end"], r["running_uv"]) for r in rows] == [
        (1, 3600, 1), (2, 3600, 2), (3, 3600, 2), (5, 7200, 1)
    ]


def test_funnel_requires_stage_order(spark):
    # user 1: view->click->purchase (all stages); user 2: click BEFORE
    # view (click must not count); user 3: view only
    from userbehavioranalysis_spark.operators.funnels import funnel_counts

    ev = _events(
        spark,
        [
            (1, 1, "view", 1, 100), (2, 1, "click", 1, 200), (3, 1, "purchase", 1, 300),
            (4, 2, "click", 1, 100), (5, 2, "view", 1, 200),
            (6, 3, "view", 1, 100),
        ],
    )
    got = {r["stage"]: r["users"] for r in funnel_counts(ev).collect()}
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_retention_cohort_offsets(spark):
    # user 1 first on day 0, active days 0 and 2; user 2 first on day 2
    from userbehavioranalysis_spark.operators.funnels import retention_cohorts

    d = 86400
    ev = _events(
        spark,
        [
            (1, 1, "view", 1, 10),
            (2, 1, "view", 1, 2 * d + 50),
            (3, 1, "view", 1, 2 * d + 60),  # same day twice: one retention row
            (4, 2, "view", 1, 2 * d + 5),
        ],
    )
    got = {
        (r["cohort_day"], r["day_offset"]): r["users"]
        for r in retention_cohorts(ev).collect()
    }
    assert got == {(0, 0): 1, (0, 2): 1, (2, 0): 1}


def test_uv_counts_distinct_users_not_events(spark):
    ev = _events(
        spark,
        [(1, 7, "view", 1, 10), (2, 7, "view", 2, 20), (3, 8, "view", 1, 30)],
    )
    [r] = unique_visitors(ev).collect()
    assert r["uv_count"] == 2


def test_sliding_window_membership_count(spark):
    # one event must appear in exactly size/slide windows
    ev = _events(spark, [(1, 1, "view", 1, 5000)])
    res = windowed_topn(ev, "item_id", n=5, window="1 hour", slide="5 minutes")
    rows = res.collect()
    assert len(rows) == 12
    starts = sorted(r["window_start"] for r in rows)
    assert starts[0] == 5000 // 300 * 300 - 11 * 300
    assert starts[-1] == 5000 // 300 * 300
    assert all(r["window_end"] - r["window_start"] == 3600 for r in rows)


def test_topn_deterministic_tiebreak_and_cutoff(spark):
    # items 2,2,1,1,3: counts {1:2, 2:2, 3:1}; top-2 must be [1, 2] by
    # the (count DESC, key ASC) tie-break
    ev = _events(
        spark,
        [
            (1, 1, "view", 2, 10),
            (2, 1, "view", 2, 20),
            (3, 1, "view", 1, 30),
            (4, 1, "view", 1, 40),
            (5, 1, "view", 3, 50),
        ],
    )
    rows = windowed_topn(ev, "item_id", n=2, window="1 hour").collect()
    ranked = sorted((r["rank"], r["item_id"]) for r in rows)
    assert ranked == [(1, 1), (2, 2)]


def test_session_window_gap_boundary_splits(spark):
    """An event exactly `gap` after the last one still MERGES (Spark
    starts a new session only when the gap is strictly exceeded)."""
    from userbehavioranalysis_spark.operators.windowed_counts import user_sessions

    rows = [
        (1, 1, "view", 0, 100),
        (2, 1, "view", 0, 150),   # merges (within 60s)
        (3, 1, "view", 0, 210),   # exactly last+60 -> merges
        (5, 1, "view", 0, 271),   # 61s after 210 -> new session
        (4, 2, "view", 0, 100),
    ]
    df = _events(spark, rows)
    got = {
        (r.user_id, r.session_start, r.session_end, r.event_count)
        for r in user_sessions(df, gap="60 seconds").collect()
    }
    assert got == {
        (1, 100, 270, 3),  # 210 merged: last+gap boundary is inclusive
        (1, 271, 331, 1),  # 271 > 210+60: strictly past the gap
        (2, 100, 160, 1),
    }
