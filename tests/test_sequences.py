"""Event-sequence analytics + round-3 relational shapes: correctness on
hand-built frames, plan-shape assertions for the scale properties.
(Cross-engine value parity is covered by tools/oracle_check.py.)"""

import datetime as dt

import pyspark.sql.functions as F

from userbehavioranalysis_spark.operators.sequences import (
    event_props_stats,
    event_transitions,
    rolling_active_users,
)
from userbehavioranalysis_spark.plans.relational import (
    customers_without_recent_orders,
    nation_trade_volume,
    promo_revenue_share,
    top_supplier,
)
from userbehavioranalysis_spark.sources.readers import load_testdata

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec), uid, et, 0.0, p)
            for eid, sec, uid, et, p in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_event_transitions_counts_and_probs(spark):
    # user 1: a->b->b ; user 2: a->c ; singleton user 3 contributes none
    ev = _events(
        spark,
        [
            (1, 0, 1, "a", "{}"),
            (2, 1, 1, "b", "{}"),
            (3, 2, 1, "b", "{}"),
            (4, 0, 2, "a", "{}"),
            (5, 9, 2, "c", "{}"),
            (6, 0, 3, "a", "{}"),
        ],
    )
    got = {
        (r.prev_type, r.event_type): (r.n_transitions, r.transition_prob_r6)
        for r in event_transitions(ev).collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("a", "c"): (1, 0.5),
        ("b", "b"): (1, 1.0),
    }


def test_event_transitions_breaks_ts_ties_on_event_id(spark):
    # same timestamp: event_id orders the pair deterministically
    ev = _events(spark, [(10, 5, 1, "x", "{}"), (11, 5, 1, "y", "{}")])
    rows = event_transitions(ev).collect()
    assert [(r.prev_type, r.event_type) for r in rows] == [("x", "y")]


def test_event_transitions_single_shuffle(spark):
    ev = _events(spark, [(1, 0, 1, "a", "{}"), (2, 1, 1, "b", "{}")])
    plan = _plan(event_transitions(ev))
    # one user-keyed exchange for the lag window; the |types|^2 matrix
    # aggregation + probability window add small exchanges, but no
    # second pass over the events relation may appear
    assert plan.count("Scan ExistingRDD") == 1, plan


def test_rolling_active_users_window_semantics(spark):
    day = 86_400
    # u1 active day0; u2 active day0+day8; u3 active day8
    ev = _events(
        spark,
        [
            (1, 0, 1, "view", "{}"),
            (2, 10, 2, "view", "{}"),
            (3, 8 * day, 2, "view", "{}"),
            (4, 8 * day + 5, 3, "view", "{}"),
        ],
    )
    base = dt.datetime(2024, 1, 1).timestamp() // day
    got = {r.day_no - base: r.n_active for r in rolling_active_users(ev).collect()}
    # day 0: u1,u2 ; day 8: only u2,u3 (day 0 is 8 days back, outside 7)
    assert got == {0: 2, 8: 2}


def test_rolling_active_users_counts_user_once_per_window(spark):
    # u1 active on day0 AND day1: target day1 must count them once
    day = 86_400
    ev = _events(
        spark,
        [(1, 0, 1, "v", "{}"), (2, day, 1, "v", "{}"), (3, day, 2, "v", "{}")],
    )
    base = dt.datetime(2024, 1, 1).timestamp() // day
    got = {r.day_no - base: r.n_active for r in rolling_active_users(ev).collect()}
    assert got == {0: 1, 1: 2}


def test_event_props_stats_extracts_and_drops_malformed(spark):
    ev = _events(
        spark,
        [
            (1, 0, 1, "view", '{"k": 10}'),
            (2, 1, 1, "view", '{"k": 20}'),
            (3, 2, 1, "view", '{"other": 1}'),
            (4, 3, 1, "click", '{"k": "not-a-number"}'),
            (5, 4, 1, "click", '{"k": 7}'),
        ],
    )
    got = {
        r.event_type: (r.n_with_key, r.sum_v, r.mean_v_r4)
        for r in event_props_stats(ev).collect()
    }
    assert got == {"view": (2, 30, 15.0), "click": (1, 7, 7.0)}


def test_promo_share_single_pass_broadcast(spark):
    t = load_testdata(spark, SF)
    df = promo_revenue_share(t["lineitem"], t["part"])
    row = df.collect()[0]
    assert 0.0 < row.promo_share_r6 < 1.0
    assert row.promo_revenue_r4 < row.total_revenue_r4
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
    # lineitem must be scanned ONCE (numerator + denominator in one agg);
    # under AQE the string repeats the initial plan — count the final only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 2, plan  # lineitem + part


def test_top_supplier_exact_decimal_argmax(spark):
    t = load_testdata(spark, SF)
    rows = top_supplier(t["supplier"], t["lineitem"]).collect()
    assert len(rows) >= 1
    # cross-check against a window-rank formulation
    ext = F.col("l_extendedprice").cast("decimal(18,6)")
    disc = F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    revs = (
        t["lineitem"]
        .groupBy("l_suppkey")
        .agg(F.sum((ext * disc).cast("decimal(30,12)")).alias("rev"))
        .orderBy(F.desc("rev"))
        .limit(1)
        .collect()
    )
    assert rows[0].s_suppkey == revs[0].l_suppkey


def test_customers_without_recent_orders_anti_join_pushdown(spark):
    t = load_testdata(spark, SF)
    df = customers_without_recent_orders(t["customer"], t["orders"])
    total = df.agg(F.sum("n_customers")).collect()[0][0]
    assert total and total > 0
    plan = _plan(df)
    assert "LeftAnti" in plan
    # the date filter must reach the orders scan, not sit above the join
    scans = plan.split("FileScan")[1:]
    assert any("o_orderdate" in sc.split("ReadSchema")[0] for sc in scans), plan


def test_nation_trade_volume_bidirectional(spark):
    t = load_testdata(spark, "/root/testdata/sf0.01")
    rows = nation_trade_volume(
        t["nation"], t["customer"], t["supplier"], t["orders"], t["lineitem"]
    ).collect()
    dirs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert dirs == {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(r.supp_nation != r.cust_nation for r in rows)
