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


# --- round-3 continuation: attribution / sessions / anomalies / lags ------


def test_attribution_last_touch_credits_prior_click_only(spark):
    # user 1: click(k=7) -> purchase -> click(k=9) -> purchase ;
    # user 2: purchase with no prior click -> NULL campaign bucket
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "click", 0.0, '{"k": 7}'),
            (2, dt.datetime(2024, 1, 1, 0, 0, 5), 1, "purchase", 10.0, "{}"),
            (3, dt.datetime(2024, 1, 1, 0, 0, 9), 1, "click", 0.0, '{"k": 9}'),
            (4, dt.datetime(2024, 1, 1, 0, 0, 12), 1, "purchase", 5.0, "{}"),
            (5, dt.datetime(2024, 1, 1, 0, 0, 1), 2, "purchase", 3.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from userbehavioranalysis_spark.operators.sequences import (
        attribution_last_touch,
    )

    got = {
        r.campaign: (r.n_conversions, r.attributed_value_r2)
        for r in attribution_last_touch(ev).collect()
    }
    assert got == {7: (1, 10.0), 9: (1, 5.0), None: (1, 3.0)}


def test_attribution_tied_timestamp_uses_event_id_order(spark):
    # click and purchase at the SAME timestamp: event_id order decides —
    # click (id 1) precedes purchase (id 2), so the purchase attributes
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1), 1, "click", 0.0, '{"k": 4}'),
            (2, dt.datetime(2024, 1, 1), 1, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from userbehavioranalysis_spark.operators.sequences import (
        attribution_last_touch,
    )

    [row] = attribution_last_touch(ev).collect()
    assert row.campaign == 4 and row.n_conversions == 1


def test_session_paths_gap_split_and_cap(spark):
    rows = [(i, i * 10, 1, "a", "{}") for i in range(12)]  # one long session
    rows.append((100, 10_000, 1, "b", "{}"))  # >30 min later: new session
    ev = _events(spark, rows)
    from userbehavioranalysis_spark.operators.sequences import session_paths

    got = {r.path: (r.rank, r.n_sessions) for r in session_paths(ev).collect()}
    # 12-event session capped at 8 'a's; the lone 'b' is its own session
    assert got == {">".join(["a"] * 8): (1, 1), "b": (2, 1)}


def test_anomaly_zscore_integer_algebra(spark):
    # 24 calm hours (count 2 each) then one 12x spike for type 'a'
    rows = []
    eid = 0
    for h in range(25):
        n = 24 if h == 24 else 2
        for i in range(n):
            rows.append((eid, h * 3600 + i, 1000 + eid, "a", "{}"))
            eid += 1
    ev = _events(spark, rows)
    from userbehavioranalysis_spark.operators.sequences import anomaly_zscore

    [row] = anomaly_zscore(ev).collect()  # only hour 24 has a full window
    assert row.hour_no is not None and row.n_events == 24
    # all-equal trailing counts -> variance 0 -> NULL z, not inf
    assert row.zscore_r4 is None and not row.is_anomaly


def test_anomaly_zscore_flags_spike(spark):
    # alternating 1/3 baseline (variance > 0), then a 50-count spike
    rows = []
    eid = 0
    for h in range(25):
        n = 50 if h == 24 else (1 if h % 2 == 0 else 3)
        for i in range(n):
            rows.append((eid, h * 3600 + i, 1000 + eid, "a", "{}"))
            eid += 1
    ev = _events(spark, rows)
    from userbehavioranalysis_spark.operators.sequences import anomaly_zscore

    [row] = anomaly_zscore(ev).collect()
    assert row.is_anomaly and row.zscore_r4 > 3


def test_time_to_convert_first_click_then_first_purchase(spark):
    ev = _events(
        spark,
        [
            (1, 0, 1, "click", "{}"),
            (2, 60, 1, "purchase", "{}"),
            (3, 600, 1, "purchase", "{}"),  # later purchase ignored (min)
            (4, 100, 2, "purchase", "{}"),  # purchase BEFORE any click
            (5, 200, 2, "click", "{}"),
            (6, 500, 2, "purchase", "{}"),  # 300 s after first click
            (7, 0, 3, "click", "{}"),  # never converts
        ],
    )
    from userbehavioranalysis_spark.operators.sequences import time_to_convert

    [row] = time_to_convert(ev).collect()
    assert row.n_converted == 2
    assert row.p50_r4 == 180.0  # interp between 60 and 300
    assert row.mean_r4 == 180.0


def test_small_quantity_revenue_division_free_boundary(spark):
    part = spark.createDataFrame(
        [(1, "red widget"), (2, "red bolt")], "p_partkey long, p_name string"
    )
    li = spark.createDataFrame(
        [
            # part 1: avg qty = 10; only qty < 2 qualifies
            (1, 1.0, 100.0),
            (1, 19.0, 100.0),
            (1, 10.0, 100.0),
            # boundary: exactly 20% of avg must NOT qualify (strict <)
            (2, 2.0, 70.0),
            (2, 10.0, 70.0),
            (2, 18.0, 70.0),
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    )
    from userbehavioranalysis_spark.plans.relational import (
        small_quantity_revenue,
    )

    [row] = small_quantity_revenue(part, li).collect()
    assert row.n_small_lines == 1
    assert row.avg_yearly_r4 == round(100.0 / 7.0, 4)


def test_sole_returning_supplier_requires_other_suppliers(spark):
    sup = spark.createDataFrame(
        [(1, "s1"), (2, "s2"), (3, "s3")], "s_suppkey long, s_name string"
    )
    li = spark.createDataFrame(
        [
            # order 10: two suppliers, only supplier 1 returned -> counts
            (10, 1, "R"),
            (10, 2, "N"),
            # order 11: single-supplier order -> excluded (n_supp < 2)
            (11, 1, "R"),
            # order 12: both suppliers returned -> excluded (n_ret != 1)
            (12, 1, "R"),
            (12, 3, "R"),
        ],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    from userbehavioranalysis_spark.plans.relational import (
        sole_returning_supplier,
    )

    got = {r.s_suppkey: r.n_sole_return_orders for r in
           sole_returning_supplier(sup, li).collect()}
    assert got == {1: 1}


def test_min_cost_supplier_keeps_all_ties(spark):
    region = spark.createDataFrame([(1, "ASIA")], "r_regionkey long, r_name string")
    nation = spark.createDataFrame(
        [(1, "N1", 1)], "n_nationkey long, n_name string, n_regionkey long"
    )
    sup = spark.createDataFrame(
        [(1, "s1", 1), (2, "s2", 1)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    part = spark.createDataFrame([(5, "p5")], "p_partkey long, p_name string")
    li = spark.createDataFrame(
        [(5, 1, 40.0), (5, 1, 99.0), (5, 2, 40.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    from userbehavioranalysis_spark.plans.relational import min_cost_supplier

    rows = min_cost_supplier(part, sup, nation, region, li).collect()
    assert sorted(r.s_suppkey for r in rows) == [1, 2]
    assert all(r.min_cost_r2 == 40.0 for r in rows)


def test_important_supply_values_threshold_exact(spark):
    nation = spark.createDataFrame(
        [(1, "NATION_1", 1)], "n_nationkey long, n_name string, n_regionkey long"
    )
    sup = spark.createDataFrame(
        [(1, "s1", 1)], "s_suppkey long, s_name string, s_nationkey long"
    )
    # part 1 carries ~99.99% of value, part 2 is below the 0.001% bar
    li = spark.createDataFrame(
        [(1, 1, 1_000_000.0, 0.0), (2, 1, 0.5, 0.0)],
        "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double",
    )
    from userbehavioranalysis_spark.plans.relational import (
        important_supply_values,
    )

    got = {r.l_partkey: r.value_r4 for r in
           important_supply_values(sup, nation, li).collect()}
    assert got == {1: 1_000_000.0}


def test_customer_order_distribution_counts_zero_order_customers(spark):
    cust = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    orders = spark.createDataFrame(
        [(10, 1, "3-MEDIUM"), (11, 1, "3-MEDIUM"), (12, 2, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    from userbehavioranalysis_spark.plans.relational import (
        customer_order_distribution,
    )

    got = {r.c_count: r.custdist for r in
           customer_order_distribution(cust, orders).collect()}
    # cust 1 -> 2 orders; cust 2's only order excluded -> 0; cust 3 -> 0
    assert got == {2: 1, 0: 2}


def test_disjunctive_bracket_revenue_pushes_both_scans(spark):
    t = load_testdata(spark, SF)
    from userbehavioranalysis_spark.plans.relational import (
        disjunctive_bracket_revenue,
    )

    df = disjunctive_bracket_revenue(t["part"], t["lineitem"])
    plan = _plan(df)
    # the OR brackets decompose into per-side pushed scan filters and a
    # single broadcast join -- no union fan-out
    assert "Union" not in plan
    assert plan.count("BroadcastHashJoin") == 1
    scans = [ln for ln in plan.splitlines() if "DataFilters" in ln]
    assert any("l_quantity" in ln for ln in scans)
    assert any("p_brand" in ln and "p_size" in ln for ln in scans)
    [row] = df.collect()
    assert row.n_lines > 0 and row.revenue_r4 > 0


def test_forecast_revenue_change_pushdown_and_decimal_boundary(spark):
    t = load_testdata(spark, SF)
    from userbehavioranalysis_spark.plans.relational import (
        forecast_revenue_change,
    )

    df = forecast_revenue_change(t["lineitem"])
    plan = _plan(df)
    scan = [ln for ln in plan.splitlines() if "DataFilters" in ln][0]
    # year + quantity predicates reach the scan (the decimal band
    # evaluates post-scan on the cast column)
    assert "l_shipdate" in scan and "l_quantity" in scan
    [row] = df.collect()
    assert row.n_lines >= 0


def test_product_type_profit_margin_over_best_price(spark):
    part = spark.createDataFrame([(1, "red widget")], "p_partkey long, p_name string")
    sup = spark.createDataFrame([(5, 7)], "s_suppkey long, s_nationkey int")
    nat = spark.createDataFrame([(7, "N7")], "n_nationkey int, n_name string")
    orders = spark.createDataFrame(
        [(100, "2001-06-01"), (101, "2002-06-01")],
        "o_orderkey long, o_orderdate string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    li = spark.createDataFrame(
        [
            # best observed price for (part 1, supp 5) = 10
            (100, 1, 5, 2.0, 10.0, 0.0),
            (101, 1, 5, 1.0, 30.0, 0.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    from userbehavioranalysis_spark.plans.relational import product_type_profit

    got = {(r.nation, r.o_year): r.profit_r4 for r in
           product_type_profit(part, sup, nat, orders, li).collect()}
    # 2001: rev 10 - cost 10*2 = -10 ; 2002: rev 30 - cost 10*1 = 20
    assert got == {("N7", 2001): -10.0, ("N7", 2002): 20.0}


def test_shipping_delay_priority_counts_window_and_split(spark):
    orders = spark.createDataFrame(
        [(1, "2001-01-01", "1-URGENT"), (2, "2001-01-01", "5-LOW")],
        "o_orderkey long, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    li = spark.createDataFrame(
        [
            (1, "N", "2001-02-15"),   # 45 days -> critical
            (2, "N", "2001-03-01"),   # 59 days -> other
            (1, "N", "2001-01-10"),   # 9 days  -> outside window
            (2, "N", "2001-06-01"),   # 151 days -> outside window
        ],
        "l_orderkey long, l_returnflag string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    from userbehavioranalysis_spark.plans.relational import (
        shipping_delay_priority_counts,
    )

    [row] = shipping_delay_priority_counts(orders, li).collect()
    assert (row.l_returnflag, row.critical_lines, row.other_lines) == ("N", 1, 1)


def test_supplier_counts_excludes_brand_and_blocklisted(spark):
    part = spark.createDataFrame(
        [(1, "Brand#1", 5), (2, "Brand#2", 5)],
        "p_partkey long, p_brand string, p_size int",
    )
    li = spark.createDataFrame(
        # supp 8 all-returns -> blocklisted; supp 9 clean; both trade both parts
        [(1, 8, "R"), (2, 8, "R"), (1, 9, "N"), (2, 9, "N")],
        "l_partkey long, l_suppkey long, l_returnflag string",
    )
    from userbehavioranalysis_spark.plans.relational import (
        supplier_counts_by_part_attrs,
    )

    rows = supplier_counts_by_part_attrs(part, li).collect()
    # Brand#1 excluded entirely; Brand#2 counts only the clean supplier
    assert {(r.p_brand, r.p_size, r.supplier_cnt) for r in rows} == {
        ("Brand#2", 5, 1)
    }


def test_excess_share_suppliers_share_boundary(spark):
    sup = spark.createDataFrame(
        [(1, "s1", 7), (2, "s2", 7)], "s_suppkey long, s_name string, s_nationkey int"
    )
    nat = spark.createDataFrame([(7, "N7")], "n_nationkey int, n_name string")
    part = spark.createDataFrame([(1, "red gear")], "p_partkey long, p_name string")
    li = spark.createDataFrame(
        # supp 1 carries 5%, supp 2 carries 95% of part 1's volume
        [(1, 1, 5.0), (1, 2, 95.0)],
        "l_partkey long, l_suppkey long, l_quantity double",
    )
    from userbehavioranalysis_spark.plans.relational import (
        excess_share_suppliers,
    )

    rows = excess_share_suppliers(sup, nat, part, li).collect()
    assert [(r.s_suppkey, r.supp_nation) for r in rows] == [(2, "N7")]


def test_item_pagerank_matches_exact_integer_iteration(spark):
    from userbehavioranalysis_spark.operators.graph import SCALE, item_pagerank

    # user walks 1->2, 2->1, 1->2, plus user 2 walks 2->3 (3 dangling)
    rows = [
        (1, 0, 1, "view", '{"k": 1}'),
        (2, 1, 1, "view", '{"k": 2}'),
        (3, 2, 1, "view", '{"k": 1}'),
        (4, 3, 1, "view", '{"k": 2}'),
        (5, 0, 2, "view", '{"k": 2}'),
        (6, 1, 2, "view", '{"k": 3}'),
    ]
    ev = _events(spark, rows)
    got = {r.node: r.pr for r in item_pagerank(ev).collect()}

    # replay the SAME integer iteration in plain python
    edges = {(1, 2): 2, (2, 1): 1, (2, 3): 1}
    nodes = [1, 2, 3]
    outw = {1: 2, 2: 2}
    n = len(nodes)
    pr = {v: SCALE // n for v in nodes}
    base = (15 * SCALE) // (100 * n)
    for _ in range(5):
        contrib = {v: 0 for v in nodes}
        for (s, d), w in edges.items():
            contrib[d] += (pr[s] * w) // outw[s]
        pr = {v: base + (85 * contrib[v]) // 100 for v in nodes}
    assert got == pr
    # dangling node 3 only ever receives the base teleport share + inflow
    assert got[3] < got[2] and got[2] > got[1] - SCALE  # sanity


def test_item_pagerank_empty_graph_returns_empty(spark):
    from userbehavioranalysis_spark.operators.graph import item_pagerank

    # single events per user -> no transitions -> no nodes, no crash
    ev = _events(spark, [(1, 0, 1, "view", '{"k": 1}'),
                         (2, 0, 2, "view", '{"k": 2}')])
    assert item_pagerank(ev).collect() == []

