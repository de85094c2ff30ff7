"""Semantic edge cases for the detection family (SURVEY §5's property
list: window boundaries, contiguity, pay-before-create, threshold edge).
"""

import pyspark.sql.functions as F

from userbehavioranalysis_spark.operators.blacklist import (
    blacklist_filter,
    blacklist_warnings,
)
from userbehavioranalysis_spark.operators.login_fail import login_fail_warnings
from userbehavioranalysis_spark.operators.order_timeout import (
    MSG_NO_CREATE,
    MSG_PAYED,
    MSG_PAYED_TIMEOUT,
    MSG_TIMEOUT,
    order_timeout_results,
)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, epoch_seconds)"""
    df = spark.createDataFrame(
        [(e, u, t, s) for e, u, t, s in rows],
        "event_id long, user_id long, event_type string, sec long",
    )
    return df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")


def test_login_fail_strict_broken_by_intervening_success(spark):
    # fail, success, fail within 2s: strict (CEP `next`) must NOT fire,
    # relaxed (`followedBy`) must fire — LoginFailWithCep.scala:31 vs C3.
    ev = _events(
        spark,
        [(1, 1, "error", 100), (2, 1, "view", 101), (3, 1, "error", 102)],
    )
    strict = login_fail_warnings(ev, 10, strict=True).collect()
    relaxed = login_fail_warnings(ev, 10, strict=False).collect()
    assert strict == []
    assert len(relaxed) == 1


def test_login_fail_chained_pairs(spark):
    # 3 consecutive fails -> 2 warnings (LoginFail.scala:67-83 pair chain)
    ev = _events(
        spark,
        [(1, 1, "error", 100), (2, 1, "error", 101), (3, 1, "error", 102)],
    )
    assert login_fail_warnings(ev, 10, strict=True).count() == 2


def test_login_fail_gap_bound_inclusive(spark):
    ev = _events(spark, [(1, 1, "error", 100), (2, 1, "error", 105)])
    assert login_fail_warnings(ev, 5, strict=True).count() == 1  # exactly at bound
    assert login_fail_warnings(ev, 4, strict=True).count() == 0


def test_order_timeout_four_outcomes(spark):
    ev = _events(
        spark,
        [
            # user 1: create then pay in time
            (1, 1, "signup", 100), (2, 1, "purchase", 200),
            # user 2: create then pay too late
            (3, 2, "signup", 100), (4, 2, "purchase", 100 + 1000),
            # user 3: create, never pays
            (5, 3, "signup", 100),
            # user 4: pay with no create
            (6, 4, "purchase", 150),
        ],
    )
    res = {
        r["user_id"]: r["result_msg"]
        for r in order_timeout_results(ev, 900, key_cols=["user_id"]).collect()
    }
    assert res == {1: MSG_PAYED, 2: MSG_PAYED_TIMEOUT, 3: MSG_TIMEOUT, 4: MSG_NO_CREATE}


def test_order_timeout_pay_before_create(spark):
    # aggregation is arrival-order-insensitive: pay-before-create (the
    # case OrderTimeoutWithoutCep.scala:59-81 needed extra state for)
    ev = _events(spark, [(1, 1, "purchase", 150), (2, 1, "signup", 100)])
    [r] = order_timeout_results(ev, 900, key_cols=["user_id"]).collect()
    assert r["result_msg"] == MSG_PAYED


def test_blacklist_threshold_edge(spark):
    # exactly-threshold count passes all events and emits no warning;
    # threshold+1 suppresses the extra and emits exactly one warning
    day = 86400
    rows = [(i, 1, "click", 100 + i) for i in range(5)]  # user1: 5 events
    rows += [(10 + i, 2, "click", 100 + i) for i in range(6)]  # user2: 6
    rows += [(20, 2, "click", day + 50)]  # next day: counter resets
    ev = _events(spark, rows)
    passed = blacklist_filter(ev, threshold=5)
    warns = blacklist_warnings(ev, threshold=5)
    by_user = {
        (r["user_id"], r["day_start"]): r["total_count"] for r in warns.collect()
    }
    assert by_user == {(2, 0): 6}  # one warning, first day only
    # user2 passes 5 of 6 on day 0, plus the day-1 event (reset)
    u2 = [r for r in passed.collect() if r["user_id"] == 2]
    assert len(u2) == 6
    assert sorted(r["event_id"] for r in u2) == [10, 11, 12, 13, 14, 20]
