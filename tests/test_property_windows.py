"""Property tests (SURVEY §5.3): window assignment invariants.

The pane decomposition in ``sliding_counts`` must be byte-identical to
``F.window``'s per-row expansion for *any* input — hypothesis drives
random event sets (including boundary timestamps: exactly on a window
edge, negative-epoch, far-future) through both forms and diffs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from userbehavioranalysis_spark.functions.time import window_bounds
from userbehavioranalysis_spark.operators.windowed_counts import sliding_counts

# timestamps across several windows incl. exact boundary multiples
_TS = st.integers(min_value=0, max_value=30_000)
_KEY = st.sampled_from(["a", "b", "c"])


def _f_window_reference(df, keys, window, slide, ts_col, alias):
    """The built-in F.window expansion — the semantic reference."""
    return window_bounds(
        df.groupBy(F.window(ts_col, window, slide), *keys).agg(
            F.count(F.lit(1)).alias(alias)
        ),
        [*keys, alias],
    )


@given(rows=st.lists(st.tuples(_TS, _KEY), min_size=1, max_size=60))
@settings(max_examples=12, deadline=None)
def test_pane_decomposition_matches_f_window(spark, rows):
    df = spark.createDataFrame(
        [(ts, k) for ts, k in rows], "sec long, key string"
    ).withColumn("ts", F.timestamp_seconds("sec"))
    # 1h/2min = ratio 30 > threshold: forces the pane path
    got = {
        (r.window_start, r.window_end, r.key, r.cnt)
        for r in sliding_counts(df, ["key"], "1 hour", "2 minutes", "ts", "cnt").collect()
    }
    want = {
        (r.window_start, r.window_end, r.key, r.cnt)
        for r in _f_window_reference(df, ["key"], "1 hour", "2 minutes", "ts", "cnt").collect()
    }
    assert got == want


def test_boundary_event_belongs_to_window_starting_at_it(spark):
    """An event exactly on a slide boundary starts a window there and is
    excluded from the window ending there ((t-size, t] assignment)."""
    df = spark.createDataFrame([(7200,)], "sec long").withColumn(
        "ts", F.timestamp_seconds("sec")
    )
    rows = sliding_counts(df, [], "1 hour", "2 minutes", "ts", "cnt").collect()
    starts = {r.window_start for r in rows}
    assert 7200 in starts  # window starting exactly at t
    assert 7200 - 3600 not in starts  # window (3600, 7200] ... start 3600 excluded
    assert min(starts) == 7200 - 3600 + 120
    assert len(rows) == 30


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["hot", "k2"]), st.integers(0, 40)),
        min_size=1,
        max_size=80,
    )
)
@settings(max_examples=10, deadline=None)
def test_salted_distinct_count_is_exact(spark, rows):
    """The derived-salt two-stage distinct must equal the plain
    countDistinct for any input, including heavy single-key skew."""
    from userbehavioranalysis_spark.operators.skew import salted_distinct_count

    df = spark.createDataFrame(rows, "key string, val long")
    got = {
        (r.key, r.distinct_count)
        for r in salted_distinct_count(df, ["key"], "val", n_salt=4).collect()
    }
    want = {
        (r.key, r.dc)
        for r in df.groupBy("key").agg(F.countDistinct("val").alias("dc")).collect()
    }
    assert got == want


@given(
    pays=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 50)), max_size=15),
    receipts=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 50)), max_size=15),
)
@settings(max_examples=10, deadline=None)
def test_interval_join_matches_brute_force(spark, pays, receipts):
    """J1 equi+range join vs a python nested loop, any input."""
    from userbehavioranalysis_spark.operators.tx_match import interval_join_pairs

    def mk(rows, base):
        return spark.createDataFrame(
            [(base + i, k, s) for i, (k, s) in enumerate(rows)],
            "event_id long, user_id long, sec long",
        ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")

    p_df, r_df = mk(pays, 100), mk(receipts, 900)
    got = {
        (r.pay_event_id, r.receipt_event_id)
        for r in interval_join_pairs(
            p_df, r_df, key_col="user_id", bound_seconds=5
        ).collect()
    }
    want = {
        (100 + i, 900 + j)
        for i, (pk, ps) in enumerate(pays)
        for j, (rk, rs) in enumerate(receipts)
        if pk == rk and abs(rs - ps) <= 5
    }
    assert got == want


@given(
    events=st.lists(
        st.tuples(st.sampled_from(["signup", "purchase", "view"]), st.integers(0, 100)),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=10, deadline=None)
def test_order_timeout_classification_matches_python(spark, events):
    """C3/C4 four-outcome classification vs a python oracle, any event mix."""
    from userbehavioranalysis_spark.operators.order_timeout import (
        order_timeout_results,
    )

    df = spark.createDataFrame(
        [(i, 1, t, s) for i, (t, s) in enumerate(events)],
        "event_id long, user_id long, event_type string, sec long",
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    rows = order_timeout_results(df, timeout_seconds=10, key_cols=["user_id"]).collect()

    create = min((s for t, s in events if t == "signup"), default=None)
    pay = min((s for t, s in events if t == "purchase"), default=None)
    if create is None and pay is None:
        assert rows == []
        return
    if create is not None and pay is not None:
        want = "payed successfully" if pay <= create + 10 else "payed but already timeout"
    elif create is not None:
        want = "order timeout"
    else:
        want = "already payed but not found create log"
    assert len(rows) == 1 and rows[0].result_msg == want
    assert rows[0].is_timeout == (want != "payed successfully")


# --- as-of join vs brute-force python oracle ---------------------------

_AKEY = st.sampled_from(["k1", "k2"])
_ATS = st.integers(min_value=0, max_value=50)


@given(
    lefts=st.lists(st.tuples(_AKEY, _ATS), min_size=1, max_size=25),
    rights=st.lists(st.tuples(_AKEY, _ATS, st.integers(0, 99)), max_size=25),
)
@settings(max_examples=10, deadline=None)
def test_as_of_join_matches_bruteforce(spark, lefts, rights):
    from userbehavioranalysis_spark.operators.asof import as_of_join

    # unique right (key, ts) so 'latest' is well-defined (operator contract)
    rmap = {}
    for k, ts, v in rights:
        rmap[(k, ts)] = max(v, rmap.get((k, ts), -1))
    rrows = [(k, ts, v) for (k, ts), v in rmap.items()]

    left = spark.createDataFrame(lefts, "k string, ts long")
    right = spark.createDataFrame(
        rrows or [("zz", -10**6, -1)], "k string, ts long, v long"
    )
    got = sorted(
        (r["k"], r["ts"], r["ts_asof"], r["v_asof"])
        for r in as_of_join(left, right, keys=["k"]).collect()
    )
    exp = []
    for k, ts in lefts:
        cands = [(rts, v) for (rk, rts), v in rmap.items() if rk == k and rts <= ts]
        if not rrows:
            cands = []
        best = max(cands) if cands else (None, None)
        exp.append((k, ts, best[0], best[1]))
    assert got == sorted(exp)


# --- round-3 continuation properties -------------------------------------

_EVT = st.sampled_from(["click", "purchase", "view"])
_CAMP = st.one_of(st.none(), st.integers(min_value=0, max_value=3))


@given(
    rows=st.lists(
        st.tuples(_TS, st.sampled_from([1, 2]), _EVT, _CAMP),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=10, deadline=None)
def test_attribution_matches_python_reference(spark, rows):
    """attribution_last_touch vs a direct per-user walk, for any event
    set — covers null campaigns, tied handling via unique event_ids,
    and purchases with no prior click."""
    import json

    from userbehavioranalysis_spark.operators.sequences import (
        attribution_last_touch,
    )

    data = [
        (
            i,
            ts,
            uid,
            evt,
            1.0,
            json.dumps({} if camp is None else {"k": camp}),
        )
        for i, (ts, uid, evt, camp) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        [(i, ts, u, e, v, p) for i, ts, u, e, v, p in data],
        "event_id long, sec long, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")

    # python reference: walk each user's (ts, event_id)-ordered events
    expect: dict = {}
    per_user: dict = {}
    for i, (ts, uid, evt, camp) in enumerate(rows):
        per_user.setdefault(uid, []).append((ts, i, evt, camp))
    for uid, evs in per_user.items():
        last = None
        for ts, i, evt, camp in sorted(evs):
            if evt == "purchase":
                n, v = expect.get(last, (0, 0.0))
                expect[last] = (n + 1, v + 1.0)
            if evt == "click" and camp is not None:
                last = camp
    got = {
        r.campaign: (r.n_conversions, r.attributed_value_r2)
        for r in attribution_last_touch(df).collect()
    }
    assert got == {k: (n, round(v, 2)) for k, (n, v) in expect.items()}


@given(
    counts=st.lists(st.integers(min_value=0, max_value=50), min_size=26, max_size=40)
)
@settings(max_examples=10, deadline=None)
def test_zscore_matches_numpy(spark, counts):
    """zscore_over_hourly vs numpy mean/std over each trailing window."""
    import math

    from userbehavioranalysis_spark.operators.sequences import zscore_over_hourly

    hourly = spark.createDataFrame(
        [("a", h, int(c)) for h, c in enumerate(counts)],
        "event_type string, hour_no long, n_events long",
    )
    got = {r.hour_no: (r.zscore_r4, r.is_anomaly) for r in
           zscore_over_hourly(hourly).collect()}
    for h in range(24, len(counts)):
        prev = counts[h - 24 : h]
        mean = sum(prev) / 24
        var = sum((x - mean) ** 2 for x in prev) / 24
        if var == 0:
            assert got[h] == (None, False)
        else:
            z = (counts[h] - mean) / math.sqrt(var)
            assert got[h][0] is not None
            assert abs(got[h][0] - z) < 1e-3, (h, got[h], z)
            assert got[h][1] == (abs(round(z, 4)) >= 3.0) or abs(abs(z) - 3) < 1e-3
