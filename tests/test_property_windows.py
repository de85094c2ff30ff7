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
