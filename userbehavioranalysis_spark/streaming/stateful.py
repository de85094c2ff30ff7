"""Custom stateful streaming operators (SURVEY §2.7 C1-C5 streaming
forms) via ``applyInPandasWithState``.

The reference implements these with Flink keyed state + timers
(`LoginFail.scala:51-105`, `OrderTimeoutWithoutCep.scala:33-97`,
`AdStatisticsByGeo.scala:59-101`); the Spark-native equivalent is a
grouped-state pandas function: per key the runtime hands us the
micro-batch's rows (Arrow batches) plus a persistent state handle with
an optional event-time timeout — the same {ValueState, timer} toolkit,
minus hand-rolled serialization.

Batch forms in ``operators/`` are the semantic oracles; tests replay
the same fixtures through these and compare.

Scale: state lives in the state store (RocksDB-backed on a real
cluster), partitioned by the group key — the same key-sharding Flink
uses; watermark-driven timeouts bound state growth exactly as the
reference's timers do.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LOGIN_WARN_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_fail_ts_us", LongType()),
        StructField("last_fail_ts_us", LongType()),
        StructField("warning_msg", StringType()),
    ]
)
_LOGIN_STATE = StructType(
    [StructField("prev_type", StringType()), StructField("prev_ts_us", LongType())]
)


def login_fail_stateful(
    events: DataFrame,
    max_gap_seconds: int,
    fail_type: str = "error",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming strict-contiguity login-fail detection (C1/C2).

    State per user: the previous event (type + time) — exactly the
    reference's ListState holding the last fail (`LoginFail.scala:53`),
    generalized to remember successes so strict contiguity survives
    batch boundaries.  Emits one warning per qualifying consecutive
    fail pair.
    """
    gap_us = max_gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        prev_type, prev_ts = state.get if state.exists else (None, None)
        frames = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # event_id tie-break keeps same-timestamp ordering identical
            # to the batch operator's window ORDER BY (ts, event_id)
            by = ["ts", "event_id"] if "event_id" in pdf.columns else ["ts"]
            pdf = pdf.sort_values(by)
            ts_us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).to_numpy()
            etype = pdf["event_type"].to_numpy()
            # vectorized lag: row 0 compares against carried state
            prev_t = np.concatenate(([prev_type or ""], etype[:-1]))
            # sentinel far in the past (not int64-min: the lag subtraction
            # must not overflow; the type check alone already rejects row 0)
            prev_u = np.concatenate(
                ([prev_ts if prev_ts is not None else -(10**15)], ts_us[:-1])
            )
            hit = (etype == fail_type) & (prev_t == fail_type) & (ts_us - prev_u <= gap_us)
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": key[0],
                        "first_fail_ts_us": prev_u[hit],
                        "last_fail_ts_us": ts_us[hit],
                        "warning_msg": "login fail!",
                    }
                )
            )
            prev_type, prev_ts = str(etype[-1]), int(ts_us[-1])
        state.update((prev_type, prev_ts))
        yield pd.concat(frames) if frames else pd.DataFrame(
            columns=["user_id", "first_fail_ts_us", "last_fail_ts_us", "warning_msg"]
        )

    # project to the columns the kernel reads BEFORE the state exchange:
    # the events stream carries a fat JSON `props` string (and `value`)
    # that would otherwise ride through Arrow into every pandas group
    keep = [c for c in ("user_id", "ts", "event_type", "event_id") if c in events.columns]
    return (
        events.select(*keep)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, LOGIN_WARN_SCHEMA, _LOGIN_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


ORDER_RESULT_SCHEMA = StructType(
    [
        StructField("order_id", LongType()),
        StructField("result_msg", StringType()),
        StructField("is_timeout", BooleanType()),
    ]
)
_ORDER_STATE = StructType(
    [StructField("create_ts_us", LongType()), StructField("pay_ts_us", LongType())]
)


def order_timeout_stateful(
    events: DataFrame,
    timeout_seconds: int,
    key_col: str = "user_id",
    create_type: str = "signup",
    pay_type: str = "purchase",
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming order-timeout monitor (C3/C4).

    State per order key: (create_ts, pay_ts) as seen so far.  Immediate
    outcomes emit when the second side arrives (handles pay-before-
    create, `OrderTimeoutWithoutCep.scala:59-81`); never-completed
    orders emit via the event-time timeout — the ``registerTimer``
    equivalent (`OrderTimeoutWithoutCep.scala:56`).
    """
    timeout_us = timeout_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            create_ts, pay_ts = state.get if state.exists else (None, None)
            state.remove()
            if create_ts is not None and pay_ts is None:
                yield pd.DataFrame(
                    [(key[0], "order timeout", True)],
                    columns=["order_id", "result_msg", "is_timeout"],
                )
            elif pay_ts is not None and create_ts is None:
                yield pd.DataFrame(
                    [(key[0], "already payed but not found create log", True)],
                    columns=["order_id", "result_msg", "is_timeout"],
                )
            return

        create_ts, pay_ts = state.get if state.exists else (None, None)
        out = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            # vectorized "first create / first pay in ts order" — the
            # iterrows() equivalent is per-row Python and dominates the
            # replay's runtime at thousands of keyed groups
            import numpy as np

            pdf = pdf.sort_values("ts")
            ts_us = (pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000).to_numpy()
            et = pdf["event_type"].to_numpy()
            if create_ts is None:
                idx = np.flatnonzero(et == create_type)
                if idx.size:
                    create_ts = int(ts_us[idx[0]])
            if pay_ts is None:
                idx = np.flatnonzero(et == pay_type)
                if idx.size:
                    pay_ts = int(ts_us[idx[0]])
        if create_ts is not None and pay_ts is not None:
            ok = pay_ts <= create_ts + timeout_us
            out.append(
                (
                    key[0],
                    "payed successfully" if ok else "payed but already timeout",
                    not ok,
                )
            )
            state.remove()
        elif create_ts is not None or pay_ts is not None:
            state.update((create_ts, pay_ts))
            # timer at first-event + timeout, like the reference's
            # eventTime timer; expressed as an event-time timeout ts.
            # Spark rejects a timeout at/below the current watermark
            # (query-fatal), which can happen when the first event for an
            # order arrives very late — clamp to watermark + 1ms so the
            # order still gets classified on the next watermark advance.
            base = create_ts if create_ts is not None else pay_ts
            timer_ms = (base + timeout_us) // 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timer_ms, wm_ms + 1))
        yield pd.DataFrame(out, columns=["order_id", "result_msg", "is_timeout"])

    # kernel reads only (key, ts, event_type) — drop everything else
    # before the state exchange (see login_fail_stateful note)
    keep = [c for c in (key_col, "ts", "event_type") if c in events.columns]
    return (
        events.select(*keep)
        .withWatermark("ts", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            ORDER_RESULT_SCHEMA,
            _ORDER_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


BLACKLIST_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("seq", IntegerType()),
        StructField("is_warning", BooleanType()),
    ]
)
_BL_STATE = StructType(
    [
        StructField("day_start", LongType()),
        StructField("cnt", LongType()),
        StructField("warned", BooleanType()),
    ]
)


def blacklist_stateful(
    events: DataFrame,
    threshold: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming click-fraud filter (C5).

    Per-user keyed state holding (current day, count, warned): events
    1..threshold of a day pass through (is_warning=false); the crossing
    event emits one warning row (is_warning=true, the
    ``isSentBlackList`` latch) and further same-day events are
    suppressed; a new day resets the counter — exactly the reference's
    one-keyed-state-plus-midnight-reset shape
    (`AdStatisticsByGeo.scala:61-75,93-100`), with the event-time
    calendar day replacing the processing-time timer (SURVEY §7.3.4).

    Keying by user (not (user, day)) matters operationally: state
    cardinality and python-group invocations stay O(users) instead of
    O(users × days) — on the sf0.1 replay that is 27× fewer Arrow
    round-trips.  Day progression is forward-only (the reference's
    midnight timer can't resurrect yesterday's counter either).
    Callers split pass-through vs warnings with ``jobs.split_by_tag``
    on ``is_warning``.
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        day, cnt, warned = state.get if state.exists else (None, 0, False)
        frames = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            days = (
                pdf["ts"].astype("datetime64[ns]").astype("int64")
                // (86_400 * 10**9) * 86_400
            ).to_numpy()
            eids = pdf["event_id"].to_numpy()
            cuts = np.flatnonzero(np.diff(days)) + 1
            for seg in np.split(np.arange(len(days)), cuts):
                d = int(days[seg[0]])
                if day is None or d > day:
                    day, cnt, warned = d, 0, False
                # d < day: late event from an already-closed day (allowed
                # by the watermark across micro-batches).  The reference's
                # midnight timer has already cleared that day's counter,
                # so the late click counts against the CURRENT day's
                # counter — never resurrect or reset to the old day.
                seg_eids = eids[seg]
                n_pass = max(0, min(threshold - cnt, len(seg_eids)))
                if n_pass:
                    frames.append(
                        pd.DataFrame(
                            {
                                "user_id": key[0],
                                "event_id": seg_eids[:n_pass],
                                "seq": range(cnt + 1, cnt + n_pass + 1),
                                "is_warning": False,
                            }
                        )
                    )
                    cnt += n_pass
                if len(seg_eids) > n_pass and not warned:
                    warned = True
                    frames.append(
                        pd.DataFrame(
                            {
                                "user_id": [key[0]],
                                "event_id": [int(seg_eids[n_pass])],
                                "seq": [cnt + 1],
                                "is_warning": [True],
                            }
                        )
                    )
        state.update((day, cnt, warned))
        yield pd.concat(frames) if frames else pd.DataFrame(
            columns=["user_id", "event_id", "seq", "is_warning"]
        )

    # kernel reads only (user_id, ts, event_id) — drop everything else
    # before the state exchange (see login_fail_stateful note)
    keep = [c for c in ("user_id", "ts", "event_id") if c in events.columns]
    return (
        events.select(*keep)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, BLACKLIST_SCHEMA, _BL_STATE, "append", GroupStateTimeout.NoTimeout
        )
    )


ATTRIBUTION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_us", LongType()),
        StructField("campaign", LongType()),
        StructField("value", DoubleType()),
    ]
)
_ATTR_STATE = StructType([StructField("campaign", LongType())])


def attribution_stateful(
    events: DataFrame, watermark: str = "10 seconds"
) -> DataFrame:
    """Streaming last-touch attribution: per-user keyed state carries
    the most recent click's campaign across micro-batches; every
    purchase emits an attributed row the moment it arrives — the
    streaming form of ``operators/sequences.attribution_last_touch``
    (Flink's RichFlatMap + ValueState enrichment shape, the C-family
    toolkit applied to marketing attribution).

    State per user is ONE long (the campaign) — last-value state never
    grows with traffic, so no timeout is needed for boundedness.  The
    campaign extraction happens JVM-side BEFORE the state exchange
    (the kernel never sees the fat ``props`` string), and the kernel
    is a vectorized pandas forward-fill, not a row loop.

    Ordering contract (same as the reference's keyed-state operators
    and this module's other kernels): events sort by (ts, event_id)
    WITHIN each micro-batch, and batches are assumed event-time
    monotone per key up to the watermark — a click arriving in a later
    batch but event-time-earlier than an already-attributed purchase
    does not retro-attribute it (Flink's ValueState enrichment behaves
    identically; only a watermark-buffered variant could reorder).
    """

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (carried,) = state.get if state.exists else (None,)
        frames = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
            ).to_numpy()
            # clicks expose their campaign; everything else is NaN, so a
            # forward-fill seeded with the carried state reproduces the
            # batch `last(campaign, ignorenulls) ROWS ... 1 PRECEDING`
            # frame exactly (a click's own row is never a purchase, and
            # null-campaign clicks stay transparent, as ignorenulls does)
            camp = pdf["campaign"].where(pdf["event_type"].eq("click"))
            camp = (
                pd.concat(
                    [pd.Series([carried], dtype="float64"), camp.astype("float64")],
                    ignore_index=True,
                )
                .ffill()
                .iloc[1:]
                .to_numpy()
            )
            hit = pdf["event_type"].eq("purchase").to_numpy()
            frames.append(
                pd.DataFrame(
                    {
                        "user_id": key[0],
                        "purchase_us": ts_us[hit],
                        "campaign": pd.array(
                            [None if c != c else int(c) for c in camp[hit]],
                            dtype="Int64",
                        ),
                        "value": pdf["value"].to_numpy()[hit],
                    }
                )
            )
            last = camp[-1]
            carried = None if last != last else int(last)
        state.update((carried,))
        # yield only real rows: an explicit empty frame would make the
        # runtime's cross-group concat infer dtypes from all-NA columns
        # (deprecated in pandas 2); yielding nothing is the clean path
        frames = [f for f in frames if len(f)]
        if frames:
            yield pd.concat(frames, ignore_index=True)

    from pyspark.sql import functions as F

    pre = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").try_cast("long").alias("campaign"),
    )
    return (
        pre.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            ATTRIBUTION_SCHEMA,
            _ATTR_STATE,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
