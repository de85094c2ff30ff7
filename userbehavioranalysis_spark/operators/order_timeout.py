"""Order create→pay timeout monitoring (SURVEY §2.7 C3/C4).

The reference's richest variant (`OrderTimeoutWithoutCep.scala:33-97`,
the canonical spec per SURVEY C4) tracks each order with keyed
``ValueState`` + an event-time timer and classifies it into four
outcomes; the CEP variant (`OrderTimeout.scala:33-44`) covers two of
them via ``begin(create).followedBy(pay).within(15 min)`` with a
timeout side output.

Batch-declaratively the whole NFA is one conditional aggregation per
order key — ``min(ts) FILTER (create)`` vs ``min(ts) FILTER (pay)`` —
followed by a CASE classification.  One shuffle, partial aggregation
map-side, no state, no timers; handles pay-before-create arrival for
free because aggregation is order-insensitive (exactly the case the
reference needed extra state for, `OrderTimeoutWithoutCep.scala:59-81`).

The four outcome messages are the reference's, verbatim
(`OrderTimeoutWithoutCep.scala:49,66,69,88`).  The "side output" is the
``is_timeout`` discriminator column; callers split with two filters
(SURVEY §1.5's OutputTag mapping).

Testdata mapping: the events stream has no order lifecycle, so the
order key is the user and 'signup'/'purchase' play 'create'/'pay'; the
timeout bound is parameterized (reference: 15 min).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MSG_PAYED = "payed successfully"
MSG_PAYED_TIMEOUT = "payed but already timeout"
MSG_TIMEOUT = "order timeout"
MSG_NO_CREATE = "already payed but not found create log"


def order_timeout_results(
    events: DataFrame,
    timeout_seconds: int,
    key_cols: list[str] | None = None,
    create_type: str = "signup",
    pay_type: str = "purchase",
    ts_col: str = "ts",
) -> DataFrame:
    """Classify every order key into the reference's four outcomes.

    Returns (*key_cols, create_ts_us, pay_ts_us, result_msg, is_timeout);
    ts columns are nullable epoch-microsecond bigints.  ``key_cols``
    defaults to ``["user_id"]``; the reference keys by orderId — any
    column set identifying one order lifecycle works.
    """
    key_cols = key_cols or ["user_id"]
    relevant = events.filter(F.col("event_type").isin(create_type, pay_type))
    per_key = relevant.groupBy(*key_cols).agg(
        F.min(
            F.when(F.col("event_type") == create_type, F.unix_micros(F.col(ts_col)))
        ).alias("create_ts_us"),
        F.min(
            F.when(F.col("event_type") == pay_type, F.unix_micros(F.col(ts_col)))
        ).alias("pay_ts_us"),
    )
    timeout_us = timeout_seconds * 1_000_000
    msg = (
        F.when(
            F.col("create_ts_us").isNotNull() & F.col("pay_ts_us").isNotNull(),
            F.when(
                F.col("pay_ts_us") <= F.col("create_ts_us") + timeout_us,
                F.lit(MSG_PAYED),
            ).otherwise(F.lit(MSG_PAYED_TIMEOUT)),
        )
        .when(F.col("create_ts_us").isNotNull(), F.lit(MSG_TIMEOUT))
        .otherwise(F.lit(MSG_NO_CREATE))
    )
    return per_key.select(
        *key_cols,
        "create_ts_us",
        "pay_ts_us",
        msg.alias("result_msg"),
        (msg != MSG_PAYED).cast("boolean").alias("is_timeout"),
    )
