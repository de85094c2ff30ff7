"""Two-stream reconciliation (SURVEY §2.6 J1/J2).

The reference reconciles pay events with receipt events two ways:

- ``TxMatchByJoin.scala:36-43`` (J1) — a Flink **interval join**:
  ``orders.intervalJoin(receipts).between(-5s, +5s)`` equi-keyed on
  txId, inner semantics, emitting matched pairs.
- ``TxMacthDetect.scala:42-98`` (J2) — a ``connect`` + CoProcessFunction
  holding whichever side arrives first in ``ValueState``; unmatched
  sides surface on an event-time timer via two side outputs
  (`unmatchedPays` / `unmatchedReceipts`).

Spark-first:

- J1 is an **equi join with a time-range residual**: Catalyst plans a
  SortMergeJoin (or broadcast, if one side is small) on the equi key
  and applies the range predicate as a join residual — the same
  hash-partition-by-key + per-key time matching the interval join does,
  but spillable and AQE-skew-aware.  No custom operator needed.
- J2's whole state machine collapses, in batch, to a **full outer join
  + CASE classification** — the "whichever side is missing" logic is
  exactly what outer-join nulls encode.  The side outputs become a
  ``match_tag`` discriminator column (SURVEY §1.5's OutputTag mapping);
  callers split with filters and Catalyst reuses the join.

Testdata mapping: 'purchase' events play pays; 'click' events play
receipts; the equi key is (user_id [, hour bucket]) since the testdata
has no transaction id.  Semantics — keyed equi match within a time
bound, inner for J1, full-outer classification for J2 — are the
reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAG_MATCHED = "matched"
TAG_UNMATCHED_PAY = "unmatched_pay"
TAG_UNMATCHED_RECEIPT = "unmatched_receipt"


def interval_join_pairs(
    pays: DataFrame,
    receipts: DataFrame,
    key_col: str,
    bound_seconds: int,
    ts_col: str = "ts",
) -> DataFrame:
    """J1: inner equi+range join emitting matched (pay, receipt) pairs.

    ``receipt.ts ∈ [pay.ts - bound, pay.ts + bound]`` per the
    reference's ``between(Time.seconds(-5), Time.seconds(5))``
    (`TxMatchByJoin.scala:37`).
    """
    p = pays.select(
        F.col(key_col).alias("key"),
        F.col("event_id").alias("pay_event_id"),
        F.unix_micros(F.col(ts_col)).alias("pay_ts_us"),
    )
    r = receipts.select(
        F.col(key_col).alias("r_key"),
        F.col("event_id").alias("receipt_event_id"),
        F.unix_micros(F.col(ts_col)).alias("receipt_ts_us"),
    )
    bound_us = bound_seconds * 1_000_000
    joined = p.join(
        r,
        (p["key"] == r["r_key"])
        & (r["receipt_ts_us"] >= p["pay_ts_us"] - bound_us)
        & (r["receipt_ts_us"] <= p["pay_ts_us"] + bound_us),
        "inner",
    )
    return joined.select(
        F.col("key").alias(key_col),
        "pay_event_id",
        "pay_ts_us",
        "receipt_event_id",
        "receipt_ts_us",
    )


def reconcile_full_outer(
    pays: DataFrame,
    receipts: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """J2: full-outer reconciliation with match classification.

    Both sides are pre-aggregated per key (count + first event time) so
    the join is 1:1 per key — the reference's per-txId ValueState holds
    at most one event per side too (`TxMacthDetect.scala:54-55`).
    Returns (*key_cols, pay_count, receipt_count, pay_ts_us,
    receipt_ts_us, match_tag).
    """
    p = pays.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("pay_count"),
        F.min(F.unix_micros(F.col(ts_col))).alias("pay_ts_us"),
    )
    r = receipts.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("receipt_count"),
        F.min(F.unix_micros(F.col(ts_col))).alias("receipt_ts_us"),
    )
    joined = p.join(r, on=key_cols, how="full_outer")
    tag = (
        F.when(
            F.col("pay_count").isNotNull() & F.col("receipt_count").isNotNull(),
            F.lit(TAG_MATCHED),
        )
        .when(F.col("pay_count").isNotNull(), F.lit(TAG_UNMATCHED_PAY))
        .otherwise(F.lit(TAG_UNMATCHED_RECEIPT))
    )
    return joined.select(
        *key_cols,
        F.coalesce(F.col("pay_count"), F.lit(0)).alias("pay_count"),
        F.coalesce(F.col("receipt_count"), F.lit(0)).alias("receipt_count"),
        "pay_ts_us",
        "receipt_ts_us",
        tag.alias("match_tag"),
    )
