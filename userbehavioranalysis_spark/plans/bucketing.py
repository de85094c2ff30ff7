"""Bucketed co-located joins — the repeated-join scale posture.

The reference hash-partitions per job run (`keyBy`, e.g.
`TxMacthDetect.scala:30`) — every execution pays the full shuffle.  At
100 TB, a fact table that joins on the same key in many pipelines
(events by user_id, lineitem by orderkey) should be **bucketed on
disk** once: `bucketBy(n, key)` makes every subsequent equi-join or
aggregation on that key exchange-free — Catalyst proves both sides
share the output partitioning and plans a SortMergeJoin with *no
Exchange on either side* (zero shuffle, the dominant cost at scale).

Guidance: pick n_buckets ≈ cluster cores × small factor so one bucket
is one task; both join sides must use the same bucket count (or an
integer multiple, which Spark coalesces).  Regression-tested in
tests/test_plans.py: the bucketed join plan must contain no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally
    sorted) by ``keys`` — the write-once cost that removes the join
    shuffle from every later read."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two tables bucketed on ``on`` — plans with no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
