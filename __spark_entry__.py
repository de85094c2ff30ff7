"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``userbehavioranalysis_spark``; this module is
a thin adapter re-exporting its query/oracle registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hot-items top-3 per
    sliding 1h/5min window (the reference's headline analytic,
    HotItems.scala:29)."""
    from userbehavioranalysis_spark.registry import QUERIES

    return QUERIES["hot_items"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from userbehavioranalysis_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query (omitted entries get a
    rows-only check: approximate/streaming-native ops)."""
    from userbehavioranalysis_spark.registry import ORACLES

    return dict(ORACLES)
