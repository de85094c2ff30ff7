"""Registry infrastructure: the QUERIES/ORACLES dicts, the ``@query``
decorator, and the shared per-session caches every family module uses.

Family modules (behavior, reference, dedup, ann, text, multimodal,
relational, streaming) import from here and register themselves as a
side effect of being imported by ``registry/__init__``; nothing in this
module imports a family module, so the package initializes in one pass.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from userbehavioranalysis_spark.sources.readers import events_with_item, load_testdata

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# DataFrame plans are cheap but not free: building them re-lists the
# parquet dir and infers 9 table schemas from footers (~0.3-0.5 s).  A
# 52-query bench pays that per query without this cache.  Keyed by
# (applicationId, session id, sf_dir) so distinct sessions/dirs never
# share plans; holds logical plans only, no materialized data.
_TABLES_CACHE: dict[tuple, dict[str, DataFrame]] = {}


def _tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    key = (spark.sparkContext.applicationId, id(spark), sf_dir)
    t = _TABLES_CACHE.get(key)
    if t is None:
        t = load_testdata(spark, sf_dir)
        t["events"] = events_with_item(t["events"])
        _TABLES_CACHE[key] = t
    return t


# per-source staged symlink dirs, keyed by the source file path: reused
# across replay calls so repeated driver runs don't accumulate tempdirs
_STREAM_STAGE_CACHE: dict[str, str] = {}
