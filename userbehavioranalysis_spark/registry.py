"""Query + oracle registry — the single source of truth for the driver
contract (``__spark_entry__.py`` re-exports from here).

Each entry pairs a Spark DataFrame query (callable ``(spark, sf_dir) ->
DataFrame``) with an ANSI-SQL oracle DuckDB runs over the same parquet
tables.  Conventions that make the cross-engine value-hash comparison
work:

- window bounds are epoch-second BIGINTs, never timestamps;
- every aggregate/computed column is aliased identically on both sides;
- DuckDB ``count(*)``/``sum`` results are cast to BIGINT (DuckDB sums
  integers into HUGEINT, Spark into LONG);
- floats are avoided in outputs or rounded on both sides;
- rankings order by (metric DESC, key ASC) so ties break identically.

Sliding windows in the oracle use the generate_series expansion
(functions/time.sliding_oracle_windows): an event at t belongs to the
``size/slide`` windows whose aligned starts lie in (t-size, t] — the
same assignment ``F.window(ts, size, slide)`` makes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from userbehavioranalysis_spark.operators import topn
from userbehavioranalysis_spark.operators import windowed_counts as wc
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


def _tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    t = load_testdata(spark, sf_dir)
    t["events"] = events_with_item(t["events"])
    return t


# --------------------------------------------------------------------------
# Windowed counts (SURVEY §2.4-2.5: Win3-Win8, A1-A6)
# --------------------------------------------------------------------------

@query(
    "page_view",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
           CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600 AS window_end,
           CAST(count(*) AS BIGINT) AS pv_count
    FROM events
    WHERE event_type = 'view'
    GROUP BY 1, 2
    """,
)
def q_page_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.page_view(_tables(spark, sf_dir)["events"])


@query(
    "unique_visitors",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
           CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600 AS window_end,
           CAST(count(DISTINCT user_id) AS BIGINT) AS uv_count
    FROM events
    WHERE event_type = 'view'
    GROUP BY 1, 2
    """,
)
def q_unique_visitors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.unique_visitors(_tables(spark, sf_dir)["events"])


# HLL++ vs DuckDB approx differ by construction -> rows-only check (no oracle).
@query("uv_approx")
def q_uv_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.uv_approx(_tables(spark, sf_dir)["events"])


_SLIDING_1H_10M = """
    WITH w AS (
        SELECT (CAST(floor(epoch(ts) / 600) AS BIGINT) - g.i) * 600 AS window_start,
               e.*
        FROM events e CROSS JOIN generate_series(0, 5) g(i)
    )
"""


@query(
    "marketing_total",
    oracle=_SLIDING_1H_10M
    + """
    SELECT window_start, window_start + 3600 AS window_end,
           CAST(count(*) AS BIGINT) AS mkt_count
    FROM w
    WHERE event_type <> 'UNINSTALL'
    GROUP BY 1, 2
    """,
)
def q_marketing_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.marketing_total(_tables(spark, sf_dir)["events"])


@query(
    "marketing_by_channel",
    oracle=_SLIDING_1H_10M
    + """
    SELECT window_start, window_start + 3600 AS window_end,
           event_type AS channel,
           CAST(count(*) AS BIGINT) AS mkt_count
    FROM w
    WHERE event_type <> 'UNINSTALL'
    GROUP BY 1, 2, 3
    """,
)
def q_marketing_by_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.marketing_by_channel(_tables(spark, sf_dir)["events"])


@query(
    "ad_clicks_by_geo",
    oracle="""
    WITH w AS (
        SELECT (CAST(floor(epoch(ts) / 300) AS BIGINT) - g.i) * 300 AS window_start,
               e.*
        FROM events e CROSS JOIN generate_series(0, 11) g(i)
        WHERE e.event_type = 'click'
    )
    SELECT window_start, window_start + 3600 AS window_end,
           n_name AS nation,
           CAST(count(*) AS BIGINT) AS click_count
    FROM w
    JOIN customer ON w.user_id = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def q_ad_clicks_by_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(spark, sf_dir)
    return wc.ad_clicks_by_geo(t["events"], t["customer"], t["nation"])


# --------------------------------------------------------------------------
# Top-N family (SURVEY §2.5 A7/A8, Win1/Win2)
# --------------------------------------------------------------------------

@query(
    "hot_items",
    oracle="""
    WITH w AS (
        SELECT (CAST(floor(epoch(ts) / 300) AS BIGINT) - g.i) * 300 AS window_start,
               CAST(json_extract(props, '$.k') AS BIGINT) AS item_id
        FROM events e CROSS JOIN generate_series(0, 11) g(i)
        WHERE e.event_type = 'view'
    ), counts AS (
        SELECT window_start, item_id, CAST(count(*) AS BIGINT) AS view_count
        FROM w GROUP BY 1, 2
    )
    SELECT window_start, window_start + 3600 AS window_end, item_id, view_count,
           CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY view_count DESC, item_id ASC) AS rank
        FROM counts
    ) WHERE rank <= 3
    """,
)
def q_hot_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topn.hot_items(_tables(spark, sf_dir)["events"])


@query(
    "hot_pages",
    oracle="""
    WITH w AS (
        SELECT (CAST(floor(epoch(ts) / 300) AS BIGINT) - g.i) * 300 AS window_start,
               CAST(json_extract(props, '$.k') AS BIGINT) AS item_id
        FROM events e CROSS JOIN generate_series(0, 1) g(i)
    ), counts AS (
        SELECT window_start, item_id, CAST(count(*) AS BIGINT) AS view_count
        FROM w GROUP BY 1, 2
    )
    SELECT window_start, window_start + 600 AS window_end, item_id, view_count,
           CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY view_count DESC, item_id ASC) AS rank
        FROM counts
    ) WHERE rank <= 5
    """,
)
def q_hot_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topn.hot_pages(_tables(spark, sf_dir)["events"])
