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

Layout: ``core`` holds the dicts/decorator/caches; one module per
query family registers itself on import (import order below is the
registration order); this ``__init__`` then pins the driver window.
"""

from __future__ import annotations

from userbehavioranalysis_spark.registry.core import (  # noqa: F401
    ORACLES,
    QUERIES,
    QueryFn,
    _STREAM_STAGE_CACHE,
    _tables,
    query,
)

# Family modules register their queries on import; this order is the
# definition order of everything past the pinned driver window.
from userbehavioranalysis_spark.registry import behavior  # noqa: E402,F401
from userbehavioranalysis_spark.registry import reference  # noqa: E402,F401
from userbehavioranalysis_spark.registry import dedup  # noqa: E402,F401
from userbehavioranalysis_spark.registry import ann  # noqa: E402,F401
from userbehavioranalysis_spark.registry import text  # noqa: E402,F401
from userbehavioranalysis_spark.registry import multimodal  # noqa: E402,F401
from userbehavioranalysis_spark.registry import relational  # noqa: E402,F401
from userbehavioranalysis_spark.registry import streaming  # noqa: E402,F401
from userbehavioranalysis_spark.registry import streaming_refresh  # noqa: E402,F401

from userbehavioranalysis_spark.registry.ann import _ann_structural  # noqa: E402,F401

# The round-7 additions — queries registered this round with no driver
# row yet; the rotation invariant (tests/test_registry.py) requires
# every one of them IN the r7 window below.
R7_WINDOW_CANDIDATES = {
    "dedup_embedding_incremental_indexed",
    "dedup_embedding_incremental_capped",
    "dedup_embedding_index_append",
    "dedup_incremental_index_compact",
    "ann_topk_ivf_append",
    "ann_topk_lsh_append",
    "decontaminate_indexed",
    "corpus_snapshot_pinned",
    "corpus_snapshot_latest",
}


# --------------------------------------------------------------------------
# Driver-window ordering + rotation plan
# --------------------------------------------------------------------------
# The correctness driver records oracle results for the FIRST 50 registry
# entries only.  Rotation history:
#   r2 window: first 50 in definition order (page_view .. image_resize)
#   r3 window: streaming replays + reference fixtures + round-3 waves
#   r4 window: round-3/4 additions + relational re-pins
#   r5 window: every query still lacking a green row after r1-r4
#              (closed the book: 157/157 registered-at-freeze queries
#              green across r1-r5)
#   r6 window: the 4 anchors + all 16 never-driver-checked queries +
#              the 30 stalest r2-greens → after r6 every one of the
#              173 then-registered queries had ≥1 green row and none
#              had ever failed a driver check.
#   r7 window (this one): pure freshness rotation — the 4 pinned
#              anchors, the 9 never-checked round-7 additions
#              (embedding-index probe/capped-probe/append, minhash
#              re-cap compaction, IVF append, LSH-ANN append,
#              persisted-benchmark decontamination, snapshot
#              time-travel pinned/latest reads), then EVERY query
#              whose newest green row is r2 or r3 (14 + 18), and the
#              5 oldest r4-greens.  After this window lands, no
#              registered query's newest driver row is older than r4.
#              tests/test_oracle_rotation.py keeps running
#              tools/oracle_check.py on a daily-seeded random sample
#              so rotated-out queries cannot rot unnoticed.
_DRIVER_WINDOW = [
    # ---- pinned anchors: flagship analytic, tumbling-PV, the
    # byte-exact report render over the reference's apache.log
    # fixture, and the end-to-end streaming report replay.
    "hot_items",
    "page_view",
    "ref_network_flow_report",
    "streaming_hot_items_report_replay",
    # ---- no driver row yet: round-7 additions
    "dedup_embedding_incremental_indexed",
    "dedup_embedding_incremental_capped",
    "dedup_embedding_index_append",
    "dedup_incremental_index_compact",
    "ann_topk_ivf_append",
    "ann_topk_lsh_append",
    "decontaminate_indexed",
    "corpus_snapshot_pinned",
    "corpus_snapshot_latest",
    # ---- stalest greens: newest row r2, in r2 definition order
    "uv_per_event",
    "ad_clicks_by_geo",
    "hot_pages",
    "dedup_minhash_lsh",
    "decontaminate",
    "doc_rarity",
    "pack_shards",
    "length_quantiles",
    "quality_score",
    "token_counts",
    "doc_fingerprints",
    "audio_features",
    "image_features",
    "image_resize",
    # ---- newest row r3, in definition order
    "login_fail_strict",
    "event_transitions",
    "rolling_active_users",
    "event_props_stats",
    "ann_topk_quantized",
    "media_features",
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "market_share",
    "quantity_tiers",
    "large_volume_orders",
    "top_return_customers",
    "promo_revenue_share",
    "customers_without_recent_orders",
    "top_supplier",
    "nation_trade_volume",
    "streaming_dedup_replay",
    # ---- the 5 oldest r4-greens, in definition order
    "attribution_last_touch",
    "session_paths",
    "anomaly_zscore",
    "time_to_convert",
    "item_pagerank",
]


def _reorder_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    if missing:  # fail at import, not in the driver run
        raise RuntimeError(f"driver window references unknown queries: {missing}")
    ordered = {n: QUERIES[n] for n in _DRIVER_WINDOW}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder_driver_window()
