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

from userbehavioranalysis_spark.registry.ann import _ann_structural  # noqa: E402,F401

# Registered after the r5 driver window froze (the 5 round-5 additions
# that were locally oracle-green but had no driver row) plus the
# round-6 additions — all placed in the r6 window below.
R6_WINDOW_CANDIDATES = {
    "doc_chunks",
    "dedup_incremental",
    "dedup_incremental_capped",
    "hourly_behavior_pivot",
    "streaming_dedup_incremental_replay",
    "dedup_incremental_indexed",
    "ann_topk_pq_mllib",
    "ann_topk_ivf_mllib",
    "pipeline_incremental_refresh",
    "dedup_incremental_index_append",
    "streaming_corpus_screen_replay",
    "ann_topk_ivf_indexed",
    "streaming_daily_refresh_replay",
    "dedup_embedding_incremental",
    "events_time_range_scan",
    "events_user_delete",
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
#   r6 window (this one): the 4 pinned anchors, the 9 queries with NO
#              driver row yet (5 post-freeze r5 additions + 4 round-6
#              additions), and the 37 STALEST greens (last green r2) —
#              freshness rotation so no query's last green row ages
#              past three rounds without re-checking.  The 13 r2 greens
#              that didn't fit (uv_per_event, hot_pages,
#              dedup_minhash_lsh, ad_clicks_by_geo, audio_features,
#              image_features, image_resize, token_counts,
#              doc_fingerprints, quality_score, doc_rarity, pack_shards,
#              length_quantiles, decontaminate — bumped one-for-one as
#              the never-checked round-6 additions landed:
#              dedup_incremental_index_append,
#              streaming_corpus_screen_replay, ann_topk_ivf_indexed,
#              streaming_daily_refresh_replay,
#              dedup_embedding_incremental, events_time_range_scan,
#              events_user_delete) are first in line for r7,
#              each pinned meanwhile by its own pytest (property tests
#              for uv_per_event, real-decoder round-trips for the
#              multimodal trio) or by a driver-green sibling sharing
#              the code path (dedup_minhash_capped, hot_items,
#              ad_clicks oracles).  tests/test_oracle_rotation.py runs
#              tools/oracle_check.py on a daily-seeded random sample
#              each round so rotated-out queries cannot rot unnoticed.
_DRIVER_WINDOW = [
    # ---- pinned anchors: flagship analytic, tumbling-PV, the
    # byte-exact report render over the reference's apache.log
    # fixture, and the end-to-end streaming report replay.
    "hot_items",
    "page_view",
    "ref_network_flow_report",
    "streaming_hot_items_report_replay",
    # ---- no driver row yet: round-5 post-freeze additions
    "dedup_incremental",
    "dedup_incremental_capped",
    "doc_chunks",
    "hourly_behavior_pivot",
    "streaming_dedup_incremental_replay",
    # ---- no driver row yet: round-6 additions
    "dedup_incremental_indexed",
    "ann_topk_pq_mllib",
    "ann_topk_ivf_mllib",
    "pipeline_incremental_refresh",
    "dedup_incremental_index_append",
    "streaming_corpus_screen_replay",
    "ann_topk_ivf_indexed",
    "streaming_daily_refresh_replay",
    "dedup_embedding_incremental",
    "events_time_range_scan",
    "events_user_delete",
    # ---- stalest greens (last green r2), in r2 definition order
    "unique_visitors",
    "user_sessions",
    "marketing_total",
    "marketing_by_channel",
    "login_fail_relaxed",
    "order_timeout",
    "blacklist_warnings",
    "blacklist_filtered",
    "tx_match_interval",
    "tx_match_reconcile",
    "dedup_exact",
    "dedup_minhash_capped",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ann_topk_brute",
    "ann_topk_lsh",
    "language_id",
    "pii_redact",
    "curate_sample",
    "funnel_conversion",
    "retention_cohorts",
    "token_topk",
    "repetition_score",
    "mixture_sample",
    "split_assign",
    "asof_click_purchase",
    "doc_embedding_stats",
    "pipeline_clean_corpus",
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
