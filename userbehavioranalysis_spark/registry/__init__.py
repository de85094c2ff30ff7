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

# The round-8 additions — queries registered this round with no driver
# row yet; the rotation invariant (tests/test_registry.py) requires
# every one of them IN the r8 window below.
R8_WINDOW_CANDIDATES = {
    "streaming_snapshot_refresh_replay",
    "streaming_embedding_incremental_replay",
    "ivf_cell_drift",
    "corpus_snapshot_diff",
    "corpus_snapshot_restore",
    "corpus_snapshot_vacuum",
    "corpus_snapshot_evolution",
    "corpus_snapshot_partitioned",
    "streaming_snapshot_sink_replay",
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
#   r7 window: the 4 anchors + the 9 never-checked round-7 additions +
#              every r2/r3-newest green + the 5 oldest r4-greens →
#              after r7 no query's newest driver row was older than r4.
#   r8 window (this one): the 4 pinned anchors, the 9 never-checked
#              round-8 additions (snapshot-composed daily refresh,
#              embedding-side streaming refresh, IVF drift monitor,
#              snapshot version diff, rollback-restore, orphan vacuum,
#              schema evolution, partitioned layout, exactly-once
#              stream sink), then the queries whose newest green row
#              is r4 — 37 of the 40 fit; events_schema_evolution,
#              events_orc_roundtrip and events_jsonl_roundtrip (all
#              format roundtrips, thematically covered by their
#              registered siblings and the daily sampler) are the
#              three r4-greens left to the rotation sampler.  After
#              this window lands, exactly three registered queries'
#              newest driver rows are older than r5.  tests/test_oracle_rotation.py keeps
#              running tools/oracle_check.py on a daily-seeded random
#              sample so rotated-out queries cannot rot unnoticed.
_DRIVER_WINDOW = [
    # ---- pinned anchors: flagship analytic, tumbling-PV, the
    # byte-exact report render over the reference's apache.log
    # fixture, and the end-to-end streaming report replay.
    "hot_items",
    "page_view",
    "ref_network_flow_report",
    "streaming_hot_items_report_replay",
    # ---- no driver row yet: round-8 additions
    "streaming_snapshot_refresh_replay",
    "streaming_embedding_incremental_replay",
    "ivf_cell_drift",
    "corpus_snapshot_diff",
    "corpus_snapshot_restore",
    "corpus_snapshot_vacuum",
    "corpus_snapshot_evolution",
    "corpus_snapshot_partitioned",
    "streaming_snapshot_sink_replay",
    # ---- every query whose newest green row is r4, in definition order
    "scd2_user_state",
    "histogram_quantiles",
    "item_triangles",
    "uv_hll_portable",
    "salted_type_enrich",
    "incremental_page_view",
    "dedup_simhash_wide",
    "dedup_clusters_wide",
    "dedup_embedding_lsh",
    "ann_topk_lsh_indexed",
    "doc_ann_topk",
    "ann_topk_lsh_multiprobe",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "token_cms_estimates",
    "importance_sample",
    "stratified_sample",
    "temperature_mixture",
    "vocab_coverage",
    "keyword_search",
    "dq_audit",
    "audio_chunks",
    "image_phash_dedup",
    "video_frame_sample",
    "small_quantity_revenue",
    "min_cost_supplier",
    "important_supply_values",
    "sole_returning_supplier",
    "customer_order_distribution",
    "disjunctive_bracket_revenue",
    "forecast_revenue_change",
    "product_type_profit",
    "shipping_delay_priority_counts",
    "supplier_counts_by_part_attrs",
    "excess_share_suppliers",
    "bloom_filter_join",
    "merge_upsert_users",
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


def warm_streaming(spark, sf_dir: str) -> None:
    """Prime the streaming machinery's process-scoped input staging —
    the exact same calls (and therefore the exact same
    ``_STREAM_STAGE_CACHE`` keys) the replay queries make, so a
    harness that warms through this helper can never drift from the
    keys the queries use (the bench previously reproduced the staging
    calls by hand against private internals; if a registry call site
    had changed its staging key, the priming would have silently
    stopped working).  Idempotent and cheap when already staged."""
    import os

    from userbehavioranalysis_spark.registry.streaming import (
        _replay_events_stream,
    )
    from userbehavioranalysis_spark.registry.streaming_refresh import (
        _stage_doc_batches,
        _stage_emb_batches,
    )

    _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    _stage_doc_batches(sf_dir, _tables(spark, sf_dir)["documents"])
    _stage_emb_batches(spark, sf_dir)
