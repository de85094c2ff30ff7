"""Dump formatted physical plans for the headline queries into PLANS.md.

Evidence file for plan-quality review: shows predicate pushdown
(PushedFilters), column pruning (ReadSchema), broadcast vs shuffle join
choices, and partial/final aggregation splits actually planned at
sf0.01.  Regenerate after plan-affecting changes:

    python tools/dump_plans.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from userbehavioranalysis_spark import get_spark  # noqa: E402
from userbehavioranalysis_spark.registry import QUERIES  # noqa: E402

HEADLINERS = [
    ("page_view", "tumbling windowed count — pushdown + partial agg"),
    ("hot_items", "sliding top-N — two exchanges (count, rank), no more"),
    ("ad_clicks_by_geo", "fact-dim joins — dims broadcast, fact unshuffled"),
    ("marketing_by_channel", "pane-decomposed high-ratio sliding count"),
    ("pricing_summary", "scan-heavy agg — pruned ReadSchema, pushed filter"),
    ("local_supplier_volume", "6-table join — broadcast dims, single fact spine"),
    ("dedup_minhash_lsh", "signature agg before any shuffle; band-bucket join"),
    ("tx_match_interval", "equi+range join — residual range on the equi key"),
    ("order_priority_checking", "EXISTS as LeftSemi — probe streams once"),
    ("parts_never_shipped", "NOT EXISTS as LeftAnti — pre-filtered anti side"),
    ("user_sessions", "session windows — one exchange on the key"),
    ("pipeline_clean_corpus", "five composed stages, one declarative plan"),
    ("dedup_ngram_jaccard", "df-bounded posting join — max-df stop-shingle cap"),
    ("blacklist_filtered", "per-key daily rank — one exchange, no join-back"),
    ("ann_topk_lsh", "integer LSH bands — broadcast query side, Arrow int64-matmul band kernel"),
    ("token_topk", "skewed token counts — partial agg + TakeOrderedAndProject"),
    ("curate_sample", "md5 sample gate pushed map-side before the rank window"),
    ("doc_chunks", "sliding token-window chunking — map-only, zero Exchange"),
    ("hourly_behavior_pivot", "pinned-values pivot — one aggregate, no discovery scan"),
    ("dedup_incremental_capped", "delta vs corpus band index — capped bucket probe"),
    ("decontaminate", "broadcast benchmark shingle set — corpus side unshuffled"),
    ("asof_click_purchase", "as-of join via tagged union + one last() window"),
    ("quantity_tiers", "range join — BroadcastNestedLoopJoin over the tier dim"),
    ("market_share", "Q8 shape — all dims broadcast, share window on tiny agg"),
    ("pack_shards", "per-source running sum — one exchange, no global funnel"),
    ("large_volume_orders", "Q18 shape — lineitem aggregated before any join"),
    ("top_return_customers", "Q10 shape — TakeOrderedAndProject, no global sort"),
    ("embedding_quantize", "int8 quantization — single codegen'd projection, no UDF"),
    ("latest_state", "log compaction — max_by partial agg, reduced shuffle, no Window"),
    ("dedup_minhash_capped", "LSH with hot-bucket cap — O(corpus·cap) candidates"),
    ("hot_items_report", "report render — bounded collect_list, one extra exchange"),
    ("media_features", "magic-byte codec dispatch — three pushed scans unioned"),
    ("promo_revenue_share", "Q14 shape — one broadcast join, one-pass conditional agg"),
    ("customers_without_recent_orders", "Q22 shape — scalar broadcast + pushed-filter LeftAnti"),
    ("top_supplier", "Q15 shape — exact-decimal argmax join-back, no global sort"),
    ("nation_trade_volume", "Q7 shape — nation dim twice; AQE decides the big-dim joins"),
    ("event_transitions", "Markov matrix — one user-keyed lag-window exchange"),
    ("rolling_active_users", "dedupe-then-fan-out — constant-factor explode, no range join"),
    ("event_props_stats", "JSON extraction inside scan codegen — no Python row path"),
    ("attribution_last_touch", "carry-forward last() — one user-keyed exchange"),
    ("session_paths", "sessionize + capped collect — windows share one sort"),
    ("anomaly_zscore", "hourly rollup exchange + tiny per-type window"),
    ("small_quantity_revenue", "Q17 shape — part filter broadcast, agg join-back via AQE"),
    ("min_cost_supplier", "Q2 shape — derived supply relation, argmin join-back"),
    ("sole_returning_supplier", "Q21 shape — two aggs ride one orderkey exchange"),
    ("stratified_sample", "per-lang quota — WindowGroupLimit prunes map-side"),
    ("image_phash_dedup", "decode+signature map-only; only 128-char sigs shuffle"),
    ("forecast_revenue_change", "Q6 shape — one scan, three pushed predicates, zero joins"),
    ("product_type_profit", "Q9 shape — derived cost rides the same filtered fact"),
    ("customer_order_distribution", "Q13 shape — outer join, zero-order customers kept"),
    ("disjunctive_bracket_revenue", "Q19 shape — OR brackets pushed to both scans, no union"),
    ("supplier_counts_by_part_attrs", "Q16 shape — broadcast anti blocklist, deduped pairs"),
    ("excess_share_suppliers", "Q20 shape — share test on one exchange, distinct-then-dims"),
    ("audio_chunks", "WAV decode + 1-to-N chunk fan-out inside Arrow batches"),
    ("item_pagerank", "integer PageRank — edge window once, tiny-graph iteration"),
    ("token_cms_estimates", "Count-Min table — partial-agg sketch, broadcast probe"),
    ("importance_sample", "score-weighted md5 gate — map-side draw, one id join"),
    ("bloom_filter_join", "runtime Bloom prefilter — probe before the exchange, exact join after"),
    ("scd2_user_state", "SCD2 — change-compact + interval windows on ONE exchange"),
    ("histogram_quantiles", "fixed-bin histogram — corpus pass partial-agg, probe on bin domain"),
    ("temperature_mixture", "domain rebalance — tiny agg broadcast back, map-side gate"),
    ("item_triangles", "degree-ordered wedge joins — cached edges, equi-joins only"),
    ("uv_hll_portable", "portable HLL — register groupBy max, integer estimate on sketch"),
    ("salted_type_enrich", "salted hot-key join — (key, salt) exchange spreads reducers"),
    ("incremental_page_view", "MV merge — snapshot enters pre-reduced, delta-sized exchange"),
    ("ann_topk_lsh_indexed", "partition-pruned index probe — PartitionFilters on (band, band_val)"),
    ("events_jsonl_roundtrip", "schema-explicit JSONL scan — no inference pass"),
    ("dedup_simhash_wide", "120-bit sketch — one 120-vote HashAggregate, 12-15-bit segment join"),
    ("dedup_clusters_wide", "keep/drop over wide edges — scale-guarded pair generator"),
    ("dedup_embedding_lsh", "banded-LSH near-dup — bucket join candidates, cosine verify"),
    ("bm25_search", "BM25 retrieval — one corpus shuffle, df/scalar broadcasts, rank on rounded score"),
    ("ann_topk_pq", "fixed-codebook PQ — integer ADC over codes, shortlist rank, exact rerank"),
    ("ann_topk_ivfpq", "fixed-codebook IVFPQ — broadcast probe routing before the code scan"),
    # round-6 additions
    ("dedup_incremental_indexed", "persisted band index — PartitionFilters on the shard probe"),
    ("dedup_incremental_index_append", "appended index — same pruned probe over write+append files"),
    ("ann_topk_ivf_indexed", "persisted IVF — cluster-directory pruning + broadcast routing"),
    ("pipeline_incremental_refresh", "six-gate refresh — semi/anti assembly, cached signature subtrees"),
    ("dedup_embedding_incremental", "delta-vs-corpus hyperplane LSH — bands join, cosine verify"),
    # round-7 additions
    (
        "dedup_embedding_incremental_indexed",
        "persisted embedding band index — grouped IN-list PartitionFilters, "
        "delta-only signing, stored-vector cosine verify",
    ),
    (
        "dedup_incremental_index_compact",
        "re-capped compacted index — probe identical to a fresh capped write",
    ),
    ("ann_topk_ivf_append", "appended IVF store — pruned probe over write+append files"),
    ("ann_topk_lsh_append", "appended LSH-ANN store — pruned probe, full-value-oracle parity"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("uba-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — formatted physical plans for the headline queries\n",
        f"Generated by tools/dump_plans.py at {sf_dir}. Things to check per",
        "plan: `PushedFilters` non-empty where a predicate exists, `ReadSchema`",
        "pruned to used columns, `BroadcastHashJoin` for dims, partial",
        "(`HashAggregate(keys=..., functions=[partial_...])`) before every",
        "`Exchange`, `WholeStageCodegen` spans covering the scan→agg spine.\n",
    ]
    import re

    for name, why in HEADLINERS:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().strip()
        # elide giant inline literals (the LSH plane matrix prints as
        # ~8k comma-separated ints) — keep the plan readable
        plan = re.sub(
            r"(-?\d+, ?){32,}-?\d+",
            "<int-literal-array elided>",
            plan,
        )
        out.append(f"\n## {name}\n\n*{why}*\n\n```\n{plan}\n```\n")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
