"""Round-3 wave: Bloom join pruning, SCD2, histogram quantiles,
temperature mixture, triangles, format round-trips."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


def _events(spark):
    from userbehavioranalysis_spark.sources.readers import load_testdata

    return load_testdata(spark, SF)["events"]


def _documents(spark):
    from userbehavioranalysis_spark.sources.readers import load_testdata

    return load_testdata(spark, SF)["documents"]


# ---------------------------------------------------------------- bloom ----


def test_bloom_no_false_negatives_and_prunes(spark):
    from userbehavioranalysis_spark.operators.joinopt import (
        bloom_build,
        bloom_prefilter,
    )

    from userbehavioranalysis_spark.sources.readers import load_testdata

    t = load_testdata(spark, SF)
    urgent = t["orders"].where(F.col("o_orderpriority") == "1-URGENT")
    bits = bloom_build(urgent.select("o_orderkey"), "o_orderkey")
    li = t["lineitem"]
    pruned = bloom_prefilter(li, "l_orderkey", bits)

    # no false negatives: every lineitem row that actually joins survives
    true_keys = {r.o_orderkey for r in urgent.select("o_orderkey").collect()}
    surviving = {r.l_orderkey for r in pruned.select("l_orderkey").distinct().collect()}
    assert true_keys & {
        r.l_orderkey for r in li.select("l_orderkey").distinct().collect()
    } <= surviving

    # and it actually prunes (urgent is ~1/5 of orders; FP rate is tiny)
    n_all, n_pruned = li.count(), pruned.count()
    assert n_pruned < 0.5 * n_all


def test_bloom_join_equals_plain_join(spark):
    from userbehavioranalysis_spark.operators.joinopt import bloom_prefiltered_join

    from userbehavioranalysis_spark.sources.readers import load_testdata

    t = load_testdata(spark, SF)
    urgent = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    li = t["lineitem"].select("l_orderkey", "l_linenumber")
    got = {
        (r.l_orderkey, r.l_linenumber)
        for r in bloom_prefiltered_join(li, "l_orderkey", urgent, "o_orderkey")
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    want = {
        (r.l_orderkey, r.l_linenumber)
        for r in li.join(urgent, li["l_orderkey"] == urgent["o_orderkey"])
        .select("l_orderkey", "l_linenumber")
        .collect()
    }
    assert got == want


def test_bloom_probe_is_jvm_only(spark):
    from userbehavioranalysis_spark.operators.joinopt import (
        bloom_build,
        bloom_prefilter,
    )

    from userbehavioranalysis_spark.sources.readers import load_testdata

    t = load_testdata(spark, SF)
    bits = bloom_build(
        t["orders"].limit(100).select("o_orderkey"), "o_orderkey", m_bits=1 << 14
    )
    plan = (
        bloom_prefilter(t["lineitem"], "l_orderkey", bits, m_bits=1 << 14)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ----------------------------------------------------------------- scd2 ----


def test_scd2_intervals_are_contiguous_and_versioned(spark):
    from userbehavioranalysis_spark.operators.compaction import scd2_history

    ev = _events(spark).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    hist = scd2_history(ev, ["user_id"], "state", "ts_us", "event_id")
    rows = sorted(
        hist.collect(), key=lambda r: (r.user_id, r.version)
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for user, rs in by_user.items():
        # versions are 1..n
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        # exactly one current row, and it is the last
        assert [r.is_current for r in rs] == [False] * (len(rs) - 1) + [True]
        for a, b in zip(rs, rs[1:]):
            # intervals chain with no gaps/overlaps
            assert a.valid_to == b.valid_from
            # consecutive runs really changed state
            assert a.state != b.state


def test_scd2_current_rows_match_latest_state(spark):
    from userbehavioranalysis_spark.operators.compaction import (
        latest_state,
        scd2_history,
    )

    ev = _events(spark).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )
    hist = scd2_history(ev, ["user_id"], "state", "ts_us", "event_id")
    cur = {
        (r.user_id, r.state)
        for r in hist.where("is_current").select("user_id", "state").collect()
    }
    latest = {
        (r.user_id, r.state)
        for r in latest_state(ev, ["user_id"], "ts_us", "event_id", ["state"])
        .select("user_id", "state")
        .collect()
    }
    assert cur == latest


# ------------------------------------------------------------ histogram ----


def test_histogram_quantiles_bracket_exact_percentiles(spark):
    from userbehavioranalysis_spark.operators.sketches import histogram_quantiles

    docs = _documents(spark)
    got = {r.q_permille: r.est_hi for r in histogram_quantiles(docs).collect()}
    vals = sorted(r.n_chars for r in docs.select("n_chars").collect())

    import math

    for q, est_hi in got.items():
        exact = vals[max(0, math.ceil(q / 1000 * len(vals)) - 1)]
        assert est_hi - 32 <= exact < est_hi  # within one bin
    # monotone in q
    qs = sorted(got)
    assert all(got[a] <= got[b] for a, b in zip(qs, qs[1:]))


# ---------------------------------------------------------- temperature ----


def test_temperature_mixture_flattens_domains(spark):
    from userbehavioranalysis_spark.operators.text_analysis import temperature_mixture

    docs = _documents(spark)
    out = temperature_mixture(docs)
    rates = {
        r.source: r.rate_ppm
        for r in out.select("source", "rate_ppm").distinct().collect()
    }
    counts = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert all(0 <= v <= 1_000_000 for v in rates.values())
    # α<1 ⇒ keep-rate decreases as domain size grows
    srcs = sorted(rates, key=lambda s: counts[s])
    for small, big in zip(srcs, srcs[1:]):
        if counts[small] < counts[big]:
            assert rates[small] >= rates[big]
    # deterministic
    again = {
        r.source: r.rate_ppm
        for r in temperature_mixture(docs)
        .select("source", "rate_ppm")
        .distinct()
        .collect()
    }
    assert rates == again


# ------------------------------------------------------------- triangles ----


def test_item_triangles_on_known_graph(spark):
    from userbehavioranalysis_spark.operators.graph import item_triangles

    # one user walks 1→2→3→1→4: undirected edges {12,23,13,14} — exactly
    # one triangle {1,2,3}; item 4 is in none
    walk = [1, 2, 3, 1, 4]
    rows = [
        (i, 1_700_000_000_000_000 + i * 1_000_000, 7, "view", 0.0, json.dumps({"k": k}))
        for i, k in enumerate(walk)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    got = {r.item: r.n_triangles for r in item_triangles(ev).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


# --------------------------------------------------------------- formats ----


def test_format_roundtrips_are_lossless(spark):
    from userbehavioranalysis_spark.sources.formats import events_roundtrip

    def key(df):
        return {
            (r.event_id, r.ts_us, r.user_id, r.event_type, r.value_r2, r.props)
            for r in df.collect()
        }

    base = _events(spark).select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value_r2"),
        "props",
    )
    want = key(base)
    assert key(events_roundtrip(spark, SF, "jsonl")) == want
    assert key(events_roundtrip(spark, SF, "orc")) == want


# ------------------------------------------------------------------- hll ----


def test_hll_portable_error_bound_and_bounded_sketch(spark):
    from userbehavioranalysis_spark.operators.sketches import (
        HLL_M,
        hll_exact_uv,
        hll_registers,
        hll_uv_estimate,
    )

    ev = _events(spark)
    regs = hll_registers(ev)
    # sketch is bounded: ≤ m registers per window
    per_win = regs.groupBy("window_start").count().agg(F.max("count")).collect()[0][0]
    assert per_win <= HLL_M
    rows = hll_uv_estimate(regs, hll_exact_uv(ev)).collect()
    assert rows
    for r in rows:
        # m=256 → rse ≈ 1.04/√m ≈ 6.5%; allow 4σ plus small-count slack
        tol = max(4, 0.26 * r.exact_uv)
        assert abs(r.est_uv - r.exact_uv) <= tol, (
            r.window_start,
            r.est_uv,
            r.exact_uv,
        )


def test_hll_accuracy_high_cardinality(spark):
    """Exercise the raw-HLL branch (not linear counting): per-window
    cardinality ≫ 2.5·m so est_raw is the published path.  Guards the
    52-bit-frame fix (rho = 53 − bit_length(w)); the pre-fix 55-bit
    frame inflates these estimates 2–4× and fails this bound."""
    from userbehavioranalysis_spark.operators.sketches import (
        hll_exact_uv,
        hll_registers,
        hll_uv_estimate,
    )

    rows = []
    for win, n in ((0, 1000), (3600, 5000)):
        rows.extend((f"u{win}_{i}", win + (i % 3600)) for i in range(n))
    ev = spark.createDataFrame(
        [(uid, float(ts)) for uid, ts in rows], "user_id string, epoch double"
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"),
             F.lit("view").alias("event_type"))
    out = hll_uv_estimate(hll_registers(ev), hll_exact_uv(ev)).collect()
    assert len(out) == 2
    for r in out:
        # m=256 → rse ≈ 6.5%; 4σ bound
        assert abs(r.est_uv - r.exact_uv) <= 0.26 * r.exact_uv, (
            r.window_start,
            r.est_uv,
            r.exact_uv,
        )


# ------------------------------------------------------------ salted join ----


def test_salted_join_equals_plain_join_and_spreads(spark):
    from userbehavioranalysis_spark.operators.skew import salted_join

    ev = _events(spark).select("event_id", "event_type")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_count"))
    got = {
        (r.event_id, r.type_count)
        for r in salted_join(ev, dim, "event_type", "event_id")
        .select("event_id", "type_count")
        .collect()
    }
    want = {
        (r.event_id, r.type_count)
        for r in ev.join(dim, "event_type").select("event_id", "type_count").collect()
    }
    assert got == want

    # the salt actually fans each hot key across buckets
    salted = ev.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(16)).cast("int")
    )
    spread = (
        salted.groupBy("event_type")
        .agg(F.countDistinct("_salt").alias("n"))
        .agg(F.min("n"))
        .collect()[0][0]
    )
    assert spread == 16


# ------------------------------------------------------------- incremental ----


def test_incremental_merge_equals_full_recompute(spark):
    from userbehavioranalysis_spark.operators.compaction import merge_partial_counts

    ev = _events(spark).where(F.col("event_type") == "view")

    def hourly(df):
        ws = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
        return df.groupBy(ws.alias("window_start")).agg(
            F.count(F.lit(1)).alias("pv_count")
        )

    snap = hourly(ev.where(F.pmod("event_id", F.lit(20)) != 0))
    delta = hourly(ev.where(F.pmod("event_id", F.lit(20)) == 0))
    merged = {
        (r.window_start, r.pv_count)
        for r in merge_partial_counts(
            snap, delta, ["window_start"], "pv_count"
        ).collect()
    }
    full = {(r.window_start, r.pv_count) for r in hourly(ev).collect()}
    assert merged == full


# ------------------------------------------------------------- ann index ----


def test_ann_index_probe_prunes_partitions_and_matches_lsh(spark, tmp_path):
    from userbehavioranalysis_spark.operators.similarity import (
        ann_index_write,
        ann_topk_lsh,
        ann_topk_lsh_indexed,
    )
    from userbehavioranalysis_spark.sources.readers import load_testdata

    emb = load_testdata(spark, SF)["embeddings"]
    path = str(tmp_path / "index")
    ann_index_write(emb, path)
    queries = emb.filter(F.col("vec_id") < 3)
    out = ann_topk_lsh_indexed(emb, queries, path)

    want = {
        (r.query_id, r.neighbor_id, r.cosine_r6, r.rank)
        for r in ann_topk_lsh(emb, queries).filter(F.col("query_id") < 3).collect()
    }
    got = {(r.query_id, r.neighbor_id, r.cosine_r6, r.rank) for r in out.collect()}
    assert got == want

    # the probe scan carries partition filters (pruned listing)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "empty PartitionFilters — probe not pruned"


# ----------------------------------------------------------------- vocab ----


def test_vocab_coverage_bounds_and_known_doc(spark):
    from userbehavioranalysis_spark.operators.text_analysis import vocab_coverage

    docs = _documents(spark)
    rows = vocab_coverage(docs).collect()
    assert rows
    for r in rows:
        assert 0 <= r.oov_tokens <= r.n_tokens
        assert 0 <= r.oov_ppm <= 1_000_000
        assert r.oov_ppm == (1_000_000 * r.oov_tokens) // r.n_tokens
    # the corpus has a closed tiny vocabulary; top-20 of ~31 words must
    # cover well over half of most docs
    import statistics

    med = statistics.median(r.oov_ppm for r in rows)
    assert med < 500_000


# ----------------------------------------------------------------- merge ----


def test_merge_upsert_semantics(spark):
    from userbehavioranalysis_spark.operators.compaction import merge_upsert

    snap = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    changes = spark.createDataFrame(
        [
            (2, "B", 21, False),   # update
            (3, None, 0, True),    # delete
            (4, "d", 40, False),   # insert
        ],
        "k long, s string, v long, dead boolean",
    )
    got = {
        (r.k, r.s, r.v)
        for r in merge_upsert(snap, changes, ["k"], "dead").collect()
    }
    assert got == {(1, "a", 10), (2, "B", 21), (4, "d", 40)}


def test_merge_upsert_without_deletes(spark):
    from userbehavioranalysis_spark.operators.compaction import merge_upsert

    snap = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    changes = spark.createDataFrame([(2, 21), (5, 50)], "k long, v long")
    got = {(r.k, r.v) for r in merge_upsert(snap, changes, ["k"]).collect()}
    assert got == {(1, 10), (2, 21), (5, 50)}


# ---------------------------------------------------------------- z-order ----


def test_zorder_write_tightens_both_dimensions(spark, tmp_path):
    import pyarrow.parquet as pq
    import glob as _glob
    import os

    from userbehavioranalysis_spark.sources.writers import write_zordered

    ev = _events(spark).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.floor(F.unix_timestamp("ts") / 3600) - 473352).cast("long").alias("hour"),
    )

    def file_ranges(path, col):
        widths = []
        for f in _glob.glob(os.path.join(path, "*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(rg).column(idx).statistics.min for rg in range(md.num_row_groups))
            hi = max(md.row_group(rg).column(idx).statistics.max for rg in range(md.num_row_groups))
            widths.append(hi - lo)
        return widths

    zpath = str(tmp_path / "z")
    tpath = str(tmp_path / "t")
    write_zordered(ev, zpath, "user_id", "hour", n_files=16, a_bits=4, b_bits=10)
    # baseline: single-dimension time sort (the default telemetry layout)
    (
        ev.repartitionByRange(16, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .parquet(tpath)
    )
    global_users = ev.agg(F.max("user_id") - F.min("user_id")).collect()[0][0]
    global_hours = ev.agg(F.max("hour") - F.min("hour")).collect()[0][0]

    z_user = file_ranges(zpath, "user_id")
    t_user = file_ranges(tpath, "user_id")
    assert len(z_user) >= 8 and len(t_user) >= 8
    avg = lambda xs: sum(xs) / len(xs)
    # time-sorted files span ~the whole user domain; z-ordered files
    # bound BOTH dimensions -> file-level min/max skipping works for
    # either filter column
    assert avg(t_user) > 0.9 * global_users
    assert avg(z_user) < 0.6 * global_users
    z_hour = file_ranges(zpath, "hour")
    assert avg(z_hour) < 0.8 * global_hours


# ------------------------------------------------------- search/dq/evolve ----


def test_keyword_search_conjunction(spark):
    from userbehavioranalysis_spark.operators.text_analysis import keyword_search

    docs = _documents(spark)
    rows = keyword_search(docs, terms=("spark", "window"), k=5).collect()
    assert rows and len(rows) <= 5
    texts = {
        r.doc_id: r.text for r in docs.select("doc_id", "text").collect()
    }
    for r in rows:
        assert r.n_hits == 2
        toks = texts[r.doc_id].split()
        assert "spark" in toks and "window" in toks
        assert r.total_tf == toks.count("spark") + toks.count("window")
    ranks = [r.rank for r in sorted(rows, key=lambda x: x.rank)]
    assert ranks == list(range(1, len(rows) + 1))


def test_dq_audit_clean_tables_and_planted_violation(spark):
    from userbehavioranalysis_spark.operators.dataquality import dq_audit
    from userbehavioranalysis_spark.sources.readers import load_testdata

    t = load_testdata(spark, SF)
    clean = {r.rule: r.n_violations for r in
             dq_audit(t["orders"], t["lineitem"], t["customer"]).collect()}
    assert len(clean) == 8
    assert all(v == 0 for v in clean.values()), clean

    # plant an orphan order and a bad discount; the audit must see both
    bad_orders = t["orders"].unionByName(
        spark.createDataFrame(
            [(99_999_999, 99_999_999, "O", 1.0, None, "1-URGENT")],
            t["orders"].schema,
        )
    )
    bad_li = t["lineitem"].withColumn(
        "l_discount",
        F.when(F.col("l_linenumber") == 1, F.lit(2.0)).otherwise(F.col("l_discount")),
    )
    dirty = {r.rule: r.n_violations for r in
             dq_audit(bad_orders, bad_li, t["customer"]).collect()}
    assert dirty["orders.custkey_fk_customer"] == 1
    assert dirty["lineitem.discount_in_[0,1]"] > 0


def test_schema_evolution_nulls_old_rows(spark):
    from userbehavioranalysis_spark.sources.formats import events_schema_evolution

    out = events_schema_evolution(spark, SF)
    rows = out.collect()
    assert rows
    for r in rows:
        if r.event_id % 2 == 0:
            assert r.event_type is None and r.value_r2 is None
        else:
            assert r.event_type is not None


def test_ivf_index_probe_prunes_partitions_and_matches_memory(spark, tmp_path):
    """The persisted IVF probe must carry non-empty PartitionFilters on
    the vector scan (reads only routed cluster directories) and must
    reproduce ann_topk_ivf's output on the same clustered corpus."""
    import re

    from userbehavioranalysis_spark.operators.similarity import (
        ann_topk_ivf,
        ann_topk_ivf_indexed,
        assign_ivf_clusters,
        ivf_index_write,
    )
    from userbehavioranalysis_spark.sources.readers import load_testdata

    emb = load_testdata(spark, SF)["embeddings"]
    clustered = assign_ivf_clusters(emb, n_clusters=8, iters=2)
    path = str(tmp_path / "index")
    ivf_index_write(clustered, path)
    queries = emb.filter(F.col("vec_id") < 3)

    out = ann_topk_ivf_indexed(queries, path, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip(), "empty PartitionFilters — probe not pruned"

    want = {
        (r.query_id, r.neighbor_id, r.cosine_r6, r.rank)
        for r in ann_topk_ivf(clustered, queries, k=5, cluster_col="cluster").collect()
    }
    got = {(r.query_id, r.neighbor_id, r.cosine_r6, r.rank) for r in out.collect()}
    assert got == want and got
