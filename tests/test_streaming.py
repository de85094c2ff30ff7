"""Streaming layer: file-replay through memory sinks, compared against
the batch operators (the batch results are the semantic oracle —
SURVEY §5's streaming smoke-test strategy).
"""

import os

import pyspark.sql.functions as F
import pytest

from userbehavioranalysis_spark.operators.login_fail import login_fail_warnings
from userbehavioranalysis_spark.operators.topn import windowed_topn
from userbehavioranalysis_spark.operators.windowed_counts import page_view
from userbehavioranalysis_spark.streaming.jobs import (
    run_topn_foreachBatch,
    streaming_page_view,
)
from userbehavioranalysis_spark.streaming.sources import file_replay, marketing_generator
from userbehavioranalysis_spark.streaming.stateful import (
    blacklist_stateful,
    login_fail_stateful,
    order_timeout_stateful,
)

SCHEMA = "event_id long, user_id long, event_type string, item_id long, ts timestamp"


def _write_files(spark, tmpdir, batches):
    """batches: list of row-lists (event_id, user_id, event_type, item_id, sec).
    One parquet file per batch -> one micro-batch each with
    maxFilesPerTrigger=1 (files replay in name order)."""
    path = os.path.join(tmpdir, "stream")
    os.makedirs(path, exist_ok=True)
    all_rows = []
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(e, u, t, k, s) for e, u, t, k, s in rows],
            "event_id long, user_id long, event_type string, item_id long, sec long",
        ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
        df.coalesce(1).write.parquet(os.path.join(tmpdir, f"tmp{i}"))
        part = [
            f for f in os.listdir(os.path.join(tmpdir, f"tmp{i}")) if f.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(tmpdir, f"tmp{i}", part),
            os.path.join(path, f"batch_{i:03d}.parquet"),
        )
        all_rows.extend(rows)
    batch_df = spark.createDataFrame(
        [(e, u, t, k, s) for e, u, t, k, s in all_rows],
        "event_id long, user_id long, event_type string, item_id long, sec long",
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    return path, batch_df


def _run_to_memory(spark, sdf, name, tmpdir):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


BATCHES = [
    [(1, 1, "view", 10, 100), (2, 2, "view", 10, 200), (3, 1, "click", 11, 3_000)],
    [(4, 1, "view", 11, 4_000), (5, 3, "view", 10, 7_300), (6, 2, "view", 12, 7_400)],
    [(7, 9, "view", 10, 30_000)],  # far-future: advances watermark past hour 0-2
]


def test_streaming_page_view_matches_batch(spark, tmp_path):
    path, batch_df = _write_files(spark, str(tmp_path), BATCHES)
    stream = file_replay(spark, path, batch_df.schema)
    res = _run_to_memory(
        spark, streaming_page_view(stream, watermark="0 seconds"), "pv_stream", str(tmp_path)
    )
    got = {(r["window_start"], r["pv_count"]) for r in res.collect()}
    expect_closed = {
        (r["window_start"], r["pv_count"])
        for r in page_view(batch_df).collect()
        if r["window_end"] <= 30_000  # append mode emits watermark-closed windows
    }
    assert expect_closed <= got | expect_closed  # closed windows all present
    assert got == expect_closed


def test_streaming_topn_foreachBatch_matches_batch(spark, tmp_path):
    path, batch_df = _write_files(spark, str(tmp_path), BATCHES)
    stream = file_replay(spark, path, batch_df.schema)
    q, state = run_topn_foreachBatch(
        stream.filter(F.col("event_type") == "view"),
        key_col="item_id",
        n=2,
        window="1 hour",
    )
    q.awaitTermination(120)
    got = {
        ws: [k for k, _ in items] for ws, items in state.topn().items()
    }
    expect = {}
    for r in windowed_topn(
        batch_df.filter(F.col("event_type") == "view"), "item_id", 2, "1 hour"
    ).collect():
        expect.setdefault(r["window_start"], []).append((r["rank"], r["item_id"]))
    expect = {ws: [k for _, k in sorted(v)] for ws, v in expect.items()}
    assert got == expect
    # driver state is bounded: ≤ N entries per window, never every key
    assert len(state.counts) <= 2 * len(got)


def test_streaming_topn_merge_is_distributed(spark, tmp_path):
    """The per-batch path must never collect to the driver: counts land
    in the distributed spill, and the driver dict stays EMPTY until the
    one converged merge in topn() (a sliding window + a key displaced
    from one batch's top-N exercises the max-over-emissions fold)."""
    batches = [
        # hour-0 window: items 1,2 lead; item 3 trails
        [(1, 1, "view", 1, 100), (2, 2, "view", 1, 200),
         (3, 3, "view", 2, 300), (4, 4, "view", 3, 400)],
        # item 3 overtakes item 2 in a later batch (count re-emission)
        [(5, 5, "view", 3, 500), (6, 6, "view", 3, 600)],
    ]
    path, batch_df = _write_files(spark, str(tmp_path), batches)
    stream = file_replay(spark, path, batch_df.schema)
    q, state = run_topn_foreachBatch(
        stream.filter(F.col("event_type") == "view"),
        key_col="item_id",
        n=2,
        window="1 hour",
    )
    q.awaitTermination(120)
    assert state.counts == {}, "driver dict must stay empty during the run"
    got = {ws: items for ws, items in state.topn().items()}
    expect = {}
    for r in windowed_topn(
        batch_df.filter(F.col("event_type") == "view"), "item_id", 2, "1 hour"
    ).collect():
        expect.setdefault(r["window_start"], []).append((r["item_id"], r["cnt"]))
    assert got == expect  # keys AND converged counts match the batch ranks


def test_login_fail_state_survives_batch_boundary(spark, tmp_path):
    # fail pair SPLIT across two micro-batches must still warn; an
    # intervening success in-batch must break strict contiguity
    batches = [
        [(1, 1, "error", 100, 100), (2, 2, "error", 0, 100)],
        [(3, 1, "error", 0, 102), (4, 2, "view", 0, 101), (5, 2, "error", 0, 102)],
    ]
    path, batch_df = _write_files(spark, str(tmp_path), batches)
    stream = file_replay(spark, path, batch_df.schema)
    res = _run_to_memory(
        spark, login_fail_stateful(stream, 10), "login_stream", str(tmp_path)
    )
    got = {(r["user_id"], r["first_fail_ts_us"], r["last_fail_ts_us"]) for r in res.collect()}
    expect = {
        (r["user_id"], r["first_fail_ts_us"], r["last_fail_ts_us"])
        for r in login_fail_warnings(batch_df, 10, strict=True).collect()
    }
    assert got == expect == {(1, 100_000_000, 102_000_000)}


def test_order_timeout_stateful_immediate_and_timer_outcomes(spark, tmp_path):
    batches = [
        [
            (1, 1, "signup", 0, 100), (2, 1, "purchase", 0, 200),   # in time
            (3, 2, "signup", 0, 100), (4, 2, "purchase", 0, 2000),  # too late
            (5, 3, "signup", 0, 100),                                # never pays
            (6, 4, "purchase", 0, 150),                              # no create
        ],
        [(7, 9, "view", 0, 100_000)],   # watermark jump
        [(8, 9, "view", 0, 200_000)],   # next batch: expired timers fire
    ]
    path, batch_df = _write_files(spark, str(tmp_path), batches)
    stream = file_replay(spark, path, batch_df.schema)
    res = _run_to_memory(
        spark,
        order_timeout_stateful(stream, timeout_seconds=900, watermark="10 seconds"),
        "order_stream",
        str(tmp_path),
    )
    got = {r["order_id"]: r["result_msg"] for r in res.collect()}
    assert got == {
        1: "payed successfully",
        2: "payed but already timeout",
        3: "order timeout",
        4: "already payed but not found create log",
    }


def test_blacklist_stateful_threshold_and_latch(spark, tmp_path):
    rows = [(i, 1, "click", 0, 100 + i) for i in range(7)]
    batches = [rows[:4], rows[4:]]
    path, batch_df = _write_files(spark, str(tmp_path), batches)
    stream = file_replay(spark, path, batch_df.schema)
    res = _run_to_memory(
        spark, blacklist_stateful(stream, threshold=5), "bl_stream", str(tmp_path)
    )
    rows_out = res.collect()
    passed = [r for r in rows_out if not r["is_warning"]]
    warns = [r for r in rows_out if r["is_warning"]]
    assert len(passed) == 5 and len(warns) == 1  # 6th event warns, 7th suppressed
    assert warns[0]["event_id"] == 5


def test_blacklist_stateful_late_previous_day_never_resets(spark, tmp_path):
    # a late click from an already-closed day (admitted by the watermark
    # in a later micro-batch) must NOT reset the current day's counter or
    # re-fire the warning latch — it folds into the current counter, like
    # the reference where the midnight timer already cleared the old day
    day = 86_400
    batches = [
        [(i, 1, "click", 0, day + 100 + i) for i in range(6)],  # day 1: 5 pass + warn
        [(10, 1, "click", 0, 50),            # LATE day-0 click: suppressed
         (11, 1, "click", 0, day + 200)],    # more day-1: suppressed (past cap)
    ]
    path, batch_df = _write_files(spark, str(tmp_path), batches)
    stream = file_replay(spark, path, batch_df.schema)
    res = _run_to_memory(
        spark,
        blacklist_stateful(stream, threshold=5, watermark="2 days"),
        "bl_late_stream",
        str(tmp_path),
    )
    rows_out = res.collect()
    passed = sorted(r["event_id"] for r in rows_out if not r["is_warning"])
    warns = [r for r in rows_out if r["is_warning"]]
    assert passed == [0, 1, 2, 3, 4]        # nothing restarted after the late event
    assert len(warns) == 1 and warns[0]["event_id"] == 5  # latch fired exactly once


def test_marketing_generator_schema(spark):
    gen = marketing_generator(spark, rows_per_second=10)
    assert set(gen.schema.names) == {"user_id", "behavior", "channel", "ts"}
    assert gen.isStreaming


def test_late_data_within_watermark_delay_updates_window(spark, tmp_path):
    """W4 analog (allowedLateness 60s, NetworkFlow.scala:40-47): a
    watermark *delay* keeps windows open for late arrivals; update mode
    re-emits the corrected count — the reference's downstream MapState
    upsert (`NetworkFlow.scala:87-91`) becomes idempotent overwrite
    (SURVEY §7.3.1: final-state equivalence, not emission-trace)."""
    batches = [
        [(1, 1, "view", 10, 100), (2, 2, "view", 10, 7_000)],
        [(3, 3, "view", 10, 500)],  # late vs max-ts 7000, within 2h delay
        [(4, 4, "view", 10, 20_000)],
    ]
    path, batch_df = _write_files(spark, str(tmp_path), batches)
    stream = file_replay(spark, path, batch_df.schema)
    sdf = streaming_page_view(stream, watermark="2 hours")
    q = (
        sdf.writeStream.format("memory")
        .queryName("pv_late")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits a window on every change; counts only grow,
    # so max() per window is the final converged value
    final = {}
    for r in spark.sql("SELECT * FROM pv_late").collect():
        final[r["window_start"]] = max(final.get(r["window_start"], 0), r["pv_count"])
    expect = {
        r["window_start"]: r["pv_count"] for r in page_view(batch_df).collect()
    }
    assert final == expect
    assert final[0] == 2  # the late event at t=500 was absorbed into hour 0


def test_streaming_reconcile_outer_tags(spark, tmp_path):
    """J2 streaming form: matched pairs emit eagerly; an unmatched pay
    emits with null receipt once the watermark passes its join range
    (the reference's 5 s CoProcess timer, TxMacthDetect.scala:85-96)."""
    from userbehavioranalysis_spark.streaming.jobs import streaming_reconcile_outer

    batches = [
        # pay 1 + click 2 within ±5s => matched; pay 3 alone at t=200
        [(1, 7, "purchase", 0, 100), (2, 7, "click", 0, 103), (3, 8, "purchase", 0, 200)],
        # far-future events on BOTH sides: the outer flush gates on the
        # min of the two sides' watermarks (multipleWatermarkPolicy=min)
        [(4, 9, "click", 0, 10_000), (5, 9, "purchase", 0, 10_000)],
    ]
    path, batch_df = _write_files(spark, str(tmp_path), batches)
    stream = file_replay(spark, path, batch_df.schema)
    res = _run_to_memory(
        spark,
        streaming_reconcile_outer(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "click"),
            key_col="user_id",
            bound_seconds=5,
        ),
        "tx_outer_stream",
        str(tmp_path),
    )
    rows = res.collect()
    tags = {(r["user_id"], r["match_tag"]) for r in rows}
    assert (7, "matched") in tags
    assert (8, "unmatched_pay") in tags  # watermark-flushed, null receipt
    unmatched = [r for r in rows if r["match_tag"] == "unmatched_pay"][0]
    assert unmatched["receipt_event_id"] is None




def test_attribution_stateful_state_survives_batch_boundary(spark, tmp_path):
    from userbehavioranalysis_spark.streaming.stateful import attribution_stateful

    rows_schema = (
        "event_id long, user_id long, event_type string, value double, "
        "props string, sec long"
    )
    batches = [
        # batch 1: user 1 clicks campaign 7; user 2 purchases unattributed
        [(1, 1, "click", 0.0, '{"k": 7}', 100),
         (2, 2, "purchase", 3.0, "{}", 150)],
        # batch 2: user 1 purchases -> carried state attributes to 7;
        # a null-campaign click must stay transparent for the next buy
        [(3, 1, "purchase", 10.0, "{}", 200),
         (4, 1, "click", 0.0, "{}", 250),
         (5, 1, "purchase", 5.0, "{}", 300)],
    ]
    path = os.path.join(tmp_path, "stream")
    os.makedirs(path, exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, rows_schema).withColumn(
            "ts", F.timestamp_seconds("sec")
        ).drop("sec")
        df.coalesce(1).write.parquet(os.path.join(tmp_path, f"tmp{i}"))
        part = [f for f in os.listdir(os.path.join(tmp_path, f"tmp{i}"))
                if f.endswith(".parquet")][0]
        os.rename(os.path.join(tmp_path, f"tmp{i}", part),
                  os.path.join(path, f"batch_{i:03d}.parquet"))
    sdf = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, value double, "
            "props string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = _run_to_memory(
        spark, attribution_stateful(sdf), "attr_state_test", str(tmp_path)
    )
    got = {(r.user_id, r.purchase_us): r.campaign for r in out.collect()}
    assert got == {
        (2, 150_000_000): None,   # no prior click
        (1, 200_000_000): 7,      # carried across the batch boundary
        (1, 300_000_000): 7,      # null-campaign click stays transparent
    }


def test_run_bounded_cleans_checkpoint_dirs(spark, tmp_path):
    """Replay checkpoints are worthless once the bounded query ends —
    _run_bounded must rmtree its checkpoint dir on BOTH the success and
    the failure path, or a full driver sweep (and every aborted run)
    leaks a state dir per replay (VERDICT r4 item 7)."""
    import glob
    import tempfile

    from userbehavioranalysis_spark.registry import streaming as reg

    src = str(tmp_path / "ckpt_probe_src")
    spark.range(10).withColumnRenamed("id", "v").write.parquet(src)

    def ckpt_dirs(name):
        return set(glob.glob(os.path.join(tempfile.gettempdir(), f"uba_{name}_*")))

    # success path
    ok = spark.readStream.schema("v long").parquet(src)
    out = reg._run_bounded(ok, "ckpt_cleanup_ok")
    assert out.count() == 10
    assert ckpt_dirs("ckpt_cleanup_ok") == set()

    # failure path: assert_true poisons the micro-batch, _run_bounded
    # re-raises — the checkpoint must still be gone
    boom = (
        spark.readStream.schema("v long")
        .parquet(src)
        .withColumn("boom", F.expr("assert_true(v < 0)"))
    )
    with pytest.raises(RuntimeError):
        reg._run_bounded(boom, "ckpt_cleanup_boom")
    assert ckpt_dirs("ckpt_cleanup_boom") == set()


def test_streaming_checkpoint_recovery_is_exactly_once(spark, tmp_path):
    """Fault-recovery semantics under the replay machinery's own
    source/sink shape: a bounded run consumes what exists, the query
    dies, MORE data arrives, and a restart from the SAME checkpoint
    must process only the new files — the sink ends with every row
    exactly once (a re-read of file 1 would show up as duplicates)."""
    import os

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def stage(lo, hi, name):
        tmp = str(tmp_path / f"tmp_{name}")
        spark.range(lo, hi).withColumnRenamed("id", "v").coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.rename(os.path.join(tmp, part), os.path.join(src, f"{name}.parquet"))

    def run_once():
        q = (
            spark.readStream.schema("v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    stage(0, 10, "batch_000")
    run_once()  # consumes file 1, checkpoints its offset, terminates
    first = sorted(r.v for r in spark.read.parquet(sink).collect())
    assert first == list(range(10))

    stage(10, 20, "batch_001")
    stage(20, 30, "batch_002")
    run_once()  # restart from the same checkpoint: only files 2-3
    final = sorted(r.v for r in spark.read.parquet(sink).collect())
    assert final == list(range(30)), "duplicate or lost rows across restart"


def test_snapshot_refresh_pinned_day_survives_retention(spark):
    """The brief's retention leg for the snapshot-composed refresh
    loop (registry/streaming_refresh.q_streaming_snapshot_refresh_replay):
    after the replay ran (3 daily append-commits + a compaction), a
    retention sweep that KEEPS day k must leave snapshot_read(v_k)
    hash-identical to its pre-expiry content, and an expired day's pin
    must fail loudly (ValueError), never read wrong data."""
    from userbehavioranalysis_spark.registry import QUERIES
    from userbehavioranalysis_spark.registry.core import _STREAM_STAGE_CACHE
    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_expire,
        snapshot_read,
        snapshot_versions,
    )

    sf = "/root/testdata/sf0.001"
    QUERIES["streaming_snapshot_refresh_replay"](spark, sf).collect()
    snap = os.path.join(_STREAM_STAGE_CACHE[(sf, "snapshot-refresh-art")], "snap")
    # v1..v3 = days 0..2, v4 = the compaction
    assert snapshot_versions(snap) == [1, 2, 3, 4]

    rows = lambda v: {tuple(r) for r in snapshot_read(spark, snap, version=v).collect()}
    day1_before = rows(2)
    latest_before = rows(4)

    # keep_last=3 keeps [2, 3, 4]: day 1's pin survives byte-identical
    stats = snapshot_expire(snap, keep_last=3)
    assert stats["expired_versions"] == 1
    assert snapshot_versions(snap) == [2, 3, 4]
    assert rows(2) == day1_before
    assert rows(4) == latest_before

    # the expired day-0 pin fails loudly
    with pytest.raises(ValueError):
        snapshot_read(spark, snap, version=1)


def test_snapshot_sink_exactly_once_crash_recovery(spark, tmp_path):
    """snapshot_append_stream_batch's full failure matrix, beyond the
    registered replay: (a) a replayed batch id is skipped across a
    CRASH that orphaned its first attempt's data files (landed, never
    committed) — the replay commits fresh files once and vacuum
    reclaims the orphans; (b) id spaces are scoped per query name;
    (c) dedup deliberately SURVIVES a restore (rolling back a poisoned
    table must not re-open the door to the batch that poisoned it) —
    re-ingesting needs a fresh query_name."""
    from userbehavioranalysis_spark.sources.snapshots import (
        _write_new_files,
        snapshot_append_stream_batch,
        snapshot_read,
        snapshot_restore,
        snapshot_vacuum,
        snapshot_versions,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "lang")
    )
    b0 = docs.filter(F.col("doc_id") < 100)
    b1 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    tbl = str(tmp_path / "tbl")

    assert snapshot_append_stream_batch(b0, tbl, 0, "q") == 1
    # crash simulation: batch 1's first attempt landed files but died
    # before the manifest commit
    orphans = _write_new_files(b1, tbl)
    # the replay of batch 1 commits once...
    assert snapshot_append_stream_batch(b1, tbl, 1, "q") == 2
    # ...and a further replay is a no-op
    assert snapshot_append_stream_batch(b1, tbl, 1, "q") is None
    got = {r["doc_id"] for r in snapshot_read(spark, tbl).collect()}
    assert got == {r["doc_id"] for r in b0.unionByName(b1).collect()}

    # vacuum reclaims exactly the crashed attempt's files
    stats = snapshot_vacuum(tbl, min_age_seconds=0)
    assert stats["deleted_files"] == len(orphans)
    assert {r["doc_id"] for r in snapshot_read(spark, tbl).collect()} == got

    # a DIFFERENT stream's batch 0 is not confused with q's
    assert snapshot_append_stream_batch(b1.limit(5), tbl, 0, "q2") == 3

    # dedup survives the rollback: (q, 1) stays refused; a fresh
    # stream identity re-ingests
    snapshot_restore(tbl, 1)
    assert snapshot_append_stream_batch(b1, tbl, 1, "q") is None
    assert snapshot_append_stream_batch(b1, tbl, 1, "q_fresh") is not None
    assert snapshot_versions(tbl) == [1, 2, 3, 4, 5]
