"""Structured-Streaming replay queries (bounded availableNow
replays into memory/parquet sinks) and their staging helpers."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as _F

from userbehavioranalysis_spark import jobs as _jobs  # noqa: F401
from userbehavioranalysis_spark.functions import text as _T  # noqa: F401
from userbehavioranalysis_spark.operators import dedup as _dedup  # noqa: F401
from userbehavioranalysis_spark.operators import sequences as _seq  # noqa: F401
from userbehavioranalysis_spark.operators import similarity as _sim  # noqa: F401
from userbehavioranalysis_spark.operators import topn  # noqa: F401
from userbehavioranalysis_spark.operators import windowed_counts as wc  # noqa: F401
from userbehavioranalysis_spark.operators.graph import (  # noqa: F401
    item_triangles_oracle_sql as _triangles_oracle_sql,
    pagerank_oracle_sql as _pagerank_oracle_sql,
)
from userbehavioranalysis_spark.operators.sketches import (  # noqa: F401
    cms_oracle_sql as _cms_oracle_sql,
    histogram_quantiles_oracle_sql as _hq_oracle_sql,
    hll_oracle_sql as _hll_oracle_sql,
)
from userbehavioranalysis_spark.plans import relational as _rel  # noqa: F401
from userbehavioranalysis_spark.registry.core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _STREAM_STAGE_CACHE,
    _tables,
    query,
)
from userbehavioranalysis_spark.sources.readers import (  # noqa: F401
    events_with_item,
    load_testdata,
)
from userbehavioranalysis_spark.registry.dedup import _minhash_oracle  # noqa: F401
from userbehavioranalysis_spark.registry.behavior import (  # noqa: F401
    _BLACKLIST_THRESHOLD,
    _LOGIN_GAP_S,
    _ORDER_TIMEOUT_S,
    _SLIDING_1H_10M,
    _TX_BOUND_S,
)


def _stage_parquet(src: str, stage: str, name: str) -> None:
    """Symlink a parquet table into a streaming stage dir.

    ``src`` may be a single .parquet FILE (driver testdata) or a
    Spark-written parquet DIRECTORY (synthesized scale data) — the file
    source ignores nested directories, so a directory's part files are
    linked FLAT into the stage (a dir symlink would silently stream 0
    rows; observed at sf1)."""
    import os

    if os.path.isdir(src):
        parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        for i, f in enumerate(parts):
            os.symlink(
                os.path.join(src, f),
                os.path.join(stage, f"{name}_{i:05d}.parquet"),
            )
    else:
        os.symlink(src, os.path.join(stage, f"{name}.parquet"))


def _replay_events_stream(spark: SparkSession, sf_dir: str):
    """events.parquet as a bounded stream (ts read as a raw epoch long;
    unit normalized by magnitude — see readers.epoch_any_to_ts)."""
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark import schemas as _schemas
    from userbehavioranalysis_spark.sources.readers import epoch_any_to_ts

    # the file source needs a directory: stage a symlink dir around the
    # single events.parquet file (read-only testdata stays untouched)
    import os
    import tempfile

    stage = _STREAM_STAGE_CACHE.get(sf_dir)
    if stage is None or not os.path.isdir(stage):
        stage = tempfile.mkdtemp(prefix="uba_events_stream_")
        _stage_parquet(sf_dir, stage, "events")
        _STREAM_STAGE_CACHE[sf_dir] = stage
    raw = (
        spark.readStream.format("parquet")
        .schema(_schemas.EVENTS_RAW)
        .load(stage)
        .where(F.col("event_id").isNotNull())
    )
    return raw.withColumn("ts", epoch_any_to_ts("ts"))


def _replay_events_stream_late(spark: SparkSession, sf_dir: str):
    """events.parquet as TWO ordered micro-batches with genuine late data.

    Every 20th event (pmod(event_id, 20) = 0 — deterministic, ~5%) is
    held back into the second file, so batch 2 delivers events that are
    event-time EARLIER than batch 1's watermark high-mark: real
    allowedLateness-style late arrivals (NetworkFlow.scala:47 W4), not
    merely out-of-order within a batch.  ``maxFilesPerTrigger=1`` makes
    the file boundary a micro-batch boundary.
    """
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from userbehavioranalysis_spark import schemas as _schemas
    from userbehavioranalysis_spark.sources.readers import epoch_any_to_ts

    key = (sf_dir, "late-split")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(stage):
        stage = tempfile.mkdtemp(prefix="uba_events_late_")
        raw = spark.read.schema(_schemas.EVENTS_RAW).parquet(
            os.path.join(sf_dir, "events.parquet")
        )
        for i, frame in enumerate(
            (
                raw.where(F.pmod("event_id", F.lit(20)) != 0),
                raw.where(F.pmod("event_id", F.lit(20)) == 0),
            )
        ):
            tmp = os.path.join(stage, f"tmp{i}")
            frame.coalesce(1).write.parquet(tmp)
            part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
            os.rename(
                os.path.join(tmp, part), os.path.join(stage, f"batch_{i:03d}.parquet")
            )
            shutil.rmtree(tmp)
        _STREAM_STAGE_CACHE[key] = stage
    raw = (
        spark.readStream.format("parquet")
        .schema(_schemas.EVENTS_RAW)
        .option("maxFilesPerTrigger", 1)
        .load(stage)
        .where(F.col("event_id").isNotNull())
    )
    return raw.withColumn("ts", epoch_any_to_ts("ts"))


def _run_bounded(sdf, name: str, partitions: int = 8, output_mode: str = "append"):
    import shutil
    import tempfile

    from pyspark.sql import SparkSession as _S

    spark = _S.getActiveSession()
    ckpt = tempfile.mkdtemp(prefix=f"uba_{name}_")
    # 8 shuffle/state partitions for JVM-side replays: the state-store
    # partition count is fixed at a checkpoint's first run (AQE cannot
    # coalesce stateful streaming exchanges), and 32 state instances per
    # tiny replay is pure per-task overhead.  Python-bound
    # applyInPandasWithState replays pass partitions=32 instead — their
    # cost is the per-group pandas work, which wants the parallelism.
    # Fresh checkpoint per call makes the change safe; restored
    # afterwards so batch queries keep the session default.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(300)
        except Exception as exc:  # StreamingQueryException on failed batch
            raise RuntimeError(f"streaming replay {name!r} failed") from exc
        # a silent partial/empty memory table would be scored as a genuine
        # mismatch by the oracle harness — fail loudly instead
        if q.exception() is not None:
            raise RuntimeError(f"streaming replay {name!r} failed") from q.exception()
        if not finished:
            q.stop()
            raise TimeoutError(f"streaming replay {name!r} exceeded 300s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        # bounded replay into a memory sink: the checkpoint has no
        # recovery value once the query terminated — don't leak a state
        # dir per call under repeated driver runs
        shutil.rmtree(ckpt, ignore_errors=True)
    # Spill the memory sink to parquet and DROP it: a retained memory
    # table (plus its terminated query's state-store providers) per
    # replay accumulates across a 140-query run — measured as 2-6×
    # ambient drag on every query that runs after the replay block.
    # Replay outputs are small (≤ tens of k rows), so the extra write
    # is noise; the returned frame re-reads from disk, keeping the
    # session heap flat no matter how many replays a run chains.
    import os

    spill_stage = _STREAM_STAGE_CACHE.get(("spill", name))
    if spill_stage is None:
        spill_stage = tempfile.mkdtemp(prefix=f"uba_spill_{name}_")
        _STREAM_STAGE_CACHE[("spill", name)] = spill_stage
    out = os.path.join(spill_stage, "out")
    shutil.rmtree(out, ignore_errors=True)
    spark.table(name).write.parquet(out)
    spark.catalog.dropTempView(name)
    return spark.read.parquet(out)


def _run_bounded_foreach(sdf, name: str, batch_fn, partitions: int = 8):
    """Bounded foreachBatch replay: apply ``batch_fn`` per micro-batch,
    append results to parquet (no driver-side collect — the sink is
    distributed), return the accumulated frame.

    The staging dir is keyed per query name and wiped at each call —
    repeated driver runs reuse one path instead of leaking tempdirs.
    """
    import os
    import shutil
    import tempfile

    from pyspark.sql import SparkSession as _S

    spark = _S.getActiveSession()
    stage = _STREAM_STAGE_CACHE.get(("foreach-out", name))
    if stage is None:
        stage = tempfile.mkdtemp(prefix=f"uba_fb_{name}_")
        _STREAM_STAGE_CACHE[("foreach-out", name)] = stage
    out = os.path.join(stage, "out")
    shutil.rmtree(out, ignore_errors=True)

    def _handle(batch_df, _bid):
        batch_fn(batch_df).write.mode("append").parquet(out)

    ckpt = tempfile.mkdtemp(prefix=f"uba_{name}_")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        q = (
            sdf.writeStream.foreachBatch(_handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(300)
        except Exception as exc:  # StreamingQueryException on failed batch
            raise RuntimeError(f"streaming replay {name!r} failed") from exc
        if q.exception() is not None:
            raise RuntimeError(f"streaming replay {name!r} failed") from q.exception()
        if not finished:
            q.stop()
            raise TimeoutError(f"streaming replay {name!r} exceeded 300s")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(ckpt, ignore_errors=True)
    return spark.read.parquet(out)


@query(
    "streaming_asof_replay",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS us, value FROM events
    ), c AS (
        SELECT user_id, us FROM e WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, us, max(value) AS pay_value
        FROM e WHERE event_type = 'purchase' GROUP BY 1, 2
    )
    SELECT c.user_id, CAST(c.us AS BIGINT) AS click_us,
           CAST(p.us AS BIGINT) AS pay_us, p.pay_value
    FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us >= p.us
    """,
)
def q_streaming_asof_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (as-of) enrichment of a stream against a static table —
    Flink's temporal table join, Spark-first: each micro-batch of
    clicks runs the batch union-trick as-of join against the static
    purchase table inside foreachBatch, appending to a distributed
    parquet sink (no driver collect).  Each click's match depends only
    on the static side, so the appended union is batch-equivalent by
    construction regardless of micro-batch boundaries — the oracle is
    the SAME DuckDB ASOF LEFT JOIN as the batch query."""
    import os

    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.asof import as_of_join

    static = _tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "value"
    )
    pays = (
        static.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "us")
        .agg(F.max("value").alias("pay_value"))
    )
    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("us"))
    )

    def _asof_batch(batch_df):
        return as_of_join(batch_df, pays, keys=["user_id"], ts_col="us").select(
            "user_id",
            F.col("us").alias("click_us"),
            F.col("us_asof").alias("pay_us"),
            F.col("pay_value_asof").alias("pay_value"),
        )

    return _run_bounded_foreach(clicks, "streaming_asof_replay", _asof_batch)


@query(
    "streaming_page_view_replay",
    oracle="""
    WITH agg AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600 AS window_end,
               CAST(count(*) AS BIGINT) AS pv_count
        FROM events
        WHERE event_type = 'view'
        GROUP BY 1, 2
    )
    SELECT * FROM agg
    WHERE window_end <= (SELECT epoch(max(ts)) FROM events
                         WHERE event_type = 'view')
    """,
)
def q_streaming_page_view_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageView as a real Structured Streaming job: parquet file stream →
    filter → watermark → windowed count → append-mode memory sink.
    Append mode emits exactly the watermark-closed windows; the
    watermark is defined by the filtered (view) stream, so the oracle
    bounds closure on the max *view* event time."""
    import os

    from userbehavioranalysis_spark.streaming.jobs import streaming_page_view

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return _run_bounded(
        streaming_page_view(stream, watermark="0 seconds"), "uba_stream_pv"
    )


@query(
    "streaming_page_view_late_replay",
    oracle="""
    SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
           CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600 AS window_end,
           CAST(count(*) AS BIGINT) AS pv_count
    FROM events
    WHERE event_type = 'view'
    GROUP BY 1, 2
    """,
)
def q_streaming_page_view_late_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 allowedLateness semantics (NetworkFlow.scala:47) under REAL
    late data: ~5% of events arrive in a second micro-batch after the
    watermark high-mark of the first — the documented mapping is
    watermark-delay + update mode, where a late arrival re-fires its
    window with an updated count (the reference re-emits on every late
    element within allowedLateness).  The watermark delay (2 days >
    dataset span) admits every late event, so the LAST update per
    window must equal the batch count over all events — final-state
    equivalence, which the oracle asserts.  Counts are monotone, so
    max() selects the final re-fire per window.
    """
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.streaming.jobs import streaming_page_view

    stream = _replay_events_stream_late(spark, sf_dir)
    updates = _run_bounded(
        streaming_page_view(stream, watermark="2 days"),
        "uba_stream_pv_late",
        output_mode="update",
    )
    return updates.groupBy("window_start", "window_end").agg(
        F.max("pv_count").alias("pv_count")
    )


@query(
    "streaming_unique_visitors_replay",
    oracle="""
    WITH agg AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 + 3600 AS window_end,
               CAST(count(DISTINCT user_id) AS BIGINT) AS uv_count
        FROM events
        WHERE event_type = 'view'
        GROUP BY 1, 2
    )
    SELECT * FROM agg
    WHERE window_end <= (SELECT epoch(max(ts)) FROM events
                         WHERE event_type = 'view')
    """,
)
def q_streaming_unique_visitors_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct UV as a streaming windowed agg (append mode emits
    watermark-closed windows; the watermark is defined by the filtered
    view stream, so the oracle bounds on max *view* event time)."""
    import os

    from userbehavioranalysis_spark.streaming.jobs import streaming_unique_visitors

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return _run_bounded(
        streaming_unique_visitors(stream, watermark="0 seconds"), "uba_stream_uv"
    )


@query(
    "streaming_marketing_replay",
    oracle="""
    WITH w AS (
        SELECT (CAST(floor(epoch(ts) / 600) AS BIGINT) - g.i) * 600 AS window_start,
               e.*
        FROM events e CROSS JOIN generate_series(0, 5) g(i)
        WHERE event_type <> 'UNINSTALL'
    ), agg AS (
        SELECT window_start, window_start + 3600 AS window_end,
               CAST(count(*) AS BIGINT) AS mkt_count
        FROM w GROUP BY 1, 2
    )
    SELECT * FROM agg
    WHERE window_end <= (SELECT epoch(max(ts)) FROM events)
    """,
)
def q_streaming_marketing_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h/10min total as a streaming agg — append mode emits
    every aligned window closed by the final watermark."""
    import os

    import pyspark.sql.functions as F

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    counts = (
        stream.withWatermark("ts", "0 seconds")
        .filter(F.col("event_type") != "UNINSTALL")
        .groupBy(F.window("ts", "1 hour", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("mkt_count"))
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "mkt_count",
        )
    )
    return _run_bounded(counts, "uba_stream_mkt")


@query(
    "streaming_marketing_channel_replay",
    oracle="""
    WITH w AS (
        SELECT (CAST(floor(epoch(ts) / 600) AS BIGINT) - g.i) * 600 AS window_start,
               e.*
        FROM events e CROSS JOIN generate_series(0, 5) g(i)
        WHERE event_type <> 'UNINSTALL'
    ), agg AS (
        SELECT window_start, window_start + 3600 AS window_end,
               event_type AS channel,
               CAST(count(*) AS BIGINT) AS mkt_count
        FROM w GROUP BY 1, 2, 3
    )
    SELECT * FROM agg
    WHERE window_end <= (SELECT epoch(max(ts)) FROM events
                         WHERE event_type <> 'UNINSTALL')
    """,
)
def q_streaming_marketing_channel_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win6 streaming form: keyed sliding count by channel
    (AppMarketingByChannel.scala:24-42) as an append-mode windowed agg;
    oracle bounds closure on the filtered stream's max event time."""
    import os

    import pyspark.sql.functions as F

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    counts = (
        stream.filter(F.col("event_type") != "UNINSTALL")
        .withWatermark("ts", "0 seconds")
        .groupBy(
            F.window("ts", "1 hour", "10 minutes"),
            F.col("event_type").alias("channel"),
        )
        .agg(F.count(F.lit(1)).alias("mkt_count"))
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "channel",
            "mkt_count",
        )
    )
    return _run_bounded(counts, "uba_stream_mktch")


@query(
    "streaming_ad_geo_replay",
    oracle="""
    WITH w AS (
        SELECT (CAST(floor(epoch(ts) / 300) AS BIGINT) - g.i) * 300 AS window_start,
               e.*
        FROM events e CROSS JOIN generate_series(0, 11) g(i)
        WHERE e.event_type = 'click'
    ), agg AS (
        SELECT window_start, window_start + 3600 AS window_end,
               n_name AS nation,
               CAST(count(*) AS BIGINT) AS click_count
        FROM w
        JOIN customer ON w.user_id = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2, 3
    )
    SELECT * FROM agg
    WHERE window_end <= (SELECT epoch(max(ts)) FROM events
                         WHERE event_type = 'click')
    """,
)
def q_streaming_ad_geo_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Win8/geo streaming form: STREAM-STATIC join — the click stream
    broadcast-joins the static customer/nation dims (stateless, the
    production enrich-then-aggregate pattern), then a keyed sliding
    windowed count in append mode (AdStatisticsByGeo.scala:24-44
    semantics over the testdata geography)."""
    import os

    import pyspark.sql.functions as F

    t = _tables(spark, sf_dir)
    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    enriched = (
        stream.filter(F.col("event_type") == "click")
        .withWatermark("ts", "0 seconds")
        .join(
            F.broadcast(
                t["customer"].join(
                    t["nation"],
                    t["customer"]["c_nationkey"] == t["nation"]["n_nationkey"],
                ).select(
                    F.col("c_custkey").alias("user_id"),
                    F.col("n_name").alias("nation"),
                )
            ),
            "user_id",
        )
    )
    counts = (
        enriched.groupBy(F.window("ts", "1 hour", "5 minutes"), "nation")
        .agg(F.count(F.lit(1)).alias("click_count"))
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            F.col("window.end").cast("long").alias("window_end"),
            "nation",
            "click_count",
        )
    )
    return _run_bounded(counts, "uba_stream_adgeo")


@query(
    "streaming_hot_items_replay",
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
def q_streaming_hot_items_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Top-N via update-mode counts + foreachBatch upsert/rank
    (A7 streaming form).  The driver-side TopNState converges to the
    batch ranking, so the full hot-items oracle applies."""
    import os

    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.streaming.jobs import run_topn_foreachBatch

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    views = stream.filter(F.col("event_type") == "view").withColumn(
        "item_id", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )
    q, state = run_topn_foreachBatch(
        views, "item_id", 3, "1 hour", "5 minutes", watermark="0 seconds"
    )
    finished = q.awaitTermination(300)
    if q.exception() is not None:
        raise RuntimeError(
            "streaming replay 'hot_items' failed"
        ) from q.exception()
    if not finished:
        q.stop()
        raise RuntimeError("streaming replay 'hot_items' timed out after 300s")
    rows = [
        (ws, ws + 3600, item, cnt, rank)
        for ws, items in state.topn().items()
        for rank, (item, cnt) in enumerate(items, start=1)
    ]
    return spark.createDataFrame(
        rows,
        "window_start long, window_end long, item_id long, view_count long, rank int",
    )


@query(
    "streaming_login_fail_replay",
    oracle=f"""
    WITH l AS (
        SELECT user_id, event_type, ts,
               lag(event_type) OVER w AS prev_type,
               lag(ts) OVER w AS prev_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           epoch_us(prev_ts) AS first_fail_ts_us,
           epoch_us(ts) AS last_fail_ts_us,
           'login fail!' AS warning_msg
    FROM l
    WHERE event_type = 'error' AND prev_type = 'error'
      AND epoch_us(ts) - epoch_us(prev_ts) <= {_LOGIN_GAP_S * 1_000_000}
    """,
)
def q_streaming_login_fail_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict login-fail detection as applyInPandasWithState (C1/C2
    streaming form).  Warnings emit immediately (not watermark-gated),
    so the bounded replay matches the batch operator exactly."""
    import os

    from userbehavioranalysis_spark.streaming.stateful import login_fail_stateful

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return _run_bounded(
        login_fail_stateful(stream, _LOGIN_GAP_S, fail_type="error"),
        "uba_stream_lf",
        partitions=32,
    )


@query(
    "streaming_blacklist_replay",
    oracle=f"""
    SELECT user_id, event_id, CAST(seq AS INTEGER) AS seq,
           seq = {_BLACKLIST_THRESHOLD + 1} AS is_warning
    FROM (
        SELECT user_id, event_id,
               row_number() OVER (
                   PARTITION BY user_id, CAST(floor(epoch(ts) / 86400) AS BIGINT)
                   ORDER BY ts, event_id) AS seq
        FROM events
    )
    WHERE seq <= {_BLACKLIST_THRESHOLD + 1}
    """,
)
def q_streaming_blacklist_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click-fraud filter as applyInPandasWithState (C5 streaming form):
    first N events pass, the crossing event emits the one warning row
    (the isSentBlackList latch)."""
    import os

    from userbehavioranalysis_spark.streaming.stateful import blacklist_stateful

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return _run_bounded(
        blacklist_stateful(stream, _BLACKLIST_THRESHOLD), "uba_stream_bl", partitions=32
    )


@query(
    "streaming_tx_match_replay",
    oracle=f"""
    SELECT p.user_id,
           p.event_id AS pay_event_id,
           epoch_us(p.ts) AS pay_ts_us,
           r.event_id AS receipt_event_id,
           epoch_us(r.ts) AS receipt_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON p.user_id = r.user_id
     AND epoch_us(r.ts) >= epoch_us(p.ts) - {_TX_BOUND_S * 1_000_000}
     AND epoch_us(r.ts) <= epoch_us(p.ts) + {_TX_BOUND_S * 1_000_000}
    """,
)
def q_streaming_tx_match_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner interval join (J1 streaming form) — inner
    matches emit eagerly, so the bounded replay equals the batch join."""
    import os

    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.streaming.jobs import streaming_interval_join

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return _run_bounded(
        streaming_interval_join(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "click"),
            key_col="user_id",
            bound_seconds=_TX_BOUND_S,
        ),
        "uba_stream_tx",
    )


@query(
    "streaming_user_sessions_replay",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS t,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS pt
        FROM events
    ), isl AS (
        SELECT user_id, t,
               sum(CASE WHEN pt IS NULL OR t - pt > 1800000000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY t
                         ROWS UNBOUNDED PRECEDING) AS sid
        FROM e
    ), s AS (
        SELECT user_id,
               CAST(min(t) // 1000000 AS BIGINT) AS session_start,
               CAST((max(t) + 1800000000) // 1000000 AS BIGINT) AS session_end,
               CAST(count(*) AS BIGINT) AS event_count,
               (max(t) + 1800000000) AS end_us
        FROM isl GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, event_count
    FROM s
    WHERE end_us <= (SELECT epoch_us(max(ts)) FROM events)
    """,
)
def q_streaming_user_sessions_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows as a streaming agg: append mode emits sessions
    the watermark has closed (gap elapsed past the last event), which
    the oracle replicates with the end <= max-event-time bound."""
    import os

    from userbehavioranalysis_spark.operators.windowed_counts import user_sessions

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    sessions = user_sessions(stream.withWatermark("ts", "0 seconds"))
    return _run_bounded(sessions, "uba_stream_sess")


@query(
    "streaming_tx_reconcile_replay",
    oracle=f"""
    WITH p AS (
        SELECT user_id, event_id AS pay_event_id, epoch_us(ts) AS pay_us
        FROM events WHERE event_type = 'purchase'
    ), r AS (
        SELECT user_id, event_id AS receipt_event_id, epoch_us(ts) AS receipt_us
        FROM events WHERE event_type = 'click'
    ),
    -- final event-time watermark of the bounded replay: two watermarked
    -- inputs, global watermark = min of the per-input maxima (0s delay)
    wm AS (SELECT least((SELECT max(pay_us) FROM p),
                        (SELECT max(receipt_us) FROM r)) AS w),
    m AS (
        SELECT p.user_id, p.pay_event_id, p.pay_us AS pay_ts_us,
               r.receipt_event_id, r.receipt_us AS receipt_ts_us,
               'matched' AS match_tag
        FROM p JOIN r ON p.user_id = r.user_id
           AND r.receipt_us BETWEEN p.pay_us - {_TX_BOUND_S * 1_000_000}
                                AND p.pay_us + {_TX_BOUND_S * 1_000_000}
    )
    SELECT * FROM m
    UNION ALL
    -- an unmatched row emits (with nulls) once the watermark passes its
    -- join range; rows whose range is still open at end-of-stream are
    -- withheld — exactly Spark's outer-join state eviction
    SELECT user_id, pay_event_id, pay_us, NULL, NULL, 'unmatched_pay'
    FROM p
    WHERE pay_event_id NOT IN (SELECT pay_event_id FROM m)
      AND pay_us + {_TX_BOUND_S * 1_000_000} < (SELECT w FROM wm)
    UNION ALL
    SELECT user_id, NULL, NULL, receipt_event_id, receipt_us, 'unmatched_receipt'
    FROM r
    WHERE receipt_event_id NOT IN (SELECT receipt_event_id FROM m)
      AND receipt_us + {_TX_BOUND_S * 1_000_000} < (SELECT w FROM wm)
    """,
)
def q_streaming_tx_reconcile_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer stream-stream reconciliation (J2 streaming form,
    TxMacthDetect.scala:42-98).  The oracle replicates the watermark
    semantics of the bounded replay: matches always emit; unmatched
    rows emit iff the final watermark (min of the two sides' max event
    times) passed their join range."""
    import os

    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.streaming.jobs import streaming_reconcile_outer

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return _run_bounded(
        streaming_reconcile_outer(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "click"),
            key_col="user_id",
            bound_seconds=_TX_BOUND_S,
        ),
        "uba_stream_txo",
    )


@query(
    "streaming_order_timeout_replay",
    oracle="""
    WITH wm AS (SELECT epoch_us(max(ts)) - 10000000 AS w FROM events),
    agg AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS create_us,
               min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS pay_us
        FROM events GROUP BY user_id
    ), c AS (
        SELECT user_id AS order_id,
          CASE
            WHEN create_us IS NOT NULL AND pay_us IS NOT NULL THEN
              CASE WHEN pay_us <= create_us + 21600000000
                   THEN 'payed successfully'
                   ELSE 'payed but already timeout' END
            -- timer outcomes need the final watermark (max ts - 10s)
            -- past first-event + timeout; pending orders are withheld
            WHEN create_us IS NOT NULL
                 AND create_us + 21600000000 < (SELECT w FROM wm)
                 THEN 'order timeout'
            WHEN pay_us IS NOT NULL
                 AND pay_us + 21600000000 < (SELECT w FROM wm)
                 THEN 'already payed but not found create log'
          END AS result_msg
        FROM agg
    )
    SELECT order_id, result_msg,
           result_msg <> 'payed successfully' AS is_timeout
    FROM c WHERE result_msg IS NOT NULL
    """,
)
def q_streaming_order_timeout_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-timeout as a stateful streaming job (applyInPandasWithState
    with event-time timers, OrderTimeoutWithoutCep.scala:33-97).  The
    oracle mirrors the replay's watermark semantics: both-sides-seen
    orders classify immediately; single-sided orders classify via the
    event-time timer only if the final watermark passed first-event +
    timeout, else they stay pending (withheld)."""
    import os

    from userbehavioranalysis_spark.streaming.stateful import order_timeout_stateful

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    return _run_bounded(
        order_timeout_stateful(stream, timeout_seconds=21600), "uba_stream_ot", partitions=32
    )


@query(
    "streaming_dedup_watermark_replay",
    oracle="""
    SELECT event_id, user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us
    FROM events
    """,
)
def q_streaming_dedup_watermark_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state streaming dedup via ``dropDuplicatesWithinWatermark``
    — the production answer to `streaming_dedup_replay`'s global-state
    caveat: per-key state lives only until the watermark passes the
    event's time + delay, so state is O(events within the lateness
    horizon), not O(all distinct keys ever).  The input is the event
    stream unioned with itself (every row a genuine duplicate); exact
    recovery of each event once proves the dedup, hash-checked against
    a plain scan.  Emission is append-on-first-sight, so micro-batch
    slicing cannot affect the output set."""
    import os

    import pyspark.sql.functions as F

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    doubled = stream.unionAll(stream)
    dedup = (
        doubled.withWatermark("ts", "5 seconds")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
        )
    )
    return _run_bounded(dedup, "uba_stream_ddw", partitions=8)


@query(
    "streaming_latest_state_replay",
    oracle="""
    SELECT user_id, event_type,
           CAST(epoch_us(ts) AS BIGINT) AS last_us,
           round(value, 4) AS last_value_r4,
           event_id AS last_event_id
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_streaming_latest_state_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained current-state table: the streaming twin
    of ``latest_state`` (operators/compaction.py).  A running
    ``max_by(payload, (ts, tie))`` aggregation in complete mode keeps
    exactly one row of state per key — the CDC materialized-view shape.
    State is O(distinct keys) by construction (each key stores only its
    winning struct, not history), and max over a struct is
    order-insensitive, so the result is independent of micro-batch
    slicing and equals the batch oracle exactly."""
    import os

    import pyspark.sql.functions as F

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    agg = (
        stream.select("user_id", "event_type", "ts", "value", "event_id")
        .groupBy("user_id", "event_type")
        .agg(
            F.max_by(
                F.struct("ts", "value", "event_id"), F.struct("ts", "event_id")
            ).alias("_l")
        )
    )
    out = agg.select(
        "user_id",
        "event_type",
        F.unix_micros("_l.ts").alias("last_us"),
        F.round("_l.value", 4).alias("last_value_r4"),
        F.col("_l.event_id").alias("last_event_id"),
    )
    return _run_bounded(out, "uba_stream_ls", partitions=8, output_mode="complete")


@query(
    "streaming_dedup_replay",
    oracle="""
    SELECT md5(text) AS text_md5,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1
    """,
)
def q_streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup as a RUNNING streaming aggregation — the incremental
    form of ``dedup_exact`` a continuously-ingesting corpus needs: docs
    arrive as a file stream, state keeps (n_docs, keeper_id) per
    content hash, complete mode emits the final state.  No watermark:
    dedup state is global (a duplicate may arrive arbitrarily late), so
    at scale this state is the true cost of streaming dedup — it grows
    with distinct documents, which is why production pipelines bound it
    (TTL or periodic batch compaction).  min()/count() are
    order-insensitive, so the result is deterministic regardless of
    micro-batch slicing and equals the batch oracle exactly."""
    import os
    import tempfile

    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    docs_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    key = (sf_dir, "docs")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(stage):
        stage = tempfile.mkdtemp(prefix="uba_docs_stream_")
        _stage_parquet(
            os.path.join(sf_dir, "documents.parquet"), stage, "documents"
        )
        _STREAM_STAGE_CACHE[key] = stage
    raw = spark.readStream.format("parquet").schema(docs_schema).load(stage)
    agg = (
        raw.select(F.md5(F.encode("text", "utf-8")).alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").alias("keeper_id"),
        )
    )
    return _run_bounded(agg, "uba_stream_dedup", output_mode="complete")


@query(
    "streaming_hot_items_report_replay",
    oracle="""
    WITH w AS (
        SELECT (CAST(floor(epoch(ts) / 300) AS BIGINT) - g.i) * 300 AS window_start,
               CAST(json_extract(props, '$.k') AS BIGINT) AS item_id
        FROM events e CROSS JOIN generate_series(0, 11) g(i)
        WHERE e.event_type = 'view'
    ), counts AS (
        SELECT window_start, item_id, CAST(count(*) AS BIGINT) AS view_count
        FROM w GROUP BY 1, 2
    ), ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY view_count DESC, item_id ASC) AS rank
        FROM counts
    )
    SELECT window_start + 3600 AS window_end,
           '时间:' || strftime(epoch_ms((window_start + 3600) * 1000),
                               '%Y-%m-%d %H:%M:%S') || '.0' || chr(10) ||
           string_agg('No' || rank || ': 商品ID=' || item_id ||
                      ' 浏览量=' || view_count || chr(10), '' ORDER BY rank) ||
           repeat('=', 32) AS report
    FROM ranked WHERE rank <= 3
    GROUP BY window_start
    """,
)
def q_streaming_hot_items_report_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's complete streaming output path, end to end: a
    Structured Streaming replay drives the update-mode counts +
    foreachBatch top-N (exactly ``streaming_hot_items_replay``), and
    the converged ranking renders through the byte-exact report layer
    (HotItems.scala:139-152).  Hash-equality against the BATCH report
    oracle proves the streamed, formatted output a console sink would
    print matches the reference's printed format and values."""
    from userbehavioranalysis_spark.functions.reports import hot_items_report

    return hot_items_report(q_streaming_hot_items_replay(spark, sf_dir))


@query(
    "streaming_attribution_replay",
    oracle="""
    WITH seq AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type = 'click'
                               THEN TRY_CAST(json_extract_string(props, '$.k')
                                             AS BIGINT) END
                          IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS campaign
        FROM events
    )
    SELECT campaign,
           CAST(count(*) AS BIGINT) AS n_conversions,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2)
               AS attributed_value_r2
    FROM seq WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_streaming_attribution_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution as applyInPandasWithState: per-user keyed
    state (ONE long — the last click's campaign) enriches purchases the
    moment they arrive; the bounded replay's per-purchase attributions
    aggregate to exactly the batch operator's campaign totals (same
    oracle as ``attribution_last_touch``)."""
    import os

    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.streaming.stateful import attribution_stateful

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    attr = _run_bounded(
        attribution_stateful(stream), "uba_stream_attr", partitions=32
    )
    return attr.groupBy("campaign").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 2
        ).alias("attributed_value_r2"),
    )


@query(
    "streaming_anomaly_replay",
    oracle="""
    WITH closed AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_no,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        WHERE (CAST(epoch_us(ts) // 3600000000 AS BIGINT) + 1) * 3600000000
              <= (SELECT max(epoch_us(ts)) FROM events)
        GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type, hour_no, n_events,
               count(*) OVER w AS n_prev,
               sum(n_events) OVER w AS sum_prev,
               sum(n_events * n_events) OVER w AS sumsq_prev
        FROM closed
        WINDOW w AS (PARTITION BY event_type ORDER BY hour_no
                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_no, n_events,
           round(CASE WHEN n_prev * sumsq_prev - sum_prev * sum_prev > 0
                      THEN CAST(n_prev * n_events - sum_prev AS DOUBLE)
                           / sqrt(CAST(n_prev * sumsq_prev
                                       - sum_prev * sum_prev AS DOUBLE))
                 END, 4) AS zscore_r4,
           coalesce(abs(CASE WHEN n_prev * sumsq_prev - sum_prev * sum_prev > 0
                             THEN CAST(n_prev * n_events - sum_prev AS DOUBLE)
                                  / sqrt(CAST(n_prev * sumsq_prev
                                              - sum_prev * sum_prev AS DOUBLE))
                        END) >= 3.0, FALSE) AS is_anomaly
    FROM stats WHERE n_prev = 24
    """,
)
def q_streaming_anomaly_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection fed by a LIVE windowed aggregate: the
    hourly (type, hour) counts come from a watermark-closed streaming
    tumbling-window aggregate (append mode emits exactly the closed
    hours — the final partial hour correctly never emits), and the
    z-score core is the SAME code as the batch operator
    (``zscore_over_hourly``), applied to the replayed frame."""
    import os

    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.sequences import zscore_over_hourly

    stream = _replay_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    hourly = (
        stream.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            F.expr("unix_micros(window.start) div 3600000000").alias("hour_no"),
            "n_events",
        )
    )
    replayed = _run_bounded(hourly, "uba_stream_anom")
    return zscore_over_hourly(replayed)


@query("streaming_cms_replay", oracle=_cms_oracle_sql())
def q_streaming_cms_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch as BOUNDED streaming state: the (d, bucket)
    count table builds over the documents stream in complete mode —
    state is depth·width rows no matter how long the stream runs (the
    sketch IS the bounded-state form of 'count every token ever
    seen') — then the batch probe against the replayed sketch matches
    the batch CMS oracle exactly."""
    import os
    import tempfile

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from userbehavioranalysis_spark.operators.sketches import cms_probe, cms_sketch

    _DOCS_SCHEMA = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    key = (sf_dir, "docs")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(stage):
        stage = tempfile.mkdtemp(prefix="uba_docs_stream_")
        _stage_parquet(
            os.path.join(sf_dir, "documents.parquet"), stage, "documents"
        )
        _STREAM_STAGE_CACHE[key] = stage
    stream = spark.readStream.format("parquet").schema(_DOCS_SCHEMA).load(stage)
    sketch = _run_bounded(
        cms_sketch(stream), "uba_stream_cms", output_mode="complete"
    )
    return cms_probe(sketch, _tables(spark, sf_dir)["documents"])


@query("streaming_histogram_replay", oracle=_hq_oracle_sql())
def q_streaming_histogram_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same histogram as BOUNDED streaming state: complete-mode
    groupBy(bin) counts over the documents stream (state ≤ bin-domain
    rows forever), then the quantile probe reads the replayed state —
    matching the batch oracle exactly."""
    import os
    import tempfile

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from userbehavioranalysis_spark.operators.sketches import histogram_bins

    docs_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    )
    key = (sf_dir, "docs")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(stage):
        stage = tempfile.mkdtemp(prefix="uba_docs_stream_")
        _stage_parquet(
            os.path.join(sf_dir, "documents.parquet"), stage, "documents"
        )
        _STREAM_STAGE_CACHE[key] = stage
    stream = spark.readStream.format("parquet").schema(docs_schema).load(stage)
    hist = _run_bounded(
        histogram_bins(stream), "uba_stream_hist", output_mode="complete"
    )
    # quantile extraction over the replayed bin-domain-sized state: reuse
    # the batch probe by substituting the histogram via a temp view
    from pyspark.sql import Window as _W

    w = _W.orderBy("bin").rowsBetween(_W.unboundedPreceding, 0)
    total_w = _W.orderBy("bin").rowsBetween(
        _W.unboundedPreceding, _W.unboundedFollowing
    )
    cum = hist.select(
        "bin",
        _F.sum("n_docs").over(w).alias("cum"),
        _F.sum("n_docs").over(total_w).alias("total"),
    )
    qlit = _F.explode(_F.array(*[_F.lit(q) for q in (250, 500, 900, 990)])).alias(
        "q_permille"
    )
    probe = cum.select("bin", "cum", "total", qlit)
    return (
        probe.where(
            _F.lit(1000) * _F.col("cum") >= _F.col("q_permille") * _F.col("total")
        )
        .groupBy("q_permille")
        .agg(_F.min("bin").alias("bin"))
        .select(
            "q_permille", "bin", ((_F.col("bin") + 1) * _F.lit(32)).alias("est_hi")
        )
    )


@query("streaming_uv_hll_replay", oracle=_hll_oracle_sql())
def q_streaming_uv_hll_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HLL register table as BOUNDED streaming state: complete-mode
    groupBy(window, reg) max(rho) — ≤ windows·m rows forever (the
    UvWithBloom.scala:62-103 bounded-memory idea, Redis replaced by
    mergeable state) — probed post-replay against the batch exact."""
    from userbehavioranalysis_spark.operators.sketches import (
        hll_exact_uv,
        hll_registers,
        hll_uv_estimate,
    )

    import os as _os

    stream = _replay_events_stream(spark, _os.path.join(sf_dir, "events.parquet"))
    regs = _run_bounded(
        hll_registers(stream), "uba_stream_hll", output_mode="complete"
    )
    ev = _tables(spark, sf_dir)["events"]
    return hll_uv_estimate(regs, hll_exact_uv(ev))
