"""Windowed Top-N ranking (SURVEY §2.5 A7/A8, Win1/Win2).

Rebuilds the reference's two-stage "hot" rankings:

- ``hot_items`` — HotItems.scala:29-155: top-3 most-viewed items per
  sliding 1 h window, every 5 min.
- ``hot_pages`` — NetworkFlow.scala:26-117: top-5 hottest keys per
  sliding window (the reference ranks URLs from the apache log; on the
  testdata the ranked key is the same item axis with a shorter window).

The reference implements this as two keyed shuffles plus imperative
state: window-aggregate per item (`CountAgg`/`WindowResult`,
HotItems.scala:66-108), re-key by windowEnd, buffer every ItemViewCount
in ``ListState``, sort on an event-time timer and take N
(`TopNHotItems`, HotItems.scala:111-155).  Declaratively that whole
second operator is a rank over a window-end partition:

    row_number() OVER (PARTITION BY window ORDER BY cnt DESC, item ASC) <= N

Catalyst plans the same two exchanges (hash by (window,item) for the
count — with map-side partial aggregation — then hash by window for the
rank) but the sort/take runs as a spillable WindowExec, not a
single-threaded buffered timer callback.  Ties break on the item key so
results are deterministic under any parallelism — the reference instead
forces parallelism 1 (HotItems.scala:34) to stabilize its output.

Scale note: at 100 TB the (window × item) count is the heavy stage; AQE
handles skewed windows, and the rank stage only sees one row per
(window, item) — already reduced by orders of magnitude.  ``row_number``
over a partition never materializes more than a partition per task, and
with N ≪ partition size a ``rank <= N`` filter drops everything else
before any further stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from userbehavioranalysis_spark.functions.time import window_bounds
from userbehavioranalysis_spark.operators.windowed_counts import sliding_counts


def windowed_topn(
    events: DataFrame,
    key_col: str,
    n: int,
    window: str,
    slide: str | None = None,
    ts_col: str = "ts",
    count_alias: str = "cnt",
) -> DataFrame:
    """Generic sliding/tumbling-window top-N by count.

    The count stage routes through ``sliding_counts`` (pane-optimized
    for high window/slide ratios — see windowed_counts.py); the rank
    stage partitions on the resulting window_start.  Returns
    (window_start, window_end, <key>, <count_alias>, rank) with rank
    1..n, ordered deterministically (count DESC, key ASC).
    """
    if slide:
        counts = sliding_counts(
            events, [key_col], window, slide, ts_col, count_alias
        )
    else:
        counts = window_bounds(
            events.groupBy(F.window(ts_col, window).alias("window"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias(count_alias)),
            [key_col, count_alias],
        )
    rank_w = Window.partitionBy("window_start").orderBy(
        F.desc(count_alias), F.asc(key_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= n)
        .select("window_start", "window_end", key_col, count_alias, "rank")
    )


def hot_items(
    events: DataFrame,
    n: int = 3,
    window: str = "1 hour",
    slide: str = "5 minutes",
    view_type: str = "view",
) -> DataFrame:
    """Top-N most-viewed items per sliding window (HotItems.scala:29-155)."""
    return windowed_topn(
        events.filter(F.col("event_type") == view_type),
        key_col="item_id",
        n=n,
        window=window,
        slide=slide,
        count_alias="view_count",
    )


def hot_pages(
    events: DataFrame,
    n: int = 5,
    window: str = "10 minutes",
    slide: str = "5 minutes",
) -> DataFrame:
    """Top-N hottest keys per sliding window (NetworkFlow.scala:26-117).

    All event types count (the reference counts every request hitting a
    URL).  The reference's late-data path (1 s out-of-orderness + 60 s
    allowedLateness with a MapState upsert, NetworkFlow.scala:40-47,87)
    is a streaming concern; the batch rank over the complete input is
    its converged result — see streaming/ for the incremental form.
    """
    return windowed_topn(
        events,
        key_col="item_id",
        n=n,
        window=window,
        slide=slide,
        count_alias="view_count",
    )
