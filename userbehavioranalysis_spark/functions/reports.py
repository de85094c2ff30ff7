"""Formatted Top-N report strings (presentation layer).

The reference's Top-N operators don't emit rows — they emit a
human-readable ranked REPORT per window from the timer callback
(`HotItems.scala:139-152`, `NetworkFlow.scala:104-114`):

    时间:2017-11-26 09:05:00.0
    No1: 商品ID=2338453 浏览量=27
    No2: 商品ID=812879 浏览量=18
    ================================

Structured rows are the right engineering output (joinable, testable,
schema'd), so the engine keeps them; this module is the thin render
step that reproduces the reference's printed format exactly — entirely
with Catalyst string expressions (collect_list → sort_array →
transform → array_join), no Python in the row path, one row out per
window.  The per-window ``collect_list`` is bounded by N (input is the
already-ranked top-N), so the aggregation state is tiny regardless of
corpus size.

Timestamp fidelity: the reference prints ``new Timestamp(timerTs - 1)``
where the timer fires at ``windowEnd_ms + 1`` (`HotItems.scala:123`),
i.e. the rendered instant IS the window end; ``java.sql.Timestamp
.toString`` renders whole seconds with a single trailing ``.0``, which
the format string reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topn_report(
    ranked: DataFrame,
    *,
    key_col: str,
    count_col: str,
    key_label: str,
    count_label: str,
    time_label: str = "时间:",
    rank_label: str = "No",
    bar_len: int = 32,
    window_end: str = "window_end",
    rank_col: str = "rank",
) -> DataFrame:
    """Render ranked rows into one reference-format report per window.

    ``ranked``: output of a windowed top-N (columns ``window_end``
    [epoch-seconds], ``rank``, key, count).  Returns
    ``(window_end, report)`` with ``report`` byte-identical to the
    reference's StringBuilder output for the same ranking.
    """
    # TZ-free render (the driver's harness runs a VANILLA session whose
    # spark.sql.session.timeZone is whatever the host has, so
    # date_format over TimestampType would shift): date_from_unix_date
    # is pure day arithmetic and casting DateType to string is
    # locale/TZ-independent; time-of-day comes from integer modulus.
    c = F.col(window_end)
    two = lambda x: F.lpad(x.cast("int").cast("string"), 2, "0")  # noqa: E731
    ts_str = F.concat(
        F.date_from_unix_date((c / 86400).cast("int")).cast("string"),
        F.lit(" "),
        two(F.pmod(c, 86400) / 3600),
        F.lit(":"),
        two(F.pmod(c, 3600) / 60),
        F.lit(":"),
        two(F.pmod(c, 60)),
        F.lit(".0"),
    )
    line = lambda x: F.concat(  # noqa: E731 — inline render of one rank line
        F.lit(rank_label),
        x[rank_col].cast("string"),
        F.lit(f": {key_label}="),
        x["key"].cast("string"),
        F.lit(f" {count_label}="),
        x["cnt"].cast("string"),
        F.lit("\n"),
    )
    return (
        ranked.groupBy(window_end)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(rank_col),
                                F.col(key_col).alias("key"),
                                F.col(count_col).alias("cnt"),
                            )
                        )
                    ),
                    line,
                ),
                "",
            ).alias("lines"),
        )
        .select(
            F.col(window_end),
            F.concat(
                F.lit(time_label), ts_str, F.lit("\n"), F.col("lines"),
                F.lit("=" * bar_len),
            ).alias("report"),
        )
    )


def hot_items_report(ranked: DataFrame) -> DataFrame:
    """HotItems.scala:139-152 format: ``No{i}: 商品ID={id} 浏览量={n}``."""
    return topn_report(
        ranked,
        key_col="item_id",
        count_col="view_count",
        key_label="商品ID",
        count_label="浏览量",
        time_label="时间:",
        rank_label="No",
        bar_len=32,
    )


def network_flow_report(ranked: DataFrame) -> DataFrame:
    """NetworkFlow.scala:104-114 format: ``NO{i}: URL={url} 访问量={n}``
    (full-width colon after 时间, 29-char bar)."""
    return topn_report(
        ranked,
        key_col="url",
        count_col="url_count",
        key_label="URL",
        count_label="访问量",
        time_label="时间：",
        rank_label="NO",
        bar_len=29,
    )
