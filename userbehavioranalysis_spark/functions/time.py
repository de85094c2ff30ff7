"""Event-time helpers shared by the windowed analytics.

The reference emits ``window.getEnd`` epoch longs with its results
(`HotItems.scala:104-108`, `NetworkFlow.scala:79-83`); we do the same —
every windowed analytic resolves Spark's ``window`` struct to epoch-second
bigints (``window_start`` / ``window_end``).  Bigints rather than
timestamps so results hash identically across engines (the DuckDB oracle
compares values, and tz-naive vs tz-aware timestamp rendering would
otherwise diverge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def window_bounds(df: DataFrame, keep: list[str]) -> DataFrame:
    """Replace the ``window`` struct column with epoch-second bigints."""
    return df.select(
        F.col("window.start").cast("long").alias("window_start"),
        F.col("window.end").cast("long").alias("window_end"),
        *keep,
    )


def sliding_oracle_windows(ts_expr: str, size_s: int, slide_s: int) -> str:
    """DuckDB SQL fragment enumerating the sliding windows an event joins.

    Spark's ``F.window(ts, size, slide)`` assigns an event at time t to
    every window whose start is a multiple of ``slide`` in
    ``(t - size, t]``; with ``size = k * slide`` that is exactly k
    windows.  The oracle reproduces that with a ``generate_series`` cross
    join.  Returns a ``(window_start, window_end)`` pair expression to be
    used with ``CROSS JOIN generate_series(0, k-1) g(i)``.
    """
    assert size_s % slide_s == 0, "oracle assumes size is a multiple of slide"
    ws = f"(CAST(floor(epoch({ts_expr}) / {slide_s}) AS BIGINT) - g.i) * {slide_s}"
    return f"{ws} AS window_start, {ws} + {size_s} AS window_end"


def num_slides(size_s: int, slide_s: int) -> int:
    return size_s // slide_s


def tumbling_start(ts_expr: str, size_s: int) -> str:
    """DuckDB SQL for the tumbling-window start of an event (epoch s)."""
    return f"CAST(floor(epoch({ts_expr}) / {size_s}) AS BIGINT) * {size_s}"


def col_epoch_s(c: str) -> Column:
    return F.col(c).cast("long")


_UNIT_S = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
}


def duration_seconds(spec: str) -> int:
    """Parse a Spark interval string like ``'1 hour'`` / ``'5 seconds'``."""
    n, unit = spec.strip().split()
    return int(n) * _UNIT_S[unit]
