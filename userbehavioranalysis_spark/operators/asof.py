"""As-of join — each left row matched to the latest right row at or
before its timestamp, per key.

Spark has no native as-of join (Flink and kdb do; DuckDB grew ``ASOF
JOIN``).  The scalable Spark formulation is the **union trick**: tag
both inputs, union them, and run one ``last(value, ignorenulls=True)``
window per key ordered by (ts, side) — right rows sort before left rows
at equal timestamps, so the fill implements ``left.ts >= right.ts``
semantics exactly.  One shuffle on the key + one sort: the same cost
profile as a sort-merge join, no per-key Python, no state explosion.
This beats the per-key ``applyInPandas`` alternative at scale because
skewed keys spill inside the sort instead of materializing whole groups
in Arrow memory.

Determinism: callers should make the right side unique per (key, ts)
(e.g. pre-aggregate) — otherwise "latest" among equal-ts right rows is
unspecified in any engine's as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with ``right.ts <= left.ts``.

    Every left column is preserved; every right non-key column (the
    right timestamp included) appears with ``suffix``, NULL when no
    right row precedes the left row (left-outer semantics).  ``ts_col``
    may be any orderable type (timestamp, epoch long, ...) present on
    both sides under the same name.
    """
    lvals = [c for c in left.columns if c not in keys and c != ts_col]
    rvals = [c for c in right.columns if c not in keys and c != ts_col]

    l2 = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lvals],
        F.lit(None).cast(right.schema[ts_col].dataType).alias(ts_col + suffix),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c + suffix) for c in rvals],
    )
    r2 = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lvals],
        F.col(ts_col).alias(ts_col + suffix),
        *[F.col(c).alias(c + suffix) for c in rvals],
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = [ts_col + suffix] + [c + suffix for c in rvals]
    filled = u.select(
        *keys,
        F.col(ts_col),
        F.col("__side"),
        *[F.col(c) for c in lvals],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
