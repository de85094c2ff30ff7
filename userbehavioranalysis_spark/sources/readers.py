"""Sources (SURVEY §2.1).

The reference reads header-less CSVs line-by-line and hand-splits them
(`HotItems.scala:45-48` and identically in 10 jobs, S2/P1) plus one
space-delimited apache log (`NetworkFlow.scala:33-39`, P2).  Here the
same inputs are declarative scans — schema'd ``spark.read.csv`` /
``spark.read.text`` + column expressions — so Catalyst can prune columns
and push filters into the scan instead of materializing Scala objects
row-at-a-time.

``load_testdata`` is the entry used by every batch analytic: it loads
the driver's parquet tables (TESTDATA.md) as DataFrames.  Parquet scans
get predicate pushdown + column pruning for free; at cluster scale the
same call pointed at a partitioned table keeps partition pruning too.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from userbehavioranalysis_spark import schemas

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# ``events.ts`` is INT64 on disk, but the epoch UNIT has varied across
# driver testdata generations (nanoseconds in one build, microseconds in
# the next).  Rather than pin a unit and break when the data is
# regenerated, normalize by magnitude, per-row, entirely JVM-side:
# epoch-second values for years 2001-2286 lie in [1e9, 1e10), and each
# finer unit is a clean 1e3 beyond that, so thresholds at the geometric
# gaps (1e11 / 1e14 / 1e17) classify s/ms/us/ns unambiguously for any
# plausible timestamp.  Integer arithmetic throughout — float division
# of nano-epochs loses the last microsecond.
_EPOCH_ANY_CASE = (
    "timestamp_micros(CASE"
    " WHEN abs({c}) >= 100000000000000000 THEN {c} div 1000"
    " WHEN abs({c}) >= 100000000000000 THEN {c}"
    " WHEN abs({c}) >= 100000000000 THEN {c} * 1000"
    " ELSE {c} * 1000000 END)"
)


def epoch_any_to_ts(col: str = "ts", check_range: bool = True) -> F.Column:
    """Microsecond TimestampType from an epoch long of any unit (s/ms/us/ns).

    Magnitude classification is unambiguous only inside its design
    window (ms epochs before ~1973-03 or s epochs after 2286 would
    mis-decode), so by default the decode carries a loud guard: any
    non-null value landing outside [1980, 2200) raises with the raw
    value in the message — a future unit shift in regenerated testdata
    fails at the first scan rather than silently skewing event time.
    One timestamp comparison per row, JVM-side; ``check_range=False``
    opts out for data legitimately outside the window.
    """
    decoded = F.expr(_EPOCH_ANY_CASE.format(c=col))
    if not check_range:
        return decoded
    lo = F.lit("1980-01-01 00:00:00").cast("timestamp")
    hi = F.lit("2200-01-01 00:00:00").cast("timestamp")
    return (
        F.when(F.col(col).isNull(), F.lit(None).cast("timestamp"))
        .when((decoded >= lo) & (decoded < hi), decoded)
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"epoch decode of {col!r} outside plausible range "
                        "[1980, 2200): raw value "
                    ),
                    F.col(col).cast("string"),
                )
            )
        )
    )


def load_testdata(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> dict[str, DataFrame]:
    """Load every driver testdata table as a DataFrame keyed by name.

    ``events.ts`` is read with an explicit schema that types it LongType,
    which makes the scan session-independent regardless of the parquet
    logical annotation: TIMESTAMP(NANOS) files (which a vanilla session
    rejects outright with PARQUET_TYPE_ILLEGAL, no
    ``spark.sql.legacy.parquet.nanosAsLong`` conf needed here) and
    TIMESTAMP(MICROS) files alike surface their physical INT64 values,
    and :func:`epoch_any_to_ts` normalizes whatever unit arrived to
    microsecond TimestampType (UTC session) so every analytic sees the
    same typed event-time column.
    """
    out = {}
    for name in schemas.TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if name == "events":
            df = spark.read.schema(schemas.EVENTS_RAW).parquet(path)
            df = df.withColumn("ts", epoch_any_to_ts("ts"))
        else:
            df = spark.read.parquet(path)
        out[name] = df
    return out


def events_with_item(df: DataFrame) -> DataFrame:
    """Normalize the testdata ``events`` stream for the behavior analytics.

    Adds ``item_id`` (the ``k`` key of the JSON ``props`` column — the
    item/ad/page identifier the top-N and blacklist analytics key on) as
    a real column.  ``get_json_object`` runs JVM-side; no Python UDF.
    """
    return df.withColumn(
        "item_id", F.get_json_object(F.col("props"), "$.k").cast("bigint")
    )


def _event_ts(ts_col: str, ts_unit: str):
    """TimestampType event time from a raw epoch column (s or ms)."""
    if ts_unit == "s":
        return F.col(ts_col).cast("timestamp")
    if ts_unit == "ms":
        return (F.col(ts_col) / F.lit(1000.0)).cast("timestamp")
    raise ValueError(f"unknown ts_unit {ts_unit!r}")


def read_csv_events(
    spark: SparkSession, path: str, schema, ts_col: str = "ts", ts_unit: str = "s"
) -> DataFrame:
    """Read a reference-style header-less CSV (S2/P1).

    Replaces the reference's `split(",") + trim + toLong` per-row parse
    (`HotItems.scala:45-48`) with a schema'd CSV scan.  Adds ``event_ts``
    (TimestampType) derived from the raw epoch column: the CSVs carry
    epoch *seconds* (multiplied by 1000 at watermark assignment in the
    reference, `HotItems.scala:49`); marketing/apache carry *ms*.
    """
    df = spark.read.csv(path, schema=schema, sep=",", ignoreLeadingWhiteSpace=True,
                        ignoreTrailingWhiteSpace=True)
    return df.withColumn("event_ts", _event_ts(ts_col, ts_unit))


def parse_csv_values(
    df: DataFrame, schema, ts_col: str = "ts", ts_unit: str = "s"
) -> DataFrame:
    """Parse a Kafka-style ``value: string`` column into typed columns.

    The streaming twin of :func:`read_csv_events` — the reference maps
    each consumed Kafka line through ``split(",") + trim + cast``
    (`HotItems.scala:45-48`); here that parse is column expressions over
    the value column, shared by the real ``kafka_events`` stream and the
    file-backed topic fake, so the parse logic S1 depends on is
    exercised even without a broker.  Works on batch and streaming
    DataFrames alike.
    """
    parts = F.split(F.col("value"), ",")
    cols = [
        F.trim(parts.getItem(i)).cast(f.dataType).alias(f.name)
        for i, f in enumerate(schema.fields)
    ]
    return df.select(*cols).withColumn("event_ts", _event_ts(ts_col, ts_unit))


def read_apache_log(spark: SparkSession, path: str) -> DataFrame:
    """Parse the apache access log (P2, `NetworkFlow.scala:33-39`).

    Line format: ``ip - userId dd/MM/yyyy:HH:mm:ss +0000 METHOD url``;
    the reference space-splits and keeps fields 0,1,3,5,6 then parses the
    timestamp with ``SimpleDateFormat("dd/MM/yyyy:HH:mm:ss")``.  Same
    extraction, but as vectorized column expressions over a text scan.
    """
    parts = F.split(F.col("value"), " ")
    ts = F.to_timestamp(parts.getItem(3), "dd/MM/yyyy:HH:mm:ss")
    return (
        spark.read.text(path)
        .select(
            parts.getItem(0).alias("ip"),
            parts.getItem(1).alias("user_id"),
            (F.unix_timestamp(ts) * 1000).alias("event_time_ms"),
            parts.getItem(5).alias("method"),
            parts.getItem(6).alias("url"),
            ts.alias("event_ts"),
        )
    )
