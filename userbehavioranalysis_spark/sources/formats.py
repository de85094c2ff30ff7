"""Interchange-format round-trips: JSONL and ORC next to the primary
parquet path (SURVEY §2.1 gives the reference CSV/Kafka only; a
large-pipeline engine also ingests line-delimited JSON dumps and ORC
lakehouse tables).

Both readers are SCHEMA-EXPLICIT: at 100 TB, schema inference is a full
extra pass over the data (and JSON inference can widen types
differently per run), so the contract here is "caller supplies the
schema, the scan starts immediately".  JSONL is line-splittable — a
single 1 TB .jsonl file still parallelizes by byte ranges; ORC keeps
columnar pruning/predicate pushdown like parquet.

Timestamp fidelity is the round-trip's sharp edge: Spark's JSON writer
emits ISO-8601 with microseconds and the reader parses it back exactly
(UTC session pinned in session.py), so ``ts`` survives both hops —
asserted by the registry queries' value-hash oracles, which compare the
round-tripped rows against DuckDB reading the ORIGINAL parquet.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from userbehavioranalysis_spark.sources.readers import load_testdata

# staged round-trip dirs, keyed by (sf_dir, fmt): written once per
# process, reused across driver/bench reruns — no tempdir accumulation
_STAGE_CACHE: dict[tuple[str, str], str] = {}


def write_jsonl(df: DataFrame, path: str) -> None:
    """Line-delimited JSON with explicit microsecond timestamps."""
    df.write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """Schema-explicit JSONL scan (no inference pass)."""
    return (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .option("mode", "FAILFAST")  # silent nulls would fake a clean round-trip
        .json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).orc(path)


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """events → ``fmt`` on disk → read back (staged once per process)."""
    events = load_testdata(spark, sf_dir)["events"]
    stage = _STAGE_CACHE.get((sf_dir, fmt))
    if stage is None or not os.path.isdir(os.path.join(stage, "events")):
        stage = tempfile.mkdtemp(prefix=f"uba_fmt_{fmt}_")
        out = os.path.join(stage, "events")
        shutil.rmtree(out, ignore_errors=True)
        if fmt == "jsonl":
            write_jsonl(events, out)
        elif fmt == "orc":
            write_orc(events, out)
        else:
            raise ValueError(fmt)
        _STAGE_CACHE[(sf_dir, fmt)] = stage
    path = os.path.join(stage, "events")
    schema = events.schema
    back = (
        read_jsonl(spark, path, schema)
        if fmt == "jsonl"
        else read_orc(spark, path, schema)
    )
    return back


def events_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Round-tripped events, normalized for the value-hash oracle:
    (event_id, ts_us, user_id, event_type, value_r2, props)."""
    back = _roundtrip(spark, sf_dir, fmt)
    return back.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 2).alias("value_r2"),
        "props",
    )


def events_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution ingest: two parquet batches with DIFFERENT
    schemas (an early narrow export, then a widened one) read as one
    table via ``mergeSchema`` — old rows surface NULL in the added
    columns.

    The 100 TB relevance: long-lived corpora accrete columns; the
    reader must union schemas WITHOUT a rewrite of history.
    ``mergeSchema`` pays a footer read per file at planning (why it is
    off by default) — production pins the merged schema in a metastore
    and reads with an explicit schema instead; this exercises the
    discovery path.  The split is deterministic (event_id parity), so
    the merged table value-hashes against an oracle on the original.
    """
    events = load_testdata(spark, sf_dir)["events"]
    stage = _STAGE_CACHE.get((sf_dir, "evolve"))
    if stage is None or not os.path.isdir(os.path.join(stage, "t")):
        stage = tempfile.mkdtemp(prefix="uba_fmt_evolve_")
        base = events.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            F.round("value", 2).alias("value_r2"),
        )
        narrow = base.where(F.pmod("event_id", F.lit(2)) == 0).select(
            "event_id", "ts_us", "user_id"
        )
        wide = base.where(F.pmod("event_id", F.lit(2)) == 1)
        narrow.write.parquet(os.path.join(stage, "t", "batch=0"))
        wide.write.parquet(os.path.join(stage, "t", "batch=1"))
        _STAGE_CACHE[(sf_dir, "evolve")] = stage
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(os.path.join(stage, "t"))
    )
    return merged.select("event_id", "ts_us", "user_id", "event_type", "value_r2")
