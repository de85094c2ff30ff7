"""Sinks beyond console/memory (SURVEY §2.1 K1/K2 are the reference's
only sinks; a training-data pipeline also needs a durable, prunable
one).

``write_partitioned_corpus`` is the curated-corpus writer: Hive-style
partitioned parquet, the layout every downstream tokenizer/training
reader partition-prunes against.

Scale notes, because naive ``partitionBy`` is a classic 100 TB footgun:

- ``partitionBy`` alone writes one file per (task, partition-value) —
  with 1000 tasks × 50 languages that's 50k small files per job.  The
  ``repartition(partition_cols)`` first routes each partition value to
  one task, collapsing that to one file per value (add a salt column to
  split huge partitions across several files when needed).
- ``sortWithinPartitions`` orders rows inside each file so parquet
  row-group min/max statistics stay tight — range predicates on the
  sort key skip row groups at read time.
- The reader side gets partition pruning for free: a ``lang = 'en'``
  filter never lists, opens, or reads other partitions (asserted in
  tests via the scan's PartitionFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# single schema-bearing file a FULL-lake delete leaves behind so the
# lake stays readable; the writer removes it before appending real
# partition directories (it carries the partition columns as data
# columns — one constant, two call sites, or the removal silently
# stops matching)
_EMPTY_LAKE_PLACEHOLDER = "part-00000-empty.parquet"


def write_partitioned_corpus(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    sort_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Write a Hive-partitioned parquet corpus: one file per partition
    value, rows sorted by ``sort_col`` within each file."""
    (
        df.repartition(*partition_cols)
        .sortWithinPartitions(sort_col)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def zorder_value(a_expr: str, b_expr: str, a_bits: int = 16, b_bits: int = 16) -> str:
    """SQL expression interleaving two non-negative integer expressions
    into a Z-curve value, MOST-significant-bit first per dimension.

    ``a_bits``/``b_bits`` declare each dimension's domain width;
    aligning the interleave at each domain's TOP bit is what keeps the
    curve balanced when widths differ (a naive fixed-width low-bit
    interleave puts a narrow dimension's zeros in the high positions
    and degenerates into a single-column sort on the wide one —
    observed with a 4-bit user id against a 10-bit hour index).
    """
    total = a_bits + b_bits
    p = total
    terms = []
    for i in range(max(a_bits, b_bits)):
        if i < a_bits:
            p -= 1
            terms.append(
                f"shiftleft((shiftright(cast({a_expr} as bigint), {a_bits - 1 - i}) & 1), {p})"
            )
        if i < b_bits:
            p -= 1
            terms.append(
                f"shiftleft((shiftright(cast({b_expr} as bigint), {b_bits - 1 - i}) & 1), {p})"
            )
    return " + ".join(terms)


def write_zordered(
    df,
    path: str,
    a_expr: str,
    b_expr: str,
    n_files: int = 8,
    a_bits: int = 16,
    b_bits: int = 16,
    rowgroup_bytes: int = 1 << 16,
) -> None:
    """Write parquet Z-ORDERED on two dimensions: rows sorted along the
    bit-interleaved (a, b) curve, range-partitioned into ``n_files``.

    Why this layout exists at 100 TB: a single-column sort gives tight
    parquet row-group min/max statistics on THAT column only — a scan
    filtering the other column reads everything.  The Z-curve bounds
    every contiguous run in BOTH dimensions, so row-group stats stay
    selective for filters on either column (or both) and the reader
    skips row groups a single-sort layout must read.  This is the same
    layout Delta's OPTIMIZE ZORDER BY materializes; here it is plain
    ``repartitionByRange + sortWithinPartitions`` over a pure-SQL
    interleave — no engine extension.  Verified in tests by reading
    row-group statistics back via pyarrow: both dimensions' per-group
    ranges shrink vs a single-sort layout.
    """
    from pyspark.sql import functions as F

    z = F.expr(zorder_value(a_expr, b_expr, a_bits, b_bits))
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("parquet.block.size", rowgroup_bytes)
        .parquet(path)
    )


def write_time_partitioned_events(
    events: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write an events table Hive-partitioned by (event_date,
    event_hour) — THE standard 100 TB event-lake layout: every
    time-windowed analytic in this engine filters on event time, and
    with this layout those filters prune whole hour directories before
    a single row is read (vs row-group statistics alone on a flat
    table, which still lists and opens every file).

    Same writer discipline as :func:`write_partitioned_corpus`:
    ``repartition`` on the partition columns first (one file per hour,
    not one per task×hour), rows sorted by the timestamp within each
    file so parquet min/max stay tight for sub-hour predicates.

    Partition values derive via ``to_date``/``hour``, which on
    TimestampType are SESSION-TIMEZONE-dependent — so the writer
    records the session timezone in a ``_lake_manifest.json`` sidecar
    and :func:`read_time_range` REFUSES to prune under a different
    session timezone (the mismatch would silently prune directories
    containing in-range rows).  The engine pins UTC session-wide
    (session.py), so in practice this is a belt-and-braces guard.

    The manifest is authoritative for the WHOLE lake, so a
    non-overwrite write into an existing lake must match it: appending
    under a different session timezone would mix two partition
    derivations in one directory tree while recording only the newer
    tz — read_time_range's guard would then pass and silently prune
    in-range rows of the older batch.  Such an append REFUSES up
    front (mirroring the reader's refusal); the manifest is (re)written
    only when overwriting or creating the lake.
    """
    import json
    import os

    from pyspark.sql import functions as F

    mp = os.path.join(path, "_lake_manifest.json")
    tz = spark_tz(events.sparkSession)
    fresh = mode == "overwrite" or not os.path.exists(mp)
    if not fresh:
        with open(mp) as f:
            written = json.load(f)
        if written.get("session_tz") != tz or written.get("ts_col") != ts_col:
            raise ValueError(
                f"lake at {path!r} was written under session timezone "
                f"{written.get('session_tz')!r} (ts_col "
                f"{written.get('ts_col')!r}) but this append runs under "
                f"{tz!r} (ts_col {ts_col!r}); mixing partition "
                "derivations in one lake makes pruning silently drop "
                "rows — set spark.sql.session.timeZone to match the "
                "lake or overwrite it"
            )
    (
        events.withColumn("event_date", F.to_date(ts_col))
        .withColumn("event_hour", F.hour(ts_col).cast("int"))
        .repartition("event_date", "event_hour")
        .sortWithinPartitions(ts_col)
        .write.mode(mode)
        .partitionBy("event_date", "event_hour")
        .parquet(path)
    )
    # a full-lake delete leaves one empty schema-bearing placeholder
    # file at the root (see delete_rows_partition_scoped); it carries
    # the partition columns as DATA columns, so READS mixing it with
    # real partition directories fail with a duplicate-column conflict.
    # Drop it AFTER the append lands: the write itself never consults
    # it, and removing it first would leave the lake with neither
    # placeholder nor data (unreadable until manually repaired) if the
    # write failed mid-flight.
    placeholder = os.path.join(path, _EMPTY_LAKE_PLACEHOLDER)
    if not fresh and os.path.exists(placeholder):
        os.remove(placeholder)
    if fresh:
        with open(mp, "w") as f:
            json.dump({"session_tz": tz, "ts_col": ts_col}, f)


def spark_tz(spark) -> str:
    return spark.conf.get("spark.sql.session.timeZone")


def read_time_range(
    spark,
    path: str,
    start_ts: str,
    end_ts: str,
    ts_col: str = "ts",
) -> DataFrame:
    """Read a :func:`write_time_partitioned_events` lake restricted to
    ``[start_ts, end_ts)`` — the predicate is expressed on BOTH the
    partition columns (directory pruning: only the covered date/hour
    directories are listed or opened, PartitionFilters in the plan)
    and the row-level timestamp (exact sub-hour bounds within the edge
    partitions).

    Refuses to run under a session timezone different from the one the
    lake was written with (``_lake_manifest.json``): partition values
    are timezone-derived, so a mismatched reader would silently prune
    directories that contain in-range rows.
    """
    import json
    import os

    from pyspark.sql import functions as F

    mp = os.path.join(path, "_lake_manifest.json")
    if os.path.exists(mp):
        with open(mp) as f:
            written_tz = json.load(f)["session_tz"]
        if written_tz != spark_tz(spark):
            raise ValueError(
                f"lake at {path!r} was written under session timezone "
                f"{written_tz!r} but this session uses "
                f"{spark_tz(spark)!r}; partition pruning would silently "
                "drop in-range rows — set spark.sql.session.timeZone to "
                "match the lake"
            )
    lo = F.to_timestamp(F.lit(start_ts))
    hi = F.to_timestamp(F.lit(end_ts))
    df = spark.read.parquet(path)
    part_pred = (
        F.col("event_date").between(F.to_date(lo), F.to_date(hi))
        # hour bound only applies on the edge dates; interior dates
        # keep every hour.  Expressed disjunctively so Catalyst can
        # push each branch into the partition listing.
        & (
            (F.col("event_date") > F.to_date(lo))
            | (F.col("event_hour") >= F.hour(lo))
        )
        & (
            (F.col("event_date") < F.to_date(hi))
            | (F.col("event_hour") <= F.hour(hi))
        )
    )
    return (
        df.where(part_pred)
        .where((F.col(ts_col) >= lo) & (F.col(ts_col) < hi))
        .drop("event_date", "event_hour")
    )


def delete_rows_partition_scoped(spark, path: str, predicate) -> dict:
    """GDPR-style delete (right-to-be-forgotten) on a
    :func:`write_time_partitioned_events` lake: remove every row
    matching ``predicate`` by rewriting ONLY the hour partitions that
    contain matches — the partition-scoped rewrite every table format
    (Delta/Iceberg/Hive ACID) performs under DELETE, done here at the
    layout level so the mechanics are visible and testable.

    1. A directory-pruned scan finds the affected (event_date,
       event_hour) partitions — a collect bounded by the partition
       DOMAIN (≤ days×24), never by row count.
    2. The affected partitions' surviving rows are materialized
       (localCheckpoint — Spark refuses to overwrite a path it is
       still lazily reading from), then written back under DYNAMIC
       partition overwrite, which replaces exactly the partitions
       present in the write.
    3. Affected partitions left with ZERO survivors are removed
       directly (dynamic overwrite cannot replace a partition with
       emptiness).

    Untouched partitions' files are never listed, read, or rewritten —
    asserted byte-level in tests via inode+mtime.  Atomicity across
    steps is the table format's job in production (this is the I/O
    plan a format executes transactionally); stats are returned for
    audit: {"affected": n, "rewritten": n, "emptied": n}.
    """
    import os
    import shutil

    from pyspark.sql import functions as F

    lake = spark.read.parquet(path)
    affected = [
        (r["event_date"], r["event_hour"])
        for r in lake.where(predicate)
        .select("event_date", "event_hour")
        .distinct()
        .collect()
    ]
    if not affected:
        return {"affected": 0, "rewritten": 0, "emptied": 0}
    part_pred = F.lit(False)
    for d, h in sorted(affected):
        part_pred = part_pred | (
            (F.col("event_date") == F.lit(d)) & (F.col("event_hour") == h)
        )
    # ~coalesce(p, false), NOT ~p: under SQL three-valued logic a row
    # where the predicate evaluates to NULL (e.g. a NULL user_id on a
    # user_id = X delete) fails BOTH p and ~p — plain ~p would silently
    # drop such rows from the rewrite even though they never matched
    # the delete.  NULL-predicate rows must be KEPT.
    keep = (
        lake.where(part_pred)
        .where(~F.coalesce(predicate, F.lit(False)))
        .localCheckpoint()
    )
    survivors = {
        (r["event_date"], r["event_hour"])
        for r in keep.select("event_date", "event_hour").distinct().collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            keep.repartition("event_date", "event_hour")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .partitionBy("event_date", "event_hour")
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    emptied = 0
    for d, h in affected:
        if (d, h) not in survivors:
            shutil.rmtree(
                os.path.join(path, f"event_date={d}", f"event_hour={h}"),
                ignore_errors=True,
            )
            emptied += 1
            # prune the parent date dir too once its last hour is gone
            # (a leftover empty event_date= dir still breaks schema
            # inference on an otherwise-empty lake)
            ddir = os.path.join(path, f"event_date={d}")
            if os.path.isdir(ddir) and not os.listdir(ddir):
                os.rmdir(ddir)
    if not survivors and not _lake_has_partitions(path):
        # A delete that emptied the WHOLE lake would leave only
        # _SUCCESS + the manifest; parquet reads of such a directory
        # fail with a schema-inference error instead of returning an
        # empty lake.  Retain one empty schema-bearing file (written
        # via pyarrow — Spark itself writes no part files for an empty
        # frame, SPARK-23271) so readers see a valid, empty table with
        # the partition columns as ordinary (empty) columns.
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        sch = to_arrow_schema(keep.schema)
        pq.write_table(
            pa.table({f.name: pa.array([], type=f.type) for f in sch}, schema=sch),
            os.path.join(path, _EMPTY_LAKE_PLACEHOLDER),
        )
    return {
        "affected": len(affected),
        "rewritten": len(affected) - emptied,
        "emptied": emptied,
    }


def _lake_has_partitions(path: str) -> bool:
    """True if any parquet data file remains under a Hive partition
    directory of ``path`` (empty leftover directories don't count —
    they can't carry schema)."""
    import os

    for root, _dirs, files in os.walk(path):
        if "event_date=" in root and any(f.endswith(".parquet") for f in files):
            return True
    return False
