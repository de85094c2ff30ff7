"""Event-log compaction: latest-state extraction from append-only logs.

The recurring shape in both CDC pipelines and training-data refreshes
(recrawled documents, re-scored examples): an append-only log where only
the newest row per key is current.  Reference analogue: the reference's
jobs all fold a keyed stream into "current" keyed state
(`AdStatisticsByGeo.scala:61-75` keeps per-key running state; this is
the batch form of that fold for arbitrary payloads).

The scale-critical choice is ``max_by`` AGGREGATION, not a
``row_number() OVER (PARTITION BY key ORDER BY ts DESC)`` window:

- the window form must shuffle EVERY log row to its key's reducer and
  sort it there — at 100 TB that is a full-log shuffle;
- ``groupBy(key).agg(max_by(payload, version))`` gets map-side partial
  aggregation: each task reduces its rows to one candidate per key
  BEFORE the exchange, so the shuffle carries one row per (task, key).
  (With a struct payload Spark plans this as SortAggregate — local
  sorts by group key on the already-reduced sides — because struct agg
  buffers aren't hash-aggregable; the shuffle-volume reduction, the
  part that matters at scale, is unchanged.)

Determinism: the version is a (ts, tie) struct — struct comparison is
lexicographic, so ties on ts resolve by the tie column identically on
any engine/partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_state(
    log: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    tie_col: str | None = None,
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """One row per key: the payload of the newest log row (by ``ts_col``,
    ties broken by ``tie_col`` descending — pass a unique column for a
    fully deterministic result).
    """
    if payload is None:
        payload = [c for c in log.columns if c not in keys]
    version = (
        F.struct(F.col(ts_col), F.col(tie_col))
        if tie_col is not None
        else F.struct(F.col(ts_col))
    )
    picked = log.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), version).alias("_latest")
    )
    return picked.select(*keys, *[F.col(f"_latest.{c}").alias(c) for c in payload])


def scd2_history(
    log: DataFrame,
    keys: Sequence[str],
    state_col: str,
    ts_col: str = "ts_us",
    tie_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension assembly from an append-only
    change log: one row per (key, state RUN) with its validity interval.

    The other half of the CDC story next to :func:`latest_state` — that
    keeps only the current row; warehouses also need the HISTORY table
    (``valid_from`` / ``valid_to`` / ``is_current``) to join facts
    against the dimension value that was current at fact time.

    Pipeline (classic SCD2, expressed as two window passes that share
    ONE shuffle):

    1. change detection: ``lag(state)`` per key in (ts, tie) order; a
       row opens a new version iff its state differs from the previous
       row's (or it is the key's first row).  Consecutive duplicates —
       the overwhelming majority of a CDC feed re-emitting unchanged
       state — are dropped here, so interval assembly runs on the
       compacted run-starts only.
    2. interval assembly: ``valid_from`` = the run's first ts;
       ``valid_to`` = ``lead(valid_from)`` (NULL = still current);
       ``version`` = ``row_number`` per key.

    Both passes partition by ``keys`` and order by (ts, tie): Catalyst
    plans them over a single Exchange+Sort, so the whole operator is one
    shuffle of the log — the minimum for any per-key ordered pass.  At
    100 TB the win is step 1's cardinality cliff: intervals are built on
    runs (≈ distinct state changes), not raw log rows.

    Determinism: pass a unique ``tie_col`` (e.g. the log sequence id) so
    same-timestamp updates order identically on any engine/partitioning.
    """
    order = [F.col(ts_col).asc()] + ([F.col(tie_col).asc()] if tie_col else [])
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(state_col)).over(w)
    runs = (
        log.withColumn("_prev", prev)
        .where(F.col("_prev").isNull() | (F.col("_prev") != F.col(state_col)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return runs.select(
        *keys,
        F.col(state_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def merge_partial_counts(
    snapshot: DataFrame, delta: DataFrame, keys: Sequence[str], count_col: str
) -> DataFrame:
    """Incremental materialized-view maintenance for additive
    aggregates: fold a delta's partial counts into a persisted snapshot
    WITHOUT recomputing history.

    The 100 TB argument is the whole point: a daily full recompute of
    an hourly rollup re-reads the entire fact history; because counts
    (and sums, and any commutative monoid — the CMS/histogram/HLL-
    register tables in operators/sketches.py included) merge by
    addition, the refresh cost is O(delta + touched groups): union the
    snapshot with the delta's partials and re-aggregate.  Spark plans
    the union-aggregate with map-side partial aggregation, and the
    snapshot side arrives pre-reduced (one row per group), so the
    exchange carries ≈ |touched groups| rows, not |history|.

    Equivalence ``merge(agg(A), agg(B)) = agg(A ∪ B)`` is exact for
    counts — the registry oracle checks the merged result against a
    full recompute.
    """
    return (
        snapshot.select(*keys, count_col)
        .unionAll(delta.select(*keys, count_col))
        .groupBy(*keys)
        .agg(F.sum(count_col).alias(count_col))
    )


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Lakehouse-style MERGE INTO: apply a change batch to a snapshot —
    matched keys take the change row (or drop, when its ``delete_col``
    is true), unmatched snapshot rows carry over, brand-new keys
    insert.  The set-operation form of Delta/Iceberg MERGE, expressed
    with a plain outer join so it runs on any table format.

    Assumes ``changes`` holds ONE row per key (pre-compact a multi-row
    CDC batch with :func:`latest_state` first — that composition is the
    standard CDC-apply pipeline and what the registry query does).

    Scale shape: one key-keyed shuffle of snapshot ∪ changes — the
    minimum for a keyed merge without storage-side support.  The real
    100 TB win layers on top: with BOTH sides bucketed by key on disk
    (plans/bucketing.py posture) the exchange disappears entirely, and
    partition-level change stats let untouched partitions skip the job
    — copy-on-write pruning.  Delete handling inside the same pass
    means no second anti-join over the snapshot.
    """
    payload = [c for c in snapshot.columns if c not in keys]
    ch_payload = [c for c in changes.columns if c not in keys and c != delete_col]
    assert set(payload) == set(ch_payload), (payload, ch_payload)
    s = snapshot.select(
        *keys, F.struct(*payload).alias("_old"), F.lit(True).alias("_in_old")
    )
    mark = (
        F.col(delete_col) if delete_col is not None else F.lit(False)
    )
    c = changes.select(
        *keys,
        F.struct(*ch_payload).alias("_new"),
        mark.alias("_del"),
        F.lit(True).alias("_in_new"),
    )
    merged = s.join(c, on=list(keys), how="full_outer")
    kept = merged.where(~F.coalesce(F.col("_del"), F.lit(False)))
    pick = F.when(F.coalesce("_in_new", F.lit(False)), F.col("_new")).otherwise(
        F.col("_old")
    )
    return kept.select(
        *keys, *[pick.getField(p).alias(p) for p in payload]
    )


def compact_small_files(
    spark,
    src_path: str,
    dest_path: str,
    target_bytes: int = 128 << 20,
) -> DataFrame:
    """Small-file compaction (the lakehouse OPTIMIZE bin-packing step):
    rewrite a parquet directory of many small files into
    ``ceil(total_bytes / target_bytes)`` files near the target size.

    Small-file proliferation is the classic streaming-ingest tax — a
    micro-batch sink writing every trigger leaves thousands of KB-scale
    files whose open/footer costs dominate later scans.  Compaction
    math on FILE SIZES, not row counts: the source listing's byte total
    fixes the output file count, so output size tracks the target
    regardless of row width.

    Scale: the rewrite uses ``coalesce`` (narrow — each output task
    concatenates whole input splits, NO shuffle) whenever the target
    count is below the scan's partition count, falling back to
    ``repartition`` only when files must be SPLIT (fewer inputs than
    outputs — rare for compaction).  Content is untouched — the
    rewritten table value-hashes against the source (registry:
    ``events_compaction_roundtrip``).
    """
    import math
    import os

    total, n_files = 0, 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n_files += 1
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_path)
    writer = df.coalesce(n_out) if n_out <= n_files else df.repartition(n_out)
    writer.write.mode("overwrite").parquet(dest_path)
    return spark.read.parquet(dest_path)
