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
