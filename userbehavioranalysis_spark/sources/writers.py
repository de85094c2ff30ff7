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
