"""Skew mitigation patterns (build brief: "skewed keys → salting or
AQE").

What the session already covers: AQE skew-join splitting is on
(session.py) and handles skewed *join* partitions at runtime; plain
counts/sums survive key skew because partial aggregation reduces
map-side before the exchange.

What still needs salting: **distinct aggregation under key skew**.
``countDistinct(col)`` per key plans a two-phase distinct whose first
exchange partitions by (key, col); a hot key still concentrates its
state in few tasks at the final step.  ``salted_distinct_count`` makes
the fan-out explicit and exact:

1. salt = hash(col) % n_salt — *derived from the counted column*, so
   every occurrence of one value lands in exactly one salt bucket and
   per-bucket distinct counts are disjoint;
2. stage 1: countDistinct per (keys, salt) — a hot key's state spreads
   over n_salt tasks;
3. stage 2: sum the disjoint partials per key — exact, not approximate.

The same derived-salt trick generalizes to any per-key set-like state
(collect_set sizes, HLL merge trees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    col: str,
    n_salt: int = 16,
    alias: str = "distinct_count",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT col) with hot-key state fan-out."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(col)), F.lit(n_salt)))
    partial = salted.groupBy(*keys, "_salt").agg(
        F.countDistinct(F.col(col)).alias("_part")
    )
    return partial.groupBy(*keys).agg(F.sum("_part").alias(alias))
