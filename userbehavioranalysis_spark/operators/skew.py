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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salt: int = 16,
) -> DataFrame:
    """Exact inner equi-join with hot-key fan-out — the join-side
    counterpart of :func:`salted_distinct_count`.

    When the join key is low-cardinality/hot (the classic: enrich an
    event fact by a per-category table too large or too churny to
    broadcast), a plain shuffle join lands each hot key on ONE reducer;
    with 5 keys and 1000 executors, 995 sit idle while 5 drown.  AQE's
    skew-join splitting helps only sort-merge joins it can re-plan;
    explicit salting is the portable fix:

    1. big side: salt = hash(``salt_from``) % n_salt — derived from a
       NON-KEY column (a row id), so one hot key's rows spread across
       ``n_salt`` buckets; deterministic, no rand().
    2. small side: replicated ×``n_salt`` (an explode over the salt
       domain — map-side, tiny × n_salt rows).
    3. join on (key, salt): each hot key now occupies ``n_salt``
       reducers.  The salt columns are dropped, so the RESULT is
       exactly the plain join (verified by the registry oracle).
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return salted_big.join(salted_small, on=[key, "_salt"]).drop("_salt")
