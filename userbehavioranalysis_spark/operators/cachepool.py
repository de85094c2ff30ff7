"""Scoped cache bookkeeping for operators that cache() intermediates.

The dedup/similarity operators cache corpus-sized subtrees (signatures,
sketches, postings) that feed several plan branches.  On a long-lived
session running many queries back-to-back, those cached blocks would
otherwise accumulate in executor storage memory until eviction pressure
degrades the hot paths the caches exist to speed up.

Pattern: operators register caches with :func:`pooled_cache` and call
:func:`release_pooled` on entry — so at most one operator's caches are
live at a time, and a caller can also release explicitly once it has
consumed a result.  The tradeoff (documented per operator): re-collecting
an OLD result DataFrame after a NEWER operator call recomputes the
released subtree from source instead of reading cache — correct, just
not cached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_POOLS: dict[str, list[DataFrame]] = {}


def pooled_cache(df: DataFrame, pool: str = "default") -> DataFrame:
    """cache() a DataFrame and register it for later pooled release.

    ``pool`` names an independent release scope: the incremental-dedup
    PROBE path uses pool="probe" so that releasing the previous
    micro-batch's batch-signature cache on entry (single-slot — the
    fix for unbounded per-batch cache accumulation in refresh loops)
    never drops a caller-owned corpus index or another operator's
    default-pool caches.
    """
    df = df.cache()
    _POOLS.setdefault(pool, []).append(df)
    return df


def release_pooled(pool: str = "default") -> None:
    """Unpersist every cache in ``pool`` (best-effort, never raises)."""
    entries = _POOLS.get(pool, [])
    while entries:
        try:
            entries.pop().unpersist()
        except Exception:
            pass
