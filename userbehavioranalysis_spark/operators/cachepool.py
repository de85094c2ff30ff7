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

_POOL: list[DataFrame] = []


def pooled_cache(df: DataFrame) -> DataFrame:
    """cache() a DataFrame and register it for later pooled release."""
    df = df.cache()
    _POOL.append(df)
    return df


def release_pooled() -> None:
    """Unpersist every pooled cache (best-effort, never raises)."""
    while _POOL:
        try:
            _POOL.pop().unpersist()
        except Exception:
            pass
