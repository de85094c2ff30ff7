"""Sketch-based aggregation (build-brief extension: 'a novel sketch').

``uv_approx`` already covers the engine-native sketch (HyperLogLog++,
necessarily rows-only in the oracle harness).  This module adds a
Count-Min sketch whose hash functions are PORTABLE (md5-derived), so —
unusually for a sketch — the whole pipeline is value-hash-checkable
against a DuckDB oracle that builds the identical sketch.

The sketch is materialized as a TABLE ((row, bucket) → count) rather
than an opaque binary: at 100 TB that is exactly the mergeable form —
depth·width rows per partition combine by addition (map-side partial
aggregate), the final sketch is depth·width rows TOTAL regardless of
corpus size, and point queries are a broadcast join against it.  The
CMS guarantee holds by construction: estimates only ever OVERcount
(collisions add), never undercount — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from userbehavioranalysis_spark.functions import text as T
from userbehavioranalysis_spark.functions.arrays import exploded


def token_cms_estimates(
    documents: DataFrame, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Count-Min estimates for every distinct token, next to its exact
    count — (token, est_count, exact_count, overcount).

    Build: token occurrences fan out ×``depth`` (one row per hash
    row), bucket ``h_d(token) = md5(d:token) mod width``, and the
    sketch is the (d, bucket) count table.  Estimate: for each
    DISTINCT token, the MIN over its ``depth`` buckets.  The exact
    side (a second pass over the corpus) exists purely as the
    validation harness — a production pipeline keeps only the sketch
    build and probes it; ``overcount = est − exact`` is the collision
    error, ≥ 0 by the CMS guarantee.

    Scale: the occurrence fan-out is map-side (×depth, a small
    constant); both aggregates combine partially before their
    exchange; the sketch is ≤ depth·width rows, broadcast-sized
    forever.  The DISTINCT-token probe is vocabulary-sized, not
    corpus-sized.
    """
    sketch = cms_sketch(documents, width=width, depth=depth)
    return cms_probe(sketch, documents, width=width, depth=depth)


def _occurrences(documents: DataFrame) -> DataFrame:
    toks = documents.select(F.expr(T.TOKENS_SPARK).alias("tokens"))
    return exploded(toks, "tokens", "t").select("t")


def cms_sketch(documents: DataFrame, width: int = 1024, depth: int = 4) -> DataFrame:
    """The (d, bucket) → count sketch table.  Works unchanged on a
    STREAMING documents frame: the group-by keys live in a fixed
    depth·width domain, so complete-mode state is bounded at
    depth·width rows no matter how long the stream runs — the sketch
    IS the bounded-state form of 'count every token ever seen'."""
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    h = T.h64_spark("concat(cast(d as string), ':', t)")
    occ_d = _occurrences(documents).select("t", d).withColumn(
        "bucket", F.expr(f"{h} % {width}")
    )
    return occ_d.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_probe(
    sketch: DataFrame, documents: DataFrame, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Probe a built sketch for every distinct token of ``documents``
    and attach the exact counts (validation harness)."""
    h = T.h64_spark("concat(cast(d as string), ':', t)")
    occ = _occurrences(documents)
    exact = occ.groupBy("t").agg(F.count(F.lit(1)).alias("exact_count"))
    probes = exact.select("t").withColumn("d", F.explode(
        F.sequence(F.lit(0), F.lit(depth - 1))
    )).withColumn("bucket", F.expr(f"{h} % {width}"))
    est = (
        probes.join(F.broadcast(sketch), on=["d", "bucket"])
        .groupBy("t")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.join(exact, on="t")
        .select(
            F.col("t").alias("token"),
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count")).alias("overcount"),
        )
    )


def cms_oracle_sql(width: int = 1024, depth: int = 4) -> str:
    """DuckDB oracle: the identical sketch, built with the same
    md5-derived hashes."""
    h = T.h64_duck("d::VARCHAR || ':' || t")
    return f"""
    WITH occ AS (
        SELECT unnest({T.TOKENS_DUCK}) AS t FROM documents
    ),
    occ_d AS (
        SELECT t, d.d, {h} % {width} AS bucket
        FROM occ CROSS JOIN (SELECT unnest(generate_series(0, {depth - 1})) AS d) d
    ),
    sketch AS (
        SELECT d, bucket, CAST(count(*) AS BIGINT) AS c
        FROM occ_d GROUP BY 1, 2
    ),
    exact AS (
        SELECT t, CAST(count(*) AS BIGINT) AS exact_count FROM occ GROUP BY 1
    ),
    probes AS (
        SELECT e.t, d.d, {h} % {width} AS bucket
        FROM (SELECT t FROM exact) e
        CROSS JOIN (SELECT unnest(generate_series(0, {depth - 1})) AS d) d
    ),
    est AS (
        SELECT p.t, min(s.c) AS est_count
        FROM probes p JOIN sketch s ON s.d = p.d AND s.bucket = p.bucket
        GROUP BY 1
    )
    SELECT est.t AS token, est_count, exact_count,
           est_count - exact_count AS overcount
    FROM est JOIN exact ON est.t = exact.t
    """


def histogram_bins(
    documents: DataFrame, value_col: str = "n_chars", bin_width: int = 32
) -> DataFrame:
    """Fixed-width histogram over an integer column: (bin, n_docs).

    The deterministic cousin of a quantile sketch: because the bin
    edges are FIXED (not data-dependent like t-digest/KLL centroids),
    the histogram is (a) exactly mergeable — partial histograms from
    any partitioning combine by addition, which is precisely Spark's
    map-side partial aggregation of the groupBy — and (b) exactly
    cross-engine checkable, where real quantile sketches are only
    rows-only testable.  State is bounded by the bin-domain size no
    matter the corpus size.
    """
    return (
        documents.groupBy(
            F.floor(F.col(value_col) / F.lit(bin_width)).cast("long").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def histogram_quantiles(
    documents: DataFrame,
    value_col: str = "n_chars",
    bin_width: int = 32,
    qs_permille: tuple[int, ...] = (250, 500, 900, 990),
) -> DataFrame:
    """Quantile estimates read off the fixed-bin histogram:
    (q_permille, bin, est_hi) — ``est_hi`` is the upper edge of the
    first bin whose cumulative count reaches the quantile.

    Resolution is ± ``bin_width`` — the bounded-state trade the
    exact-percentile path (`text_analysis.length_quantiles`) cannot
    make.  100 TB shape: the corpus-sized pass is the histogram
    groupBy (partial-agg combined); everything after — cumulative sum,
    quantile probe — runs on the bin-domain-sized aggregate, so the
    window sort is over ≲10³ rows regardless of corpus size.

    All integer arithmetic (``1000·cum ≥ q·total``), so every engine
    picks the same bin — no float cumulative-share boundary wobble.
    """
    from pyspark.sql import Window

    hist = histogram_bins(documents, value_col, bin_width)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bin",
        F.sum("n_docs").over(w).alias("cum"),
        F.sum("n_docs").over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    qlit = F.explode(F.array(*[F.lit(q) for q in qs_permille])).alias("q_permille")
    probe = cum.select("bin", "cum", "total", qlit)
    return (
        probe.where(F.lit(1000) * F.col("cum") >= F.col("q_permille") * F.col("total"))
        .groupBy("q_permille")
        .agg(F.min("bin").alias("bin"))
        .select(
            "q_permille",
            "bin",
            ((F.col("bin") + 1) * F.lit(bin_width)).alias("est_hi"),
        )
    )


def histogram_quantiles_oracle_sql(
    bin_width: int = 32, qs_permille: tuple[int, ...] = (250, 500, 900, 990)
) -> str:
    """DuckDB oracle: identical fixed-bin histogram + integer probe."""
    qs = ", ".join(str(q) for q in qs_permille)
    return f"""
    WITH hist AS (
        SELECT CAST(floor(n_chars / {bin_width}) AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    ),
    cum AS (
        SELECT bin,
               sum(n_docs) OVER (ORDER BY bin) AS cum,
               sum(n_docs) OVER () AS total
        FROM hist
    ),
    probe AS (
        SELECT bin, cum, total, q.q_permille
        FROM cum CROSS JOIN (SELECT unnest([{qs}]) AS q_permille) q
        WHERE 1000 * cum >= q_permille * total
    )
    SELECT CAST(q_permille AS INTEGER) AS q_permille,
           min(bin) AS bin,
           (min(bin) + 1) * {bin_width} AS est_hi
    FROM probe GROUP BY q_permille
    """
