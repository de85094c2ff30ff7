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


# -- Portable HyperLogLog -----------------------------------------------------
#
# ``uv_approx`` uses Spark's native HLL++ (rows-only checkable: its
# sketch internals are engine-private).  This is the cross-engine-
# checkable counterpart, same design move as the CMS above: md5-derived
# register hashing, harmonic sum in EXACT integer arithmetic (common
# denominator 2⁵³ — the hash word after peeling 8 register bits off the
# 60-bit h64 has exactly 52 random bits, so the frame is 52-bit and
# rho ∈ [1, 53]), and the small-range linear-counting correction via a
# ppm-quantized ln lookup TABLE (ln is not correctly-rounded libm, so a
# live ln() could differ across engines at a floor boundary; a finite
# 256-entry integer table cannot).  Every arithmetic step is integer ⇒
# the ESTIMATE ITSELF value-hashes against a DuckDB replay.
#
# Reference analogue: UvWithBloom.scala:62-103 bounds UV memory with a
# Redis Bloom bitmap; registers here are the same bounded-memory idea,
# mergeable (groupBy max — map-side combined) and 256 rows per window
# forever.

import math as _math

HLL_M = 256  # registers (p=8): ~6.5% rse — sketch is 256 rows/window
_HLL_ALPHA_PPM = round(1e6 * 0.7213 / (1 + 1.079 / HLL_M))
_HLL_LN_PPM = [0] + [round(_math.log(HLL_M / v) * 1e6) for v in range(1, HLL_M + 1)]
_POW53 = 1 << 53


def hll_registers(events: DataFrame, view_type: str = "view") -> DataFrame:
    """(window_start, reg, rho) register table — the mergeable sketch.

    h = portable 60-bit md5 hash of the user id; reg = h mod m; the
    remaining word w = h div m has exactly 52 random bits, so
    rho = 53 − bit_length(w) (leading-zero count within the 52-bit
    frame + 1; w=0 → 53), with ``bin()``-string length standing in for
    bit_length in BOTH engines (integer-exact, no log2 floats).  A
    55-bit frame here (the pre-round-4 bug) shifts every present
    register's weight 4× low and inflates estimates 2–4× outside the
    linear-counting regime.
    Works unchanged on a streaming frame: keys live in the fixed
    windows × m domain, so complete-mode state is bounded.
    """
    h = T.h64_spark("cast(user_id as string)")
    return (
        events.where(F.col("event_type") == view_type)
        .select(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long")
            .alias("window_start"),
            F.expr(f"cast({h} % {HLL_M} as int)").alias("reg"),
            F.expr(
                f"cast(if({h} div {HLL_M} = 0, 53,"
                f" 53 - length(bin({h} div {HLL_M}))) as int)"
            ).alias("rho_raw"),
        )
        .groupBy("window_start", "reg")
        .agg(F.max("rho_raw").alias("rho"))
    )


def hll_uv_estimate(registers: DataFrame, exact: DataFrame) -> DataFrame:
    """(window_start, est_uv, exact_uv) — integer HLL estimate per
    window next to the exact count (the validation harness, as with the
    CMS; production keeps only the register build + this probe).

    est_raw = ⌊α_ppm·m²·2⁵³ / (S₂·10⁶)⌋ with S₂ = Σ 2^(53−ρ_j) over
    all m registers (absent ⇒ ρ=0 ⇒ 2⁵³), exact in DECIMAL(38,0);
    when est_raw ≤ 2.5m and V>0 empty registers remain, linear
    counting ⌊m·ln(m/V)·10⁻⁶⌋ takes over via the quantized table.
    """
    ln_arr = "array(" + ",".join(str(v) for v in _HLL_LN_PPM[1:]) + ")"
    agg = registers.groupBy("window_start").agg(
        F.sum(F.expr("shiftleft(1L, cast(53 - rho as int))")).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    est = agg.select(
        "window_start",
        F.expr(
            f"cast(s_present as decimal(38,0))"
            f" + (({HLL_M} - n_present) * cast({_POW53} as decimal(38,0)))"
        ).alias("s2"),
        (F.lit(HLL_M) - F.col("n_present")).cast("int").alias("v_zero"),
    ).select(
        "window_start",
        F.expr(
            f"cast((cast({_HLL_ALPHA_PPM} as decimal(38,0)) * {HLL_M} * {HLL_M}"
            f" * cast({_POW53} as decimal(38,0)))"
            f" div (s2 * cast(1000000 as decimal(38,0))) as bigint)"
        ).alias("est_raw"),
        "v_zero",
    )
    corrected = est.select(
        "window_start",
        F.expr(
            f"cast(if(est_raw <= {5 * HLL_M // 2} and v_zero > 0,"
            f" (cast({HLL_M} as bigint) * element_at({ln_arr}, v_zero)) div 1000000,"
            f" est_raw) as bigint)"
        ).alias("est_uv"),
    )
    return corrected.join(exact, on="window_start").select(
        "window_start", "est_uv", "exact_uv"
    )


def hll_exact_uv(events: DataFrame, view_type: str = "view") -> DataFrame:
    return (
        events.where(F.col("event_type") == view_type)
        .groupBy(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("long")
            .alias("window_start")
        )
        .agg(F.countDistinct("user_id").alias("exact_uv"))
    )


def hll_oracle_sql(view_type: str = "view") -> str:
    """DuckDB oracle: the identical registers, sum and correction."""
    h = T.h64_duck("user_id::VARCHAR")
    ln_list = "[" + ",".join(str(v) for v in _HLL_LN_PPM[1:]) + "]"
    return f"""
    WITH pts AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
               {h} % {HLL_M} AS reg,
               {h} // {HLL_M} AS w
        FROM events WHERE event_type = '{view_type}'
    ),
    regs AS (
        SELECT window_start, reg,
               max(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS rho
        FROM pts GROUP BY 1, 2
    ),
    agg AS (
        SELECT window_start,
               sum(CAST(1 AS BIGINT) << (53 - rho)) AS s_present,
               count(*) AS n_present
        FROM regs GROUP BY 1
    ),
    est AS (
        SELECT window_start,
               (CAST({_HLL_ALPHA_PPM} AS HUGEINT) * {HLL_M} * {HLL_M}
                * CAST({_POW53} AS HUGEINT))
               // ((s_present + ({HLL_M} - n_present) * CAST({_POW53} AS HUGEINT))
                   * 1000000) AS est_raw,
               {HLL_M} - n_present AS v_zero
        FROM agg
    ),
    corrected AS (
        SELECT window_start,
               CAST(CASE WHEN est_raw <= {5 * HLL_M // 2} AND v_zero > 0
                    THEN (CAST({HLL_M} AS BIGINT) * list_extract({ln_list}, v_zero))
                         // 1000000
                    ELSE est_raw END AS BIGINT) AS est_uv
        FROM est
    ),
    exact AS (
        SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS window_start,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_uv
        FROM events WHERE event_type = '{view_type}'
        GROUP BY 1
    )
    SELECT c.window_start, c.est_uv, e.exact_uv
    FROM corrected c JOIN exact e USING (window_start)
    """
