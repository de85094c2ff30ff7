"""Runtime-filter join pruning: a DataFrame-built Bloom filter that
prunes the big side of a join BEFORE its shuffle.

The 100 TB problem this solves: ``big ⋈ small_filtered`` must shuffle
every big-side row to its key's reducer even though only the few rows
whose keys survive the small side's filter can ever match.  Engines
attack this with runtime filters (Spark's InjectRuntimeFilter /
``bloom_filter_agg``, which Spark 4.1 does not expose as a public SQL
function); this module expresses the same pattern with public DataFrame
ops only:

1. **Build** (distributed, one pass over the small side): each key sets
   ``depth`` bits of an ``m_bits`` bitmap.  The bitmap is built as a
   ``(word, mask)`` aggregation — ``bit_or`` of single-bit masks grouped
   by 64-bit word index — so partial aggregation combines map-side and
   the exchange carries at most ``m_bits/64`` rows per task, REGARDLESS
   of small-side cardinality.
2. **Collect** the ≤ ``m_bits/64`` words (bounded by construction:
   16 KiB for the default 2²⁰ bits — same driver-held-model-state
   posture as the IVF centroids in ``operators/similarity.py``).
3. **Probe** (pure JVM, zero Python in the row path): the bitmap rides
   as a broadcast one-row array<long> frame (one Arrow batch in, one
   broadcast out), and per row the probe is ``depth`` xxhash64 calls +
   ``element_at`` + bit-tests inside WholeStageCodegen, before any
   exchange.  False positives survive the prefilter; the final exact
   join removes them, so the operator's RESULT is byte-identical to the
   plain join — only the shuffle volume changes.

Sizing: ~10 bits/key keeps the false-positive rate ≈1 %.  The default
2²⁰ bits covers ~10⁵ keys; a 100 TB build-side with 10⁸ surviving keys
wants ``m_bits=2³⁰`` (a 128 MiB driver-held bitmap — at that point flip
to Spark's own runtime-filter rule or a bucketed pre-join instead; the
crossover is documented, not hidden).

No reference analogue (the reference joins are stream-stream interval
joins, `TxMacthDetect.scala:12`); this is part of the training-pipeline
extension set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_build(keys: DataFrame, key: str, m_bits: int = 1 << 20, depth: int = 4) -> list[int]:
    """Build the bitmap from ``keys[key]`` (one pass, partial-agg
    combined); returns ``m_bits/64`` packed words.

    ``m_bits`` must be a multiple of 64.  Hash d of a key is
    ``xxhash64(key, d)`` — seeding via the extra hashed column keeps all
    ``depth`` functions independent and JVM-evaluated.
    """
    positions = F.array(
        *[F.pmod(F.xxhash64(F.col(key), F.lit(d)), F.lit(m_bits)) for d in range(depth)]
    )
    words = (
        keys.select(F.explode(positions).alias("p"))
        .select(
            F.shiftright(F.col("p"), 6).cast("int").alias("word"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("mask"))
        .collect()  # bounded: ≤ m_bits/64 rows by construction
    )
    bits = [0] * (m_bits // 64)
    for row in words:
        bits[row["word"]] = row["mask"]
    return bits


def bloom_prefilter(
    df: DataFrame, key: str, bits: list[int], m_bits: int = 1 << 20, depth: int = 4
) -> DataFrame:
    """Keep the rows whose ``key`` MIGHT be in the filter (no false
    negatives; false-positive rate set by sizing).

    The bitmap rides as a BROADCAST one-row frame (single Arrow batch —
    NOT ``array(lit, …)``, whose 2¹⁴ per-element py4j calls cost ~30 s
    of plan-construction; measured), joined in with a broadcast
    nested-loop of exactly one row.  The per-row probe — hash, word
    lookup, bit test — is plain SQL expressions inside
    WholeStageCodegen, evaluated BEFORE any exchange.  The hash
    positions live in temp columns so ``shiftleft``'s literal-only
    Python signature never gets in the way.
    """
    bf = df.sparkSession.createDataFrame([(bits,)], "_bf_arr array<bigint>")
    out = df.crossJoin(F.broadcast(bf))
    tests = []
    for d in range(depth):
        out = out.withColumn(
            f"_bf_p{d}", F.pmod(F.xxhash64(F.col(key), F.lit(d)), F.lit(m_bits))
        )
        tests.append(
            f"(element_at(_bf_arr, cast(shiftright(_bf_p{d}, 6) + 1 as int))"
            f" & shiftleft(1L, cast(_bf_p{d} % 64 as int))) != 0"
        )
    out = out.where(F.expr(" AND ".join(tests)))
    return out.drop("_bf_arr", *[f"_bf_p{d}" for d in range(depth)])


def bloom_prefiltered_join(
    big: DataFrame,
    big_key: str,
    small: DataFrame,
    small_key: str,
    m_bits: int = 1 << 20,
    depth: int = 4,
) -> DataFrame:
    """``big ⋈ small`` (inner) with the big side Bloom-pruned before its
    shuffle.  Result is exactly the plain inner join — the prefilter
    only cuts the rows that enter the exchange."""
    bits = bloom_build(small.select(small_key), small_key, m_bits, depth)
    pruned = bloom_prefilter(big, big_key, bits, m_bits, depth)
    return pruned.join(small, pruned[big_key] == small[small_key])
