"""Synthesize a larger scale factor from sf0.1 for scaling measurements.

The driver provides testdata only up to sf0.1; the 100 TB story needs
empirical evidence that the heavy operators scale linearly, so this
tool builds an ``N×`` corpus whose WORK grows exactly N× — naive
duplication would not do that (10 exact copies of every document give
every LSH bucket 10× the members and the pair stage 100× the work,
which measures a *different* data distribution, not scale).

Construction (deterministic, structure-preserving):

- **documents**: N replicas of the sf0.1 corpus, each with its
  non-marker words renamed through a replica-seeded LETTER CIPHER
  (a bijection on 'a'-'z' applied per word).  Replica vocabularies are
  therefore DISJOINT character strings — unlike a permutation *within*
  the closed 31-word vocabulary, under which every replica draws its
  shingles and sketch hashes from the same little space and dfs/
  sketches ALIAS across replicas (measured at N=100: every 3-gram
  shingle's df inflated ~100×, so the df-capped ngram join returned 0
  rows, and cross-replica sketch proximity inflated simhash pairs
  5300× instead of 100×).  The cipher preserves word LENGTH, and the
  language-marker words present in the vocabulary ('a', 'the') are
  FIXED, so language-ID, stopword ratio, mean token length, n_chars
  and quality score are all preserved exactly per replica.
  Result: per-replica duplicate/near-duplicate structure identical to
  sf0.1, candidate pairs scale exactly N×.
- **embeddings**: N replicas with a per-replica deterministic ±1 sign
  pattern applied element-wise.  Norms (hence IVF/LSH bucket balance
  and quantization ranges) are preserved; cross-replica cosine
  collapses to noise, so nearest-neighbor structure per replica
  matches sf0.1.
- **events**: N replicas with per-replica ``user_id``/``event_id``
  strides and UNCHANGED timestamps/types/values — each replica is a
  disjoint user population behaving identically, so per-user sequence
  structure (sessions, funnels, attribution chains) is preserved
  exactly while user count, per-hour volumes, and the user-keyed
  exchange all grow N×.  The raw epoch longs pass through untouched
  (no decode/re-encode — unit normalization stays the reader's job).
- remaining tables are symlinked from the source sf dir (the heavy
  family under test only reads documents/embeddings/events).

Usage::

    python tools/make_scale_data.py [out_dir] [N] [src_sf_dir]

Defaults: out_dir=/root/repo/.scale/sf1, N=10, src=/root/testdata/sf0.1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from userbehavioranalysis_spark import get_spark
from userbehavioranalysis_spark import schemas

ID_STRIDE = 1_000_000  # doc_id/vec_id offset per replica


_MARKERS = {"the", "a", "of", "and", "le", "la", "et", "les", "el", "de", "y",
            "der", "die", "und", "das"}  # operators/text_analysis.LANG_MARKERS


def _vocab(spark, src):
    rows = (
        spark.read.parquet(os.path.join(src, "documents.parquet"))
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .distinct()
        .collect()
    )
    words = sorted(r["w"] for r in rows)
    fixed = [w for w in words if w in _MARKERS]
    rotating = [w for w in words if w not in _MARKERS]
    return fixed, rotating


def _rotated_docs(docs, fixed, rotating, r: int):
    # replica r renames every non-marker word through a seeded LETTER
    # CIPHER (bijection on 'a'-'z'), giving replicas DISJOINT
    # vocabularies.  A permutation WITHIN the closed 31-word vocabulary
    # does not: all replicas then share one tiny shingle/sketch space,
    # dfs alias across replicas (every 3-gram df inflated ~N×; the
    # df-capped ngram join returned 0 rows at N=100) and sketch
    # proximity goes quadratic (simhash pairs grew 5300× instead of
    # 100×; the 63-bit block join spilled >79 GB).  The cipher keeps
    # word length (n_chars, mean token length exact) and is injective
    # within a replica; cross-replica same-length word collisions have
    # odds ~26^-4 per pair — harmless df noise, not systematic aliasing.
    import random as _random

    letters = "abcdefghijklmnopqrstuvwxyz"
    seed = 0xC0FFEE + r
    while True:
        perm = list(letters)
        _random.Random(seed).shuffle(perm)
        cipher = str.maketrans(letters, "".join(perm))
        mapping = {w: w.translate(cipher) for w in rotating}
        # a ciphered word colliding with a FIXED marker would leak into
        # the language/stopword stats; bump the seed (never observed,
        # but 26^-3 per 3-letter word is not zero)
        if not set(mapping.values()) & set(fixed):
            break
        seed += 1_000_003
    for w in fixed:
        mapping[w] = w
    if r == 0:
        out = docs
    else:
        kv = []
        for k, v in mapping.items():
            kv += [F.lit(k), F.lit(v)]
        m = F.create_map(*kv)
        toks = F.split(F.trim("text"), r"\s+")
        out = docs.withColumn(
            "text", F.array_join(F.transform(toks, lambda t: m[t]), " ")
        )
    return out.select(
        (F.col("doc_id") + F.lit(r * ID_STRIDE)).alias("doc_id"),
        "text",
        "lang",
        "source",
        F.length("text").cast("long").alias("n_chars"),
    )


def _signed_embeddings(emb, r: int, dim: int):
    # deterministic ±1 per (replica, dimension): splitmix-style bit spray
    if r == 0:
        out = emb
    else:
        x = r * 0x9E3779B97F4A7C15
        signs = [
            1.0 if ((x >> (i % 61)) ^ (x * (i + 1))) & 2 else -1.0
            for i in range(dim)
        ]
        sarr = F.array(*[F.lit(s) for s in signs])
        out = emb.withColumn(
            "embedding",
            F.zip_with("embedding", sarr, lambda e, s: (e * s).cast("float")),
        )
    return out.select(
        (F.col("vec_id") + F.lit(r * ID_STRIDE)).alias("vec_id"),
        "embedding",
        "label",
    )


# replicas per write: a union plan carries one create_map (vocab-sized
# literal tree) per document replica, so an unchunked N=1000 plan is a
# ~30k-literal analysis job; 100-replica chunks with append-mode writes
# keep plan size constant in N (the N=100 shape that is known to work)
_CHUNK = 100


def _write_chunked(frames, path) -> None:
    mode = "overwrite"
    for lo in range(0, len(frames), _CHUNK):
        union = frames[lo]
        for rep in frames[lo + 1 : lo + _CHUNK]:
            union = union.unionByName(rep)
        union.repartition(32).write.mode(mode).parquet(path)
        mode = "append"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")

    fixed, rotating = _vocab(spark, src)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    _write_chunked(
        [_rotated_docs(docs, fixed, rotating, r) for r in range(n)],
        os.path.join(out_dir, "documents.parquet"),
    )

    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()["embedding"])
    _write_chunked(
        [_signed_embeddings(emb, r, dim) for r in range(n)],
        os.path.join(out_dir, "embeddings.parquet"),
    )

    ev = spark.read.schema(schemas.EVENTS_RAW).parquet(
        os.path.join(src, "events.parquet")
    )
    _write_chunked(
        [
            ev.select(
                (F.col("event_id") + F.lit(r * ID_STRIDE)).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(r * ID_STRIDE)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
            for r in range(n)
        ],
        os.path.join(out_dir, "events.parquet"),
    )

    for t in schemas.TESTDATA_TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        link = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src, f"{t}.parquet"), link)

    nd = spark.read.parquet(os.path.join(out_dir, "documents.parquet")).count()
    ne = spark.read.parquet(os.path.join(out_dir, "embeddings.parquet")).count()
    nv = spark.read.parquet(os.path.join(out_dir, "events.parquet")).count()
    print(
        f"wrote {out_dir}: documents={nd} embeddings={ne} events={nv} "
        f"(N={n} from {src})"
    )


if __name__ == "__main__":
    main()
