"""Persisted index artifacts for incremental dedup — the
write / pruned-probe / append / compact lifecycle for BOTH modalities
(minhash text band index, embedding hyperplane band index), split out
of ``dedup`` in round 7 for module hygiene.

The in-memory pair generators and the in-memory incremental forms
stay in ``operators/dedup``; this module owns everything that touches
parquet artifacts and their ``_manifest.json`` signing-parameter
sidecars (operators/manifests.py).  Every public name here is
re-exported through ``operators.dedup`` so existing imports keep
working.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from userbehavioranalysis_spark.functions.arrays import exploded
from userbehavioranalysis_spark.operators.cachepool import pooled_cache, release_pooled
from userbehavioranalysis_spark.operators.manifests import (
    index_manifest as _index_manifest,
    resolve_signing_params as _resolve_signing_params,
)
# Pair-generation helpers stay in operators.dedup and are imported
# INSIDE the functions that need them: dedup re-exports this module at
# its end, so a module-level import here would deadlock whichever
# module is imported second (verified: importing dedup_index first
# raised ImportError with a top-level import).


# Scale-adaptive shard sizing (guide §2/§6: derive partitioning from
# input size, never a constant tuned for one deployment).  One shard
# directory per ~4M corpus rows per band keeps each (band, shard) dir
# at roughly a parquet-file-worth of band rows (~128 MB at ~32 B/row)
# at production scale, while a small corpus gets few directories — the
# 64-shard ceiling reproduces the former fixed layout at ≥256M rows
# (the 100 TB regime the constant was chosen for).  Writing the former
# fixed 512-dir embedding layout for sf0.1's 2,000-vector corpus cost
# 10.9 s vs 1.5 s for a size-matched layout (measured, r8), all of it
# file-creation overhead; probes pay listing cost per dir too.
_SHARD_TARGET_ROWS = 4_000_000


def _derived_shards(n_rows: int, ceiling: int = 64) -> int:
    return max(1, min(ceiling, -(-int(n_rows) // _SHARD_TARGET_ROWS)))


# Partition-pruning pays when the index's partition DOMAIN is large
# (a daily delta then touches few of many shard dirs — the 100 TB
# steady state).  Below this bound the probe's observed-shard collect
# is a whole extra Spark job (it signs the batch just to learn shards
# it was going to read anyway: a 4-directory index is read in full by
# construction), so the probe skips the collect and lets the bucket
# join do the filtering — semantically identical, one fewer action per
# micro-batch.  16 = the smallest domain where a typical delta could
# plausibly skip half the directories.
_PRUNE_MIN_DOMAIN = 16


def minhash_index_write(
    corpus: DataFrame,
    path: str,
    shingle_k: int = 1,
    n_hashes: int = 12,
    bands: int = 4,
    max_bucket: int | None = None,
    sig_shards: int | None = None,
) -> None:
    """Materialize the incremental-dedup corpus index as PARQUET — the
    production persistence leg of :func:`minhash_corpus_index`.

    Two datasets under ``path``:

    - ``signatures/`` — (doc_id, m0..m<n-1>) scalar minhash columns,
      the score-join side.  Plain parquet; at 100 TB you'd additionally
      bucket it by doc_id, but the probe joins it AFTER candidate
      generation so it only ever feeds a signature lookup.
    - ``buckets/`` — (corpus_doc_id, band_sig) Hive-partitioned by
      (band_id, sig_shard) where ``sig_shard =
      pmod(xxhash64(band_sig), sig_shards)``.  band_sig itself has an
      unbounded domain (it IS the minhash slice), so it cannot be a
      partition column directly; the shard is an equality-preserving
      projection of it with a fixed, small domain (bands × sig_shards
      directories), which is exactly what lets the probe turn the new
      batch's observed shards into partition-pruning predicates — a
      daily delta touching few shards reads few directories, never the
      corpus.  ``repartition`` before ``partitionBy`` keeps it to one
      file per shard (writers.py discipline).  ``sig_shards=None``
      (default) derives the shard count from the corpus row count
      (:func:`_derived_shards` — scale-adaptive: ~4M rows/band/shard,
      ceiling 64 = the former fixed layout at ≥256M docs), so a small
      corpus never pays hundreds of directory creations/listings for
      kilobytes of data.

    ``max_bucket`` (the hot-bucket cap) is applied at WRITE time — the
    capped index is the production artifact, so every probe inherits
    the O(batch · cap) bound without re-counting bucket sizes.

    A ``_manifest.json`` records the signing parameters next to the
    data: the probe and the append derive their parameters FROM it, so
    an index written with one (shingle_k, n_hashes, bands, sig_shards)
    can never be silently probed or appended with another — a mismatch
    (e.g. probe sig_shards=64 against a 128-shard index) would
    otherwise drop roughly half of all true matches with no error.
    (Local-path json here; on an object store the same sidecar goes
    through the filesystem client.)

    Cf. similarity.ann_index_write (similarity.py:485) — the same
    persisted-LSH posture for the embedding-vector index.
    """
    from pyspark.sql import Observation

    from userbehavioranalysis_spark.operators.dedup import minhash_corpus_index

    assert n_hashes % bands == 0
    sig_c, bk_c = minhash_corpus_index(corpus, shingle_k, n_hashes, bands, max_bucket)
    # the tokenize→shingle→minhash subtree feeds BOTH dataset writes
    # (bk_c is banded FROM sig_c): cache it for the duration so the
    # corpus is signed once, not once per write (measured ~1.7 s/pass
    # at sf0.1 — the bucket write's plan shares the subtree and hits
    # the cached blocks via CacheManager plan matching)
    sig_c = sig_c.cache()
    try:
        # corpus size rides the signatures write (Observation — no
        # extra job); sig_shards=None derives the shard count from it,
        # so the layout is scale-adaptive instead of a fixed 64 (see
        # _derived_shards; the manifest pins whatever was used, probes
        # and appends inherit it)
        obs = Observation()
        sig_c.select(
            "doc_id", *[F.col(f"m{i}") for i in range(n_hashes)]
        ).observe(obs, F.count(F.lit(1)).alias("n")).write.mode("overwrite").parquet(
            f"{path}/signatures"
        )
        if sig_shards is None:
            sig_shards = _derived_shards(obs.get["n"])
        (
            bk_c.withColumn(
                "sig_shard",
                F.pmod(F.xxhash64("band_sig"), F.lit(sig_shards)).cast("int"),
            )
            .repartition("band_id", "sig_shard")
            .write.mode("overwrite")
            .partitionBy("band_id", "sig_shard")
            .parquet(f"{path}/buckets")
        )
    finally:
        sig_c.unpersist()
    import json
    import os

    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(
            {
                "shingle_k": shingle_k,
                "n_hashes": n_hashes,
                "bands": bands,
                "sig_shards": sig_shards,
                "max_bucket": max_bucket,
            },
            f,
        )




def minhash_index_append(
    new_docs: DataFrame,
    path: str,
    shingle_k: int | None = None,
    n_hashes: int | None = None,
    bands: int | None = None,
    sig_shards: int | None = None,
) -> None:
    """Index MAINTENANCE: append a new batch's signatures and band
    buckets to an existing :func:`minhash_index_write` index — the step
    that closes the daily loop (gate → dedup → APPEND survivors, so
    tomorrow's delta probes today's corpus).

    Appends parquet files into the same (band_id, sig_shard) partition
    layout — at 100 TB this is a metadata-only commit per shard
    directory, never a rewrite of the existing index; probes see the
    union because partition pruning selects directories, not files.
    Note the hot-bucket cap is NOT re-evaluated across the append
    boundary (a bucket can exceed the cap via appends until the next
    rewrite) — the standard compaction trade, stated not hidden; run
    :func:`minhash_index_compact` periodically to re-cap and collapse
    the accumulated per-append files, exactly like any LSM-shaped
    index compacts (measured: 30 daily appends → 10.8× the file
    count; see BASELINE.md).

    Signing parameters come from the index's ``_manifest.json`` when
    present — an append can never silently desynchronize from the
    layout it appends into; an EXPLICITLY passed value that conflicts
    with the manifest raises (silent override would quietly apply
    different parameters than requested).  The keyword args apply only
    to pre-manifest indexes.

    NOTE the shard count pinned at write time is inherited by every
    append AND by compact (which preserves the layout): an index
    written small that grows far past ``_SHARD_TARGET_ROWS`` per shard
    keeps its original partition-pruning granularity until a FULL
    REWRITE (``minhash_index_write`` over the union content with
    ``sig_shards=None`` re-derives the count) — the deliberate escape
    hatch, since re-sharding in place would invalidate every
    concurrently-running probe's pruning predicates.
    """
    p = _resolve_signing_params(
        path,
        {"shingle_k": 1, "n_hashes": 12, "bands": 4, "sig_shards": 64},
        {
            "shingle_k": shingle_k,
            "n_hashes": n_hashes,
            "bands": bands,
            "sig_shards": sig_shards,
        },
    )
    from userbehavioranalysis_spark.operators.dedup import minhash_corpus_index

    shingle_k, n_hashes = p["shingle_k"], p["n_hashes"]
    bands, sig_shards = p["bands"], p["sig_shards"]
    assert n_hashes % bands == 0
    sig_n, bk_n = minhash_corpus_index(new_docs, shingle_k, n_hashes, bands, None)
    # sign the batch once across both appends (same shared-subtree
    # cache as minhash_index_write)
    sig_n = sig_n.cache()
    try:
        sig_n.select(
            "doc_id", *[F.col(f"m{i}") for i in range(n_hashes)]
        ).write.mode("append").parquet(f"{path}/signatures")
        (
            bk_n.withColumn(
                "sig_shard",
                F.pmod(F.xxhash64("band_sig"), F.lit(sig_shards)).cast("int"),
            )
            .repartition("band_id", "sig_shard")
            .write.mode("append")
            .partitionBy("band_id", "sig_shard")
            .parquet(f"{path}/buckets")
        )
    finally:
        sig_n.unpersist()


def minhash_index_compact(
    path: str,
    max_bucket: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Index COMPACTION: the periodic rewrite that re-establishes the
    two properties appends erode — the hot-bucket cap and the
    one-file-per-shard layout (the LSM compact step for this index).

    :func:`minhash_index_append` is deliberately a metadata-only
    commit: it neither re-counts bucket sizes (a bucket can drift past
    the cap across appends) nor merges files (each append adds one
    file per touched shard — a daily loop accumulates hundreds).  This
    rewrite does both, in place:

    - ``buckets/`` is re-read, the cap re-applied over the UNION
      content with the same windowed count as write time, and
      rewritten one file per (band_id, sig_shard) partition.  NOTE the
      cap applies to what the index *contains*: rows a previous CAPPED
      write already dropped were declared low-information then and
      stay gone — so compact(write(A) + append(B), cap) equals
      write(A∪B, cap) exactly when the base was written uncapped (the
      pinned-test identity), and is the standard LSM re-cap otherwise.
    - ``signatures/`` is rewritten into ``ceil(bytes/target)`` files
      (appends add one file per batch there too).

    ``max_bucket=None`` re-applies the manifest's cap (pure file
    compaction if the index is uncapped); an explicit value sets a NEW
    cap and updates the manifest — re-capping is a rewrite-time
    decision, so unlike probe/append parameters it may legitimately
    change here.  Each dataset is STREAMED into a temp sibling dir and
    swapped in (never materialized whole — a localCheckpoint of a
    100 TB index would pin it in executor storage; the swap is two
    directory renames, with the same non-transactionality caveat as
    delete_rows_partition_scoped: atomic publish is the table format's
    job, this is the I/O plan it would run).  Returns
    {"bucket_rows": n, "dropped_rows": n, "bucket_files": n} for audit.
    """
    from userbehavioranalysis_spark.operators.dedup import _cap_buckets

    after, dropped, files = _compact_index(
        path,
        banded_subdir="buckets",
        flat_subdir="signatures",
        cap_fn=_cap_buckets,
        part_cols=("band_id", "sig_shard"),
        max_bucket=max_bucket,
        target_file_bytes=target_file_bytes,
    )
    return {"bucket_rows": after, "dropped_rows": dropped, "bucket_files": files}


def _compact_index(
    path: str,
    banded_subdir: str,
    flat_subdir: str,
    cap_fn,
    part_cols: tuple[str, str],
    max_bucket: int | None,
    target_file_bytes: int,
) -> tuple[int, int, int]:
    """Shared LSM-compact core for a banded index (minhash buckets /
    embedding bands + their flat sibling dataset): one implementation
    of re-cap → one-file-per-partition rewrite → byte-target flat
    rewrite → manifest cap update, so a fix to the compact step can
    never apply to one index family and miss the other.

    The before/after audit counts ride the SAME pass as the rewrite
    (``Observation`` metrics on the read and capped subtrees) — a
    compact scans the banded dataset once, not three times.  The cap
    now in force is ALWAYS recorded, creating a cap-only manifest on a
    pre-manifest index (absent signing keys keep resolving to
    defaults, so probes are unaffected) — otherwise a later
    ``compact(path)`` with no explicit cap would silently degrade to
    pure file compaction and let hot buckets drift forever.  Returns
    (rows_after, rows_dropped, banded_file_count).
    """
    import glob
    import json
    import os

    from pyspark.sql import Observation
    from pyspark.sql import SparkSession as _S

    spark = _S.getActiveSession()
    m = _index_manifest(path)
    if max_bucket is None:
        max_bucket = m.get("max_bucket")

    banded = os.path.join(path, banded_subdir)
    obs_in, obs_out = Observation(), Observation()
    src = spark.read.parquet(banded).observe(
        obs_in, F.count(F.lit(1)).alias("n")
    )
    (
        cap_fn(src, max_bucket)
        .observe(obs_out, F.count(F.lit(1)).alias("n"))
        .repartition(*part_cols)
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(f"{banded}_compact_tmp")
    )
    _swap_dir(f"{banded}_compact_tmp", banded)
    before, after = obs_in.get["n"], obs_out.get["n"]

    flat = os.path.join(path, flat_subdir)
    flat_bytes = sum(
        os.path.getsize(p) for p in glob.glob(os.path.join(flat, "*.parquet"))
    )
    n_files = max(1, -(-flat_bytes // target_file_bytes))
    spark.read.parquet(flat).repartition(n_files).write.mode("overwrite").parquet(
        f"{flat}_compact_tmp"
    )
    _swap_dir(f"{flat}_compact_tmp", flat)

    m["max_bucket"] = max_bucket
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(m, f)
    files = len(glob.glob(os.path.join(banded, "*", "*", "*.parquet")))
    return after, before - after, files


def _swap_dir(tmp: str, final: str) -> None:
    """Replace ``final`` with freshly-written ``tmp`` (two renames on
    the same filesystem; object stores do this as a prefix swap).

    Rename-aside order: the live dataset is moved ASIDE first, the
    replacement moved in, and only then is the old copy deleted — so a
    crash at any point leaves one complete copy on disk (either the
    old data at the aside path or the new data live).  A plain
    rmtree(final)-then-move would open a window where NO readable copy
    exists at the published path.  The swap itself is still not
    transactional against concurrent readers mid-listing (a table
    format's job); the data-loss window is what this removes."""
    import os
    import shutil

    aside = f"{final}_swap_aside"
    shutil.rmtree(aside, ignore_errors=True)  # stale aside from a prior crash
    os.rename(final, aside)
    shutil.move(tmp, final)
    shutil.rmtree(aside)


def minhash_incremental_matches_indexed(
    new_docs: DataFrame,
    index_path: str,
    shingle_k: int | None = None,
    n_hashes: int | None = None,
    bands: int | None = None,
    min_matching_hashes: int = 6,
    sig_shards: int | None = None,
) -> DataFrame:
    """:func:`minhash_incremental_matches` probing the PERSISTED index
    with partition pruning — the 100 TB refresh loop's steady state.

    Only the new batch is tokenized/minhashed (cached once — it feeds
    the shard collect, the bucket join, and the score join).  On a
    production-domain index (bands × sig_shards > _PRUNE_MIN_DOMAIN)
    the batch's observed (band_id, sig_shard) pairs — a collect
    bounded by the DOMAIN, never by data size — become an OR of
    partition-column predicates, so the bucket scan lists and reads
    only the probed directories (PartitionFilters in the plan,
    asserted in tests); a small-domain index skips the collect job —
    every directory would be probed anyway, and the bucket equi-join
    filters identically.  Candidates then come from band_sig equality
    inside those shards, and the signature parquet is joined only for
    candidate corpus docs.  Output (new_doc_id, corpus_doc_id,
    match_count) is IDENTICAL to the in-memory path on the same capped
    index — same oracle, hash-checkable.

    Signing parameters come from the index's ``_manifest.json`` when
    present (a probe can never silently use a different shard count or
    band layout than the index was written with — the mismatch would
    drop true matches with no error); an EXPLICITLY passed value that
    conflicts with the manifest raises instead of being silently
    overridden.  The keyword args apply only to pre-manifest indexes.
    ``min_matching_hashes`` stays caller-side — it is a query-time
    threshold, not a signing parameter.
    """
    p = _resolve_signing_params(
        index_path,
        {"shingle_k": 1, "n_hashes": 12, "bands": 4, "sig_shards": 64},
        {
            "shingle_k": shingle_k,
            "n_hashes": n_hashes,
            "bands": bands,
            "sig_shards": sig_shards,
        },
    )
    from userbehavioranalysis_spark.operators.dedup import (
        _band_expr,
        _match_count_expr,
        _with_signature,
    )

    shingle_k, n_hashes = p["shingle_k"], p["n_hashes"]
    bands, sig_shards = p["bands"], p["sig_shards"]
    assert n_hashes % bands == 0
    spark = new_docs.sparkSession
    rows = n_hashes // bands
    # single-slot probe pool: the batch signature subtree feeds the
    # shard collect, the bucket join, and the score join; releasing
    # the PREVIOUS probe's slot on entry bounds refresh-loop caches at
    # one batch instead of accumulating per micro-batch
    release_pooled("probe")
    sig_n = pooled_cache(
        _with_signature(new_docs, shingle_k, n_hashes), pool="probe"
    )
    bk_n = (
        exploded(sig_n, _band_expr(bands, rows), "band", "doc_id")
        .select(F.col("doc_id").alias("new_doc_id"), "band.band_id", "band.band_sig")
        .withColumn(
            "sig_shard", F.pmod(F.xxhash64("band_sig"), F.lit(sig_shards)).cast("int")
        )
    )
    # explicit schemas on both index reads: the layout is pinned by the
    # writer (+ manifest), so footer schema inference is a pure extra
    # Spark job per read — measured 3 inference jobs and ~0.3-0.9 s of
    # driver time per refresh micro-batch (guide §1.2: don't compute
    # what you already know).  Types mirror the writer exactly
    # (corpus_doc_id/mN are bigint aggregates; partition columns
    # band_id/sig_shard are int, discovery order = directory nesting).
    idx = spark.read.schema(
        "corpus_doc_id long, band_sig string, band_id int, sig_shard int"
    ).parquet(f"{index_path}/buckets")
    if bands * sig_shards > _PRUNE_MIN_DOMAIN:
        # production-domain index: collect the batch's observed
        # (band_id, sig_shard) pairs — bounded by the DOMAIN, never by
        # data — into grouped per-band IN-list partition predicates
        # (shared shape, see similarity.grouped_probe_predicate:
        # per-pair OR chains overflow the JVM stack at domain-sized
        # probe sets), so the scan lists only the probed directories.
        # Small-domain indexes (derived shards on a small corpus) skip
        # the collect: the batch covers every directory anyway, and
        # the equi-join filters identically (see _PRUNE_MIN_DOMAIN).
        from userbehavioranalysis_spark.operators.similarity import (
            grouped_probe_predicate,
        )

        probes = {
            (r["band_id"], r["sig_shard"])
            for r in bk_n.select("band_id", "sig_shard").distinct().collect()
        }
        idx = idx.where(grouped_probe_predicate(probes, "band_id", "sig_shard"))
    cand = (
        idx.join(bk_n, ["band_id", "band_sig", "sig_shard"])
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
    sig_c = spark.read.schema(
        "doc_id long, " + ", ".join(f"m{i} long" for i in range(n_hashes))
    ).parquet(f"{index_path}/signatures")
    sn = sig_n.select(
        F.col("doc_id").alias("new_doc_id"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(n_hashes)],
    )
    sc = sig_c.select(
        F.col("doc_id").alias("corpus_doc_id"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(n_hashes)],
    )
    return (
        cand.join(sn, "new_doc_id")
        .join(sc, "corpus_doc_id")
        .withColumn("match_count", _match_count_expr(n_hashes))
        .filter(F.col("match_count") >= min_matching_hashes)
        .select("new_doc_id", "corpus_doc_id", "match_count")
    )


# ---------------------------------------------------------------------------
# Persisted embedding-dedup index (write / probe / append) — the same
# artifact posture minhash_index_write/_indexed/_append give the text
# family, applied to the embedding modality so the 100 TB refresh loop
# never re-signs the corpus.
# ---------------------------------------------------------------------------

_EMB_NRM = (
    "sqrt(aggregate(cast(embedding as array<double>), cast(0 as double),"
    " (acc, x) -> acc + x * x))"
)

_EMB_DOT = (
    "aggregate(zip_with(va, vb, (x, y) -> x * y),"
    " cast(0 as double), (acc, x) -> acc + x)"
)


def _band_shard_col(band_shards: int):
    """Equality-preserving shard of a band value with a FIXED domain.

    ``band_val`` itself has domain 2^band_bits (65,536 at the default
    16) — far too many Hive directories; the shard projects it to
    ``band_shards`` values, so the index partition domain is
    n_bands × band_shards directories (512 at the defaults).  The
    explicit bigint cast pins the xxhash64 input type: the probe
    recomputes the shard from its own band values, and xxhash64 hashes
    int and bigint differently — an implicit type drift between write
    and probe would silently route every probe to the wrong shard.
    """
    return F.pmod(
        F.xxhash64(F.col("band_val").cast("bigint")), F.lit(band_shards)
    ).cast("int")


def _cap_emb_buckets(bands: DataFrame, max_bucket: int | None) -> DataFrame:
    """Hot-bucket guard over embedding band rows: drop (band, band_val)
    buckets larger than ``max_bucket`` (None = keep all) — the same
    role (and the same windowed form, riding the write's partitioning)
    as :func:`_cap_buckets` for minhash band buckets.  Hot embedding
    buckets are boilerplate/near-zero vectors whose band value
    concentrates; a bucket of b corpus vectors fans every colliding
    delta vector into b candidates, so the cap bounds the probe at
    O(delta · cap) while true near-dups still match through their
    other bands."""
    if max_bucket is None:
        return bands
    from pyspark.sql import Window as _W

    return (
        bands.withColumn(
            "bsz", F.count(F.lit(1)).over(_W.partitionBy("band", "band_val"))
        )
        .filter(F.col("bsz") <= max_bucket)
        .drop("bsz")
    )


def embedding_index_write(
    corpus_emb: DataFrame,
    path: str,
    n_planes: int = 128,
    band_bits: int = 16,
    band_shards: int | None = None,
    max_bucket: int | None = None,
) -> None:
    """Materialize the embedding-dedup corpus index as PARQUET — the
    persistence leg that turns :func:`embedding_dedup_incremental`'s
    per-call O(corpus) signature fold into a one-time write (mirror of
    :func:`minhash_index_write` for the embedding modality).

    Two datasets under ``path``:

    - ``vectors/`` — (vec_id, embedding as array<double>) for the
      exact-cosine verify; joined only for candidate corpus vectors.
      float→double widening is exact, so the stored vectors reproduce
      the in-memory path's cosines bit-for-bit.
    - ``bands/`` — (corpus_vec_id, band_val) Hive-partitioned by
      (band, band_shard): band_val's domain (2^band_bits) is too large
      to be a partition column directly, so the shard is an
      equality-preserving projection with a fixed small domain
      (n_bands × band_shards directories) — the probe turns its
      observed shards into partition-pruning predicates, reading few
      directories, never the corpus.  One file per shard via
      ``repartition`` before ``partitionBy`` (writers.py discipline).
      ``band_shards=None`` (default) derives the shard count from the
      corpus row count (:func:`_derived_shards` — scale-adaptive:
      ~4M vectors/band/shard, ceiling 64 = the former fixed layout at
      ≥256M vectors), so a small corpus never pays hundreds of
      directory creations/listings for kilobytes of data.

    ``max_bucket`` is the hot-bucket guard (:func:`_cap_emb_buckets`),
    applied at WRITE time exactly like the minhash index's: the capped
    index is the production artifact, so every probe inherits the
    O(delta · cap) bound without re-counting bucket sizes.

    A ``_manifest.json`` records the signing parameters; probe and
    append derive theirs FROM it (conflicting explicit kwargs raise),
    so an index can never be silently probed with a different plane
    count, band split, or shard count — any of which would drop true
    matches with no error.

    The signatures are the shared integer-exact ``similarity._lsh_bands``
    scheme, so this index, ``embedding_dedup_lsh``, and the ANN store
    all speak one signing scheme.
    """
    from pyspark.sql import Observation

    from userbehavioranalysis_spark.operators.similarity import _lsh_bands

    # corpus size rides the vectors write (Observation — no extra job);
    # band_shards=None derives the shard count from it (scale-adaptive
    # layout, see _derived_shards; the manifest pins whatever was used)
    obs = Observation()
    corpus_emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).observe(obs, F.count(F.lit(1)).alias("n")).write.mode("overwrite").parquet(
        f"{path}/vectors"
    )
    if band_shards is None:
        band_shards = _derived_shards(obs.get["n"])
    (
        _cap_emb_buckets(
            _lsh_bands(corpus_emb, "corpus_vec_id", n_planes, band_bits),
            max_bucket,
        )
        .withColumn("band_shard", _band_shard_col(band_shards))
        .repartition("band", "band_shard")
        .write.mode("overwrite")
        .partitionBy("band", "band_shard")
        .parquet(f"{path}/bands")
    )
    import json
    import os

    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(
            {
                "n_planes": n_planes,
                "band_bits": band_bits,
                "band_shards": band_shards,
                "max_bucket": max_bucket,
            },
            f,
        )


def embedding_index_append(
    new_emb: DataFrame,
    path: str,
    n_planes: int | None = None,
    band_bits: int | None = None,
    band_shards: int | None = None,
) -> None:
    """Index MAINTENANCE: append a new vector batch's rows and band
    signatures into an existing :func:`embedding_index_write` index —
    the step that closes the embedding-side daily loop (screen → dedup
    → APPEND survivors, so tomorrow's delta probes today's corpus).

    Appends parquet files into the same (band, band_shard) layout —
    a metadata-only commit per shard directory at 100 TB, never a
    rewrite; probes see the union because partition pruning selects
    directories, not files.  Signing parameters come from the index's
    ``_manifest.json``; an explicitly passed conflicting value raises.
    The write-time shard count is pinned for the index's life (appends
    and compact preserve the layout); re-derive it via a full
    ``embedding_index_write`` rewrite — see the minhash append note.
    """
    from userbehavioranalysis_spark.operators.similarity import _lsh_bands

    p = _resolve_signing_params(
        path,
        {"n_planes": 128, "band_bits": 16, "band_shards": 64},
        {"n_planes": n_planes, "band_bits": band_bits, "band_shards": band_shards},
    )
    new_emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).write.mode("append").parquet(f"{path}/vectors")
    (
        _lsh_bands(new_emb, "corpus_vec_id", p["n_planes"], p["band_bits"])
        .withColumn("band_shard", _band_shard_col(p["band_shards"]))
        .repartition("band", "band_shard")
        .write.mode("append")
        .partitionBy("band", "band_shard")
        .parquet(f"{path}/bands")
    )


def embedding_index_compact(
    path: str,
    max_bucket: int | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Re-cap + file-collapse rewrite of an embedding-dedup index —
    the :func:`minhash_index_compact` analog, so the embedding family
    carries the full write/probe/append/compact lifecycle too.

    Appends defer the same two invariants here: the (band, band_val)
    hot-bucket cap is never re-evaluated across the append boundary,
    and each append adds one file per touched shard.  This rewrite
    re-applies the cap over the union content (``max_bucket=None``
    re-applies the manifest's; an explicit value sets a new cap and
    updates the manifest), collapses bands to one file per
    (band, band_shard) partition, and rewrites the vector table into
    ``ceil(bytes/target)`` files — one shared compact core with the
    minhash index (:func:`_compact_index`: streamed temp-dir swap,
    single-pass Observation audit counts, cap always recorded).
    Returns {"band_rows": n, "dropped_rows": n, "band_files": n}.
    """
    after, dropped, files = _compact_index(
        path,
        banded_subdir="bands",
        flat_subdir="vectors",
        cap_fn=_cap_emb_buckets,
        part_cols=("band", "band_shard"),
        max_bucket=max_bucket,
        target_file_bytes=target_file_bytes,
    )
    return {"band_rows": after, "dropped_rows": dropped, "band_files": files}


def embedding_dedup_incremental_indexed(
    new_emb: DataFrame,
    index_path: str,
    min_cosine: float = 0.4,
    n_planes: int | None = None,
    band_bits: int | None = None,
    band_shards: int | None = None,
) -> DataFrame:
    """:func:`embedding_dedup_incremental` probing the PERSISTED band
    index with partition pruning — the 100 TB embedding-refresh steady
    state (mirror of :func:`minhash_incremental_matches_indexed`).

    Only the batch is signed fresh (cached once in the single-slot
    probe pool — it feeds the shard collect and the bucket join).  On
    a production-domain index (n_bands × band_shards >
    _PRUNE_MIN_DOMAIN) the batch's observed (band, band_shard) pairs —
    a collect bounded by the DOMAIN, never by data size — become an
    OR of partition-column predicates, so the band scan lists and
    reads only the probed directories (PartitionFilters in the plan,
    asserted in tests); a small-domain index skips the collect job —
    every directory would be probed anyway, and the band equi-join
    filters identically.  Candidates come from band_val equality inside
    those shards; the stored corpus vectors are joined only for
    candidates, and the exact integer-free cosine filter reproduces
    the in-memory path bit-for-bit (float→double storage is exact).
    Output (new_vec_id, corpus_vec_id) is IDENTICAL to
    ``embedding_dedup_incremental`` on the same corpus — same oracle,
    hash-checkable.

    ``min_cosine`` stays caller-side — a query-time threshold, not a
    signing parameter.
    """
    from userbehavioranalysis_spark.operators.similarity import _lsh_bands

    p = _resolve_signing_params(
        index_path,
        {"n_planes": 128, "band_bits": 16, "band_shards": 64},
        {"n_planes": n_planes, "band_bits": band_bits, "band_shards": band_shards},
    )
    spark = new_emb.sparkSession
    release_pooled("probe")
    bands_n = pooled_cache(
        _lsh_bands(new_emb, "new_vec_id", p["n_planes"], p["band_bits"])
        .withColumn("band_shard", _band_shard_col(p["band_shards"])),
        pool="probe",
    )
    n_bands = p["n_planes"] // p["band_bits"]
    # explicit schema: layout pinned by the writer/manifest — footer
    # inference is an extra job per probe (see the minhash probe note)
    idx = spark.read.schema(
        "corpus_vec_id long, band_val int, band int, band_shard int"
    ).parquet(f"{index_path}/bands")
    if n_bands * p["band_shards"] > _PRUNE_MIN_DOMAIN:
        # production-domain index: grouped per-band IN-list partition
        # predicates from the batch's observed (band, band_shard)
        # pairs — a DOMAIN-bounded collect (this probe is where the
        # per-pair OR chain first overflowed the JVM stack, at sf0.1's
        # 512-pair domain-sized delta; see
        # similarity.grouped_probe_predicate).  Small-domain indexes
        # (derived shards on a small corpus) skip the collect: the
        # batch covers every directory anyway and the equi-join
        # filters identically (see _PRUNE_MIN_DOMAIN).
        from userbehavioranalysis_spark.operators.similarity import (
            grouped_probe_predicate,
        )

        probes = {
            (r["band"], r["band_shard"])
            for r in bands_n.select("band", "band_shard").distinct().collect()
        }
        idx = idx.where(grouped_probe_predicate(probes, "band", "band_shard"))
    cand = (
        idx.join(bands_n, ["band", "band_val", "band_shard"])
        .select("new_vec_id", "corpus_vec_id")
        .distinct()
    )
    vecs = spark.read.schema("vec_id long, embedding array<double>").parquet(
        f"{index_path}/vectors"
    )
    vn = new_emb.select(
        F.col("vec_id").alias("new_vec_id"),
        F.col("embedding").cast("array<double>").alias("va"),
        F.expr(_EMB_NRM).alias("na"),
    )
    vc = vecs.select(
        F.col("vec_id").alias("corpus_vec_id"),
        F.col("embedding").alias("vb"),
        F.expr(_EMB_NRM).alias("nb"),
    )
    return (
        cand.join(vn, on="new_vec_id")
        .join(vc, on="corpus_vec_id")
        .filter(F.expr(_EMB_DOT) >= F.col("na") * F.col("nb") * F.lit(min_cosine))
        .select("new_vec_id", "corpus_vec_id")
    )
