"""Similarity search over embedding columns (build-brief extension).

Three paths with identical output shape and a shared cosine kernel:

- ``ann_topk_brute``   exact top-k by cosine — the correctness baseline
  and the oracle-checkable form.  A broadcast of the (small) query set
  against the full corpus: one pass, no corpus shuffle.
- ``ann_topk_ivf``     the scale path: IVF-style inverted-file search.
  Centroids come from the corpus itself (mean vector per coarse
  cluster); each query probes only the ``n_probe`` nearest clusters,
  so the per-query candidate set shrinks by ~|clusters|/n_probe.  At
  100 TB the corpus is bucketed by cluster id on disk, making a probe a
  partition-pruned scan instead of a full pass.
- ``ann_topk_lsh``     the second scale path: random-hyperplane LSH.
  Unlike IVF it needs no training pass, and unlike most LSH builds it
  is **exactly reproducible across engines**: embeddings are quantized
  to integers (round(x·1e6), in the JVM) and hyperplanes are an
  md5-derived integer matrix, so every signature bit is exact 64-bit
  integer arithmetic — order-independent even under wraparound — and
  a DuckDB oracle hash-matches the full candidate set and ranking.
  Since r8 the plane products are one int64 numpy matmul per Arrow
  batch (``_band_vals_udf``) instead of an interpreted JVM fold;
  bit-equality with the fold is pinned in tests.

All float vector math is columnar (``aggregate``/``zip_with`` folds
over ``array<double>`` with deterministic fold order, so cosines
reproduce bit-for-bit across runs and engines) or an Arrow-batched
numpy kernel where the math is order-independent; no row-at-a-time
Python UDFs anywhere.

Ranking determinism: order by (rounded cosine DESC, vec_id ASC).  The
6-dp rounding makes near-equal cosines compare equal, pushing the
decision to the id tie-break — immune to last-ulp float divergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_DOT = (
    "aggregate(zip_with(qv, cv, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)"
)


def _cosine_udf():
    """Arrow-batched cosine(a, b) over two array<double> columns.

    One numpy einsum per Arrow batch — the vectorized kernel for the
    IVF paths, ~2 orders faster than the interpreted ``aggregate``/
    ``zip_with`` fold.  (``ann_topk_brute`` keeps the fold form: its
    sequential summation order is what the DuckDB oracle reproduces.)
    """

    @pandas_udf("double")
    def cos(a, b):
        import numpy as np
        import pandas as pd

        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma = np.vstack(a.to_numpy())
        mb = np.vstack(b.to_numpy())
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(num / den)

    return cos


def _normed(embeddings: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
    return embeddings.select(
        F.col("vec_id").alias(id_alias),
        F.col("embedding").cast("array<double>").alias(vec_alias),
        F.expr(
            "sqrt(aggregate(cast(embedding as array<double>), cast(0 as double),"
            " (acc, x) -> acc + x * x))"
        ).alias(f"{id_alias}_norm"),
    )


def ann_topk_brute(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: each query row against the whole corpus.

    ``queries`` is a (vec_id, embedding) DataFrame (typically a small
    filter of the corpus, or external probes).  It is broadcast, so the
    corpus side streams through one stage.  Returns (query_id,
    neighbor_id, cosine_r6, rank), self-matches excluded.
    """
    q = _normed(queries, "query_id", "qv")
    c = _normed(embeddings, "neighbor_id", "cv")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_r6",
            F.round(
                F.expr(_DOT) / (F.col("query_id_norm") * F.col("neighbor_id_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_r6"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_r6", F.col("rank").cast("int").alias("rank"))
    )


def _sum_by_cluster(cmat=None):
    """mapInPandas kernel: per-partition per-cluster (psum, cnt) rows.

    With ``cmat`` given it fuses nearest-centroid assignment (numpy
    argmax over the broadcast matrix) with the partial mean sums — one
    map-only stage per Lloyd round, NO shuffle and no dims-wide
    aggregate; the driver combines ≤ partitions × n_clusters tiny rows.
    With ``cmat=None`` the input already carries a ``cluster`` column.
    """
    import numpy as np
    import pandas as pd

    cn = None if cmat is None else cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    def fn(batches):
        sums: dict[int, list] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.vstack(pdf["qv"].to_numpy())
            if cn is not None:
                mn = m / np.linalg.norm(m, axis=1, keepdims=True)
                cl = np.argmax(mn @ cn.T, axis=1)
            else:
                cl = pdf["cluster"].to_numpy()
            for c in np.unique(cl):
                mask = cl == c
                acc = sums.setdefault(int(c), [np.zeros(m.shape[1]), 0])
                acc[0] += m[mask].sum(axis=0)
                acc[1] += int(mask.sum())
        yield pd.DataFrame(
            [
                {"cluster": c, "psum": acc[0].tolist(), "cnt": acc[1]}
                for c, acc in sorted(sums.items())
            ],
            columns=["cluster", "psum", "cnt"],
        )

    return fn


_PSUM_SCHEMA = "cluster int, psum array<double>, cnt long"


def _combine_means(rows) -> dict[int, "object"]:
    """Combine collected (cluster, psum, cnt) partials into mean vectors."""
    import numpy as np

    acc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["cluster"], r["cnt"])):
        a = acc.setdefault(r["cluster"], [np.zeros(len(r["psum"])), 0])
        a[0] += np.asarray(r["psum"])
        a[1] += r["cnt"]
    return {c: a[0] / a[1] for c, a in acc.items() if a[1] > 0}


def assign_ivf_clusters(
    embeddings: DataFrame, n_clusters: int = 10, iters: int = 2
) -> DataFrame:
    """Derive an IVF coarse quantization: k-means-lite cluster ids.

    Seeding is k-means++-style farthest-point over a hashed sample:
    ``orderBy(xxhash64(vec_id)).limit(20·k)`` (TakeOrdered — per-
    partition top-k merge, no full sort) gives a deterministic pseudo-
    random sample; greedy max-min cosine distance picks well-spread
    seeds instead of the degenerate lowest-vec_ids.  Then ``iters``
    Lloyd rounds, each ONE fused map-only pass (``_sum_by_cluster``):
    assignment argmax + per-cluster partial sums in the same Arrow
    batch — no shuffle, no dims-wide aggregate; the driver reduces
    ≤ partitions × k partial rows.  Centroids are **driver-held model
    state** (like MLlib's k-means).  Returns (vec_id, embedding,
    cluster).

    This is the "train once, persist" step of a production IVF index;
    at 100 TB you'd run it on a sample and bucket the corpus by the
    resulting cluster id so probes become partition-pruned scans.
    """
    import numpy as np

    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )

    # cached: the corpus is re-assigned once per Lloyd round plus the
    # final labeling — without the cache each pass re-scans + re-casts
    release_pooled()
    v = pooled_cache(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("qv")
        )
    )
    sample = v.orderBy(F.xxhash64("vec_id"), "vec_id").limit(
        max(20 * n_clusters, n_clusters + 1)
    ).collect()
    sm = np.vstack([r["qv"] for r in sample])
    smn = sm / np.linalg.norm(sm, axis=1, keepdims=True)
    # greedy farthest-point (deterministic k-means++ stand-in): start at
    # the lowest-hash sample point, repeatedly add the point maximizing
    # min cosine distance to the chosen set (ties → first index)
    chosen = [0]
    min_sim = smn @ smn[0]
    for _ in range(1, min(n_clusters, len(sample))):
        nxt = int(np.argmin(min_sim))
        chosen.append(nxt)
        min_sim = np.maximum(min_sim, smn @ smn[nxt])
    cmat = sm[chosen]
    for _ in range(iters):
        parts = v.mapInPandas(_sum_by_cluster(cmat), _PSUM_SCHEMA).collect()
        means = _combine_means(parts)
        cmat = cmat.copy()  # empty clusters keep their old centroid
        for c, mean in means.items():
            cmat[c] = mean
    return v.withColumn("cluster", _assign_udf(cmat)(F.col("qv"))).select(
        "vec_id", F.col("qv").cast("array<float>").alias("embedding"), "cluster"
    )


def _assign_udf(cmat):
    """Nearest-centroid (cosine) argmax as an Arrow-batched pandas UDF.

    Ties take the lowest cluster id (np.argmax returns the first max,
    matching an ORDER BY sim DESC, cluster ASC tie-break).
    """
    import numpy as np

    cn = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    @pandas_udf("int")
    def assign(qv):
        import pandas as pd

        if len(qv) == 0:
            return pd.Series([], dtype="int32")
        m = np.vstack(qv.to_numpy())
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        return pd.Series(np.argmax(mn @ cn.T, axis=1).astype("int32"))

    return assign


def _plane_matrix(n_planes: int, dim: int = 64) -> tuple[tuple[int, ...], ...]:
    """``n_planes × dim`` INDEPENDENT integer hyperplanes.

    Coefficient ``(p, d)`` is the top 8 hex digits of
    ``md5('pl#<p>#<d>')`` recentred to ``[−2³¹, 2³¹)`` — computed once
    in Python and inlined as a literal array on BOTH engines, so the
    signature stays integer-exact and cross-engine reproducible.

    Why not a formula inside the SQL expression: the original
    ``plane(p,d) = ((p·64+d)·K) mod 2³²`` Knuth sweep makes consecutive
    planes differ by the CONSTANT step ``64K`` — the planes are a
    lattice, not independent draws, and the signature bit sequence
    ``sign(A + p·B + wrap-noise)`` has low entropy.  Measured effect:
    band values concentrated on a handful of alternating-bit patterns
    (0xAB55 et al.), and on the 100×-replica corpus the (band,
    band_val) buckets grew 72× instead of staying corpus-fraction-flat
    — 435 M candidate pairs instead of ~5 M, filling the disk.
    Independent md5 draws fix the entropy at the source.
    """
    import hashlib

    return tuple(
        tuple(
            int(hashlib.md5(f"pl#{p}#{d}".encode()).hexdigest()[:8], 16) - (1 << 31)
            for d in range(dim)
        )
        for p in range(n_planes)
    )


def _band_vals_udf(n_planes: int, band_bits: int, dim: int = 64):
    """Arrow-batched band-value kernel: quantized vector → array of
    per-band LSH values, as ONE int64 numpy matmul per batch.

    Replaces the interpreted JVM higher-order fold of the same math
    (``aggregate(zip_with(qi, pl, ...))`` over the literal plane
    matrix), which costs ~40 ms/vector at 128 planes — measured 2.4 s
    wall for the 2,000-vector sf0.1 corpus on 32 cores vs <0.01 s for
    the matmul (guide §4.2: hand whole batches to vectorized native
    code).  BIT-IDENTICAL to the fold by construction, not by luck:

    - quantization stays in the JVM (same ``round``/``cast`` exprs),
      so the UDF only ever sees exact int64 inputs;
    - every product/sum is int64 modular arithmetic — associative and
      commutative even under wraparound — so numpy's summation order
      cannot diverge from the fold's sequential order;
    - sign test (``> 0``) and bit packing are integer-exact on both
      paths.  (tests/test_dedup_similarity.py pins fold ≡ matmul
      equality over every sf0.1 vector.)

    Null/shape handling mirrors the fold exactly: rows shorter than
    ``dim`` pad with 0 (null×plane → coalesce 0 in the fold), longer
    rows ignore the excess (plane side is null → 0), and a NULL
    quantized array behaves as the all-zero vector — in the fold a
    null ``qi`` nulls every signature bit and ``if(null, w, 0)``
    packs each band to 0, i.e. n_bands rows of band_val 0, NOT a
    dropped row.
    """
    import numpy as np

    # the packed band value is returned as int32: 1<<j weights with
    # band_bits >= 31 would wrap silently instead of erroring (current
    # callers use 16 and 4 — this guards misconfiguration, not use)
    assert band_bits <= 30, f"band_bits={band_bits} overflows int32 band values"
    planes_t = np.asarray(_plane_matrix(n_planes, dim), dtype=np.int64).T
    n_bands = n_planes // band_bits
    weights = (np.int64(1) << np.arange(band_bits, dtype=np.int64)).astype(np.int64)

    @pandas_udf("array<int>")
    def band_vals(qi):
        import pandas as pd

        if len(qi) == 0:
            return pd.Series([], dtype="object")
        null_mask = qi.isna().to_numpy()
        rows = qi.to_numpy()
        mat = np.zeros((len(rows), dim), dtype=np.int64)
        for i, r in enumerate(rows):
            if null_mask[i]:
                continue  # null qi ≡ zero vector (see docstring)
            v = np.asarray(r, dtype=np.int64)[:dim]
            mat[i, : len(v)] = v
        bits = (mat @ planes_t) > 0  # (n, n_planes) bool
        vals = (
            bits.reshape(len(rows), n_bands, band_bits).astype(np.int64) @ weights
        ).astype("int32")
        return pd.Series([v.tolist() for v in vals], dtype="object")

    return band_vals


def _planes_duck_values(n_planes: int, dim: int = 64) -> str:
    """DuckDB ``VALUES`` rows ``(p, pl)`` for the plane matrix.

    A CTE table, not an inline literal: indexing a literal
    list-of-lists inside a lambda makes DuckDB rebuild the whole
    8192-element value per evaluation (measured: the sf0.01 oracle went
    from instant to >10 min); a VALUES scan materializes each row
    once and the cross join reuses it.
    """
    return ", ".join(
        f"({p}, [" + ", ".join(str(c) for c in row) + "])"
        for p, row in enumerate(_plane_matrix(n_planes, dim))
    )


def _lsh_bands(df: DataFrame, id_col: str, n_planes: int, band_bits: int) -> DataFrame:
    """(id, band, band_val) rows — one per LSH band of each vector.

    Signature bit ``p`` is ``sign(Σ_d qint[d] · plane(p,d))`` where
    ``qint[d] = round(embedding[d]·1e6)`` and ``plane`` comes from the
    md5-derived literal matrix of :func:`_plane_matrix` (see there for
    why the planes must be independent draws, not a formula sweep).
    All integer math (max |term| ≈ 2·10¹⁵, ×64 dims ≈ 10¹⁷ ≪ 2⁶³),
    evaluated as one int64 numpy matmul per Arrow batch
    (:func:`_band_vals_udf`): exact, order-independent (int64 modular
    arithmetic is associative), and reproducible verbatim by the
    DuckDB oracle's fold form.  Bits are grouped ``band_bits`` per
    band; two vectors are candidates iff some band value collides.
    """
    # No rebalance before signing: the interpreted fold this kernel
    # replaced was ~4 ms/vector, which justified a round-robin
    # repartition so a one-row-group local scan didn't serialize the
    # fold; the matmul kernel signs ~μs/vector, so that repartition
    # was a full shuffle of the vector payload (guide §2.4: remove
    # shuffles outright) plus 32 Python-worker launches for work one
    # task finishes in milliseconds (measured 0.6-4.0 s → 0.4 s at
    # sf0.1).  At scale the scan's natural row-group parallelism
    # spreads the signing without moving a byte.
    # quantize ONCE per vector IN THE JVM (identical round/cast exprs
    # to the original fold form — the Arrow kernel only ever sees
    # exact int64s), then compute all band values in one int64 numpy
    # matmul per Arrow batch (_band_vals_udf; was an interpreted
    # aggregate/zip_with fold over the literal plane matrix at
    # ~40 ms/vector for 128 planes — guide §4.2).  The coalesce
    # reproduces the fold's null→0 padding at the element level.
    qint = (
        "transform(embedding, x ->"
        " coalesce(cast(round(x * 1000000) as bigint), cast(0 as bigint)))"
    )
    # posexplode_OUTER + null filter, not posexplode: otherwise
    # InferFiltersFromGenerate clones the signature kernel into an
    # interpreted scan DataFilter (see functions/arrays.exploded)
    return (
        df.withColumn("qi", F.expr(qint))
        .select(
            F.col("vec_id").alias(id_col),
            F.posexplode_outer(
                _band_vals_udf(n_planes, band_bits)(F.col("qi"))
            ).alias("band", "band_val"),
        )
        .filter(F.col("band").isNotNull())
    )


def grouped_probe_predicate(probes, group_col: str, value_col: str):
    """Partition-probe predicate over observed (group, value) pairs as
    ONE flat ``(group == g AND value IN (...))`` disjunct per group —
    the single source of the shape every indexed probe must use.

    NOT one OR term per pair: a big probe set can observe the full
    group × value domain (512 pairs for the embedding index's 8×64),
    and a domain-deep chained OR overflows the JVM stack during Column
    conversion — measured at sf0.1's 312-vector delta, invisible at
    the sf0.001/sf0.01 gates.  The grouped form bounds expression
    depth by the group count, and partition pruning consumes IN
    natively.  An empty probe set returns ``lit(False)`` (no probes →
    empty result, keeping the plan valid).
    """
    by_group: dict[object, list[object]] = {}
    for g, v in sorted(probes):
        by_group.setdefault(g, []).append(v)
    pred = F.lit(False)
    for g, vals in sorted(by_group.items()):
        pred = pred | ((F.col(group_col) == g) & F.col(value_col).isin(vals))
    return pred


def ann_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    band_bits: int = 4,
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share ≥1 band bucket.

    Banded random-hyperplane LSH (the signature/banding scheme of
    MinHash-LSH applied to cosine space): corpus and queries get
    ``n_planes``-bit hyperplane signatures, split into bands of
    ``band_bits`` bits; a corpus vector is a candidate for a query iff
    some band value matches (equi-join on ``(band, band_val)`` — never
    all-pairs).  Exact cosine + rank runs within candidates only, same
    output shape as ``ann_topk_brute``; recall < 1 by construction but
    the *candidate set itself is deterministic*, so a DuckDB oracle
    reproduces the result exactly (hash-checkable, unlike IVF).

    Scale: at 100 TB the corpus band table is written bucketed by
    ``(band, band_val)`` so a query probes ``n_bands`` buckets —
    partition-pruned scans, ~``n_bands/2^band_bits`` of the corpus.
    Raise ``band_bits`` (and planes) to shrink buckets; recall is
    recovered by more bands, the standard S-curve trade.  The query
    side is broadcast throughout; the corpus is touched by exactly two
    map-side stages (banding, rerank join).
    """
    q_bands = _lsh_bands(queries, "query_id", n_planes, band_bits)
    c_bands = _lsh_bands(embeddings, "neighbor_id", n_planes, band_bits)
    cand = (
        c_bands.join(F.broadcast(q_bands), on=["band", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = _normed(queries, "query_id", "qv")
    c = _normed(embeddings, "neighbor_id", "cv")
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn(
            "cosine_r6",
            F.round(
                F.expr(_DOT) / (F.col("query_id_norm") * F.col("neighbor_id_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_r6", F.col("rank").cast("int").alias("rank")
        )
    )


def ann_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cluster_col: str = "label",
    n_probe: int = 3,
) -> DataFrame:
    """IVF approximate top-k: probe only the nearest coarse clusters.

    Centroids are the per-``cluster_col`` mean vectors (the testdata
    embeds a cluster id as ``label``; a production pipeline would run
    k-means once and persist centroids).  For each query the
    ``n_probe`` closest centroids select the candidate buckets; exact
    cosine + rank runs within candidates only.  Same output shape as
    ``ann_topk_brute``; recall < 1 by construction — tested against the
    brute-force baseline, not an SQL oracle.
    """
    # per-cluster means via the same fused partial-sum map pass as
    # training (no dims-wide F.avg aggregate, no shuffle); the centroid
    # table is n_clusters rows built driver-side and broadcast back
    centroids = _cluster_centroids(embeddings, cluster_col)
    cos = _cosine_udf()
    q = _normed(queries, "query_id", "qv")
    qc = (
        q.join(F.broadcast(centroids))
        .withColumn("cdist", F.round(cos(F.col("qv"), F.col("cv")), 6))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cdist"), F.asc("cluster"))
            ),
        )
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qv", "query_id_norm", "cluster")
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col(cluster_col).alias("cluster"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(qc), on="cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_r6", F.round(cos(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine_r6", F.col("rank").cast("int").alias("rank"))
    )


def _cluster_centroids(clustered: DataFrame, cluster_col: str) -> DataFrame:
    """Per-cluster mean vectors as an n_clusters-row (cluster, cv)
    frame — ONE fused partial-sum map pass (no dims-wide aggregate, no
    shuffle), driver-combined.  The single source for IVF routing
    tables: ann_topk_ivf's in-memory centroids and ivf_index_write's
    persisted ones come from here, so they cannot diverge."""
    parts = (
        clustered.select(
            F.col(cluster_col).cast("int").alias("cluster"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
        .mapInPandas(_sum_by_cluster(), _PSUM_SCHEMA)
        .collect()
    )
    means = _combine_means(parts)
    return clustered.sparkSession.createDataFrame(
        [(int(c), [float(x) for x in mean]) for c, mean in sorted(means.items())],
        "cluster int, cv array<double>",
    )


def ivf_index_write(
    clustered: DataFrame,
    path: str,
    cluster_col: str = "cluster",
    centroids: DataFrame | None = None,
) -> None:
    """Materialize an IVF corpus as a cluster-partitioned parquet INDEX
    plus its centroid table — the "train once, bucket the corpus by
    cluster id" persistence the IVF docstrings promise.

    ``{path}/vectors`` is Hive-partitioned by ``cluster`` (one
    directory per coarse cell — the FAISS inverted-list layout in
    parquet terms; ``repartition`` first keeps one file per cell);
    ``{path}/centroids`` is the n_clusters-row routing table (the same
    fused partial-sum means :func:`ann_topk_ivf` computes in memory —
    one shared helper, so the persisted routing table can never
    diverge from the in-memory path the tests compare against).
    A probe then reads ONLY its ``n_probe`` routed directories — scan
    cost tracks probed cells, not corpus size.

    ``centroids`` (a (cluster, cv) frame) overrides the derived means
    — the production split where TRAINING owns the routing table and
    indexing just stores it: several partial index builds (or an
    append stream, :func:`ivf_index_append`) can then share one
    routing table instead of each deriving a different one from its
    own slice.
    """
    cent = (
        centroids
        if centroids is not None
        else _cluster_centroids(clustered, cluster_col)
    )
    cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    (
        clustered.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding"),
            F.col(cluster_col).cast("int").alias("cluster"),
        )
        .repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/vectors")
    )
    # TRAINING-TIME per-cell histogram, pinned in the index manifest:
    # the drift monitor (:func:`ivf_cell_drift`) compares live cell
    # counts against this to tell when add-after-train appends have
    # skewed the distribution enough to warrant a retrain.  A collect
    # bounded by the cluster DOMAIN (k rows), never by data.
    from userbehavioranalysis_spark.operators.manifests import (
        write_index_manifest,
    )

    hist = {
        str(r["cluster"]): int(r["n"])
        for r in clustered.groupBy(F.col(cluster_col).cast("int").alias("cluster"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    write_index_manifest(path, {"trained_counts": hist})


def ivf_assign_to_centroids(
    vectors: DataFrame, centroids: DataFrame
) -> DataFrame:
    """Assign raw (vec_id, embedding) vectors to a STORED routing
    table: nearest-centroid cosine argmax against the (cluster, cv)
    frame, ties to the lowest cluster id — the single assignment
    kernel :func:`ivf_index_append` and its one-shot equality tests
    share, so "what cluster does a new vector land in" has exactly one
    answer per routing table.  Returns (vec_id, embedding, cluster)
    shaped like :func:`assign_ivf_clusters`'s output.
    """
    import numpy as np

    rows = sorted(centroids.collect(), key=lambda r: r["cluster"])
    cmat = np.vstack([r["cv"] for r in rows])
    ids = [int(r["cluster"]) for r in rows]
    v = vectors.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("qv")
    )
    out = v.withColumn("idx", _assign_udf(cmat)(F.col("qv")))
    # _assign_udf returns the row INDEX into cmat; map it back to the
    # stored cluster id (identical when ids are dense 0..k-1, but a
    # routing table may omit empty clusters)
    id_arr = F.array(*[F.lit(c) for c in ids])
    return out.select(
        "vec_id",
        F.col("qv").cast("array<float>").alias("embedding"),
        F.element_at(id_arr, F.col("idx") + 1).alias("cluster"),
    )


def ivf_index_append(
    new_vectors: DataFrame,
    index_path: str,
) -> None:
    """Index MAINTENANCE: route a new vector batch against the STORED
    centroid table and append it into the cluster partitions — the
    leg that lets the IVF store grow daily without retraining or
    rewriting (mirror of dedup.minhash_index_append for the vector
    index; at 100 TB each append is a metadata-only commit into the
    touched cluster directories).

    The routing table is NOT updated: appended vectors are assigned to
    the centroids as trained, which is exactly FAISS's add-after-train
    semantics.  The documented drift trade: as appended data shifts
    the true distribution, cells elongate and recall at fixed n_probe
    decays — the maintenance answer is periodic RETRAIN + rewrite
    (``mlcodebooks.ivf_clusters_distributed`` over the union corpus,
    then :func:`ivf_index_write`), the IVF analog of the minhash
    index's re-cap compaction.  The monitor is first-class:
    :func:`ivf_cell_drift` compares live per-cell counts against the
    training-time histogram the manifest pins; retrain when it flags.
    """
    spark = new_vectors.sparkSession
    cent = spark.read.parquet(f"{index_path}/centroids")
    assigned = ivf_assign_to_centroids(new_vectors, cent)
    (
        assigned.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.col("cluster").cast("int").alias("cluster"),
        )
        .repartition("cluster")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(f"{index_path}/vectors")
    )


def ivf_cell_drift(
    spark,
    index_path: str,
    skew_threshold: float = 2.0,
) -> DataFrame:
    """IVF DRIFT MONITOR — the first-class form of the retrain guidance
    on :func:`ivf_index_append`: add-after-train appends route against
    frozen centroids, so as the data distribution shifts, cells
    elongate and recall at fixed n_probe decays.  The observable
    symptom is per-cell population skew vs the training distribution.

    Compares the live per-cell counts of ``{path}/vectors`` (a
    partition-column-only aggregate — the scan reads directory names
    and row-group metadata, not vectors) against the TRAINING-TIME
    histogram :func:`ivf_index_write` pinned in the index manifest.

    Returns one row per cell the index has ever seen (trained ∪ live):
    (cluster, trained_n, current_n, skew, drifted) where ``skew`` is
    the cell's live population share over its trained share (1.0 = the
    cell grew exactly in proportion; balanced appends keep every cell
    near 1) and ``drifted`` flags ``skew >= skew_threshold`` — or a
    cell the training never saw (trained_n = 0, infinite-skew case,
    possible when appends use a routing table written with
    ``centroids=`` covering cells the indexed slice never populated).
    When any cell flags, the maintenance answer is retrain + rewrite
    (``mlcodebooks.ivf_clusters_distributed`` over the union corpus,
    then :func:`ivf_index_write`) — the IVF analog of the minhash
    index's re-cap compaction.

    Refuses (KeyError with guidance) on a pre-round-8 index whose
    manifest lacks ``trained_counts`` — rewrite the index to get the
    histogram; guessing a baseline would make drift unfalsifiable.
    """
    from userbehavioranalysis_spark.operators.manifests import index_manifest

    m = index_manifest(index_path)
    if "trained_counts" not in m:
        raise KeyError(
            f"index at {index_path!r} has no trained_counts histogram "
            "(written before the drift monitor existed); rewrite it with "
            "ivf_index_write to establish the training baseline"
        )
    trained = {int(c): int(n) for c, n in m["trained_counts"].items()}
    trained_total = sum(trained.values())
    t = spark.createDataFrame(
        sorted(trained.items()), "cluster int, trained_n long"
    )
    live = (
        spark.read.parquet(f"{index_path}/vectors")
        .groupBy(F.col("cluster").cast("int").alias("cluster"))
        .agg(F.count("*").alias("current_n"))
    )
    total_w = Window.partitionBy()
    return (
        t.join(live, "cluster", "full_outer")
        .select(
            "cluster",
            F.coalesce("trained_n", F.lit(0)).alias("trained_n"),
            F.coalesce("current_n", F.lit(0)).alias("current_n"),
        )
        .withColumn(
            "skew",
            F.round(
                (F.col("current_n") / F.sum("current_n").over(total_w))
                / (F.col("trained_n") / F.lit(trained_total)),
                6,
            ),
        )
        .withColumn(
            "drifted",
            F.col("skew").isNull() | (F.col("skew") >= F.lit(skew_threshold)),
        )
        .orderBy("cluster")
    )


def ann_topk_ivf_indexed(
    queries: DataFrame,
    index_path: str,
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """:func:`ann_topk_ivf` probing the PERSISTED cluster-partitioned
    index with partition pruning: queries route against the stored
    centroid table, the routed cluster ids (a collect bounded by
    |queries| × n_probe and by the cluster domain) become a partition
    predicate, and the vector scan lists/reads ONLY the probed cluster
    directories (PartitionFilters in the plan, asserted in tests).
    Scoring and ranking are identical to ``ann_topk_ivf`` on the same
    clustered corpus — equality-tested, structural-contract oracle.
    """
    spark = queries.sparkSession
    centroids = spark.read.parquet(f"{index_path}/centroids")
    cos = _cosine_udf()
    q = _normed(queries, "query_id", "qv")
    qc = (
        q.join(F.broadcast(centroids))
        .withColumn("cdist", F.round(cos(F.col("qv"), F.col("cv")), 6))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cdist"), F.asc("cluster"))
            ),
        )
        .filter(F.col("crank") <= n_probe)
        .select("query_id", "qv", "query_id_norm", "cluster")
    )
    # cached: the routing subplan (Python cosine UDF over queries ×
    # centroids + rank window) feeds both the probed-cluster collect
    # and the scored join — uncached it would run twice per probe.
    # Single-slot probe pool, same discipline as the minhash probe.
    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )

    release_pooled("probe")
    qc = pooled_cache(qc, pool="probe")
    probed = sorted({r["cluster"] for r in qc.select("cluster").distinct().collect()})
    vecs = spark.read.parquet(f"{index_path}/vectors")
    # flat IN-list, not a chained OR: a wide query set can route to
    # every cluster, and per-value OR chains overflow the JVM stack at
    # domain size (see dedup's probe predicates — same fix everywhere)
    pred = F.col("cluster").isin(probed) if probed else F.lit(False)
    c = vecs.where(pred).select(
        F.col("vec_id").alias("neighbor_id"),
        "cluster",
        F.col("embedding").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(qc), on="cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_r6", F.round(cos(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_r6", F.col("rank").cast("int").alias("rank")
        )
    )


def ann_index_write(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 16,
    band_bits: int = 4,
) -> None:
    """Materialize the banded corpus as a Hive-partitioned ANN INDEX:
    one partition per (band, band_val).

    This is the persisted form of ``ann_topk_lsh``'s candidate
    generator — the structure every 100 TB vector store needs so a
    probe touches ~``n_bands/2^band_bits`` of the corpus instead of
    scanning it.  ``repartition`` before ``partitionBy`` keeps it to
    one file per bucket (writers.py discipline).  The index is
    ×``n_bands`` the corpus (each vector appears once per band) — the
    standard LSH space/recall trade, stated not hidden.

    A ``_manifest.json`` records the signing parameters (the shared
    operators/manifests.py discipline): probe and append derive theirs
    FROM it, and an explicitly passed conflicting value raises — a
    probe banding with different planes than the index would silently
    lose candidates otherwise.
    """
    from userbehavioranalysis_spark.operators.manifests import (
        write_index_manifest,
    )

    bands = _lsh_bands(embeddings, "vec_id", n_planes, band_bits)
    (
        bands.join(embeddings.select("vec_id"), on="vec_id")
        .repartition("band", "band_val")
        .write.mode("overwrite")
        .partitionBy("band", "band_val")
        .parquet(path)
    )
    write_index_manifest(path, {"n_planes": n_planes, "band_bits": band_bits})


def ann_index_append(
    embeddings_new: DataFrame,
    path: str,
    n_planes: int | None = None,
    band_bits: int | None = None,
) -> None:
    """Index MAINTENANCE: band a new vector batch with the INDEX's
    signing parameters and append its rows into the same
    (band, band_val) partition layout — the add leg that completes the
    LSH-ANN store's write/probe/append lifecycle (metadata-only commit
    per touched bucket directory at 100 TB, never a rewrite; probes
    see the union because partition pruning selects directories, not
    files).  Unlike the IVF store there is no training to drift from:
    the hyperplanes are a fixed literal matrix, so appends never
    degrade routing — the only deferred maintenance is small-file
    accumulation (compact by rewriting, cf. minhash_index_compact).

    Signing parameters come from the index's ``_manifest.json``; an
    explicitly passed conflicting value raises.
    """
    from userbehavioranalysis_spark.operators.manifests import (
        resolve_signing_params,
    )

    p = resolve_signing_params(
        path,
        {"n_planes": 16, "band_bits": 4},
        {"n_planes": n_planes, "band_bits": band_bits},
    )
    bands = _lsh_bands(embeddings_new, "vec_id", p["n_planes"], p["band_bits"])
    (
        bands.join(embeddings_new.select("vec_id"), on="vec_id")
        .repartition("band", "band_val")
        .write.mode("append")
        .partitionBy("band", "band_val")
        .parquet(path)
    )


def ann_topk_lsh_indexed(
    embeddings: DataFrame,
    queries: DataFrame,
    index_path: str,
    k: int = 10,
    n_planes: int | None = None,
    band_bits: int | None = None,
) -> DataFrame:
    """``ann_topk_lsh`` probing the PERSISTED index with partition
    pruning: the query vectors' band values (≤ n_bands·2^band_bits
    distinct pairs — a bounded, domain-sized collect) become grouped
    per-band IN-list partition predicates, so the scan lists and reads
    ONLY the probed (band, band_val) directories (PartitionFilters in
    the plan, asserted in tests).  Candidates, rerank and output are
    IDENTICAL to ``ann_topk_lsh`` — same oracle, hash-checkable.

    Signing parameters come from the index's ``_manifest.json`` when
    present; an explicitly passed conflicting value raises (the shared
    operators/manifests.py discipline).  ``k`` stays caller-side — a
    query-time threshold, not a signing parameter.
    """
    from pyspark.sql import SparkSession as _S

    from userbehavioranalysis_spark.operators.manifests import (
        resolve_signing_params,
    )

    p = resolve_signing_params(
        index_path,
        {"n_planes": 16, "band_bits": 4},
        {"n_planes": n_planes, "band_bits": band_bits},
    )
    n_planes, band_bits = p["n_planes"], p["band_bits"]
    spark = _S.getActiveSession()
    q_bands = _lsh_bands(queries, "query_id", n_planes, band_bits)
    probes = {
        (r["band"], r["band_val"])
        for r in q_bands.select("band", "band_val").distinct().collect()
    }
    idx = spark.read.parquet(index_path)
    # grouped per-band IN-lists (shared shape, see
    # grouped_probe_predicate above)
    pred = grouped_probe_predicate(probes, "band", "band_val")
    cand = (
        idx.where(pred)
        .join(F.broadcast(q_bands), on=["band", "band_val"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = _normed(queries, "query_id", "qv")
    c = _normed(embeddings, "neighbor_id", "cv")
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn(
            "cosine_r6",
            F.round(
                F.expr(_DOT) / (F.col("query_id_norm") * F.col("neighbor_id_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_r6", F.col("rank").cast("int").alias("rank")
        )
    )


def ann_topk_lsh_multiprobe(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 16,
    band_bits: int = 4,
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its exact band buckets
    PLUS every 1-bit-flip neighbor bucket.

    The standard recall-vs-index trade (Lv et al., VLDB'07): a near
    neighbor that misses a query's bucket most often missed by ONE
    hyperplane voting the other way, so probing the ``band_bits``
    single-bit perturbations per band recovers most of it — recall of
    roughly doubling the band count at the same index size and the
    same corpus-side layout (only the broadcast QUERY side fans out
    ``band_bits+1``×, the corpus bands/partitioning are untouched —
    at 100 TB this is ``n_bands·(band_bits+1)`` partition-pruned
    probes per query instead of ``n_bands``).  The probe set is
    deterministic (exact band values + exact bit flips), so unlike
    distance-ordered probing sequences the whole result remains
    hash-checkable cross-engine.
    """
    q_bands = _lsh_bands(queries, "query_id", n_planes, band_bits)
    # expand each query band into itself + its band_bits 1-bit flips;
    # j=0 keeps the exact value, j>=1 flips bit j-1
    flips = ", ".join(
        f"cast(band_val as int) ^ {1 << (j - 1)}" if j else "cast(band_val as int)"
        for j in range(band_bits + 1)
    )
    q_probes = (
        q_bands.select(
            "query_id",
            "band",
            F.explode(F.expr(f"array({flips})")).alias("band_val"),
        )
        .distinct()
    )
    c_bands = _lsh_bands(embeddings, "neighbor_id", n_planes, band_bits)
    cand = (
        c_bands.join(F.broadcast(q_probes), on=["band", "band_val"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = _normed(queries, "query_id", "qv")
    c = _normed(embeddings, "neighbor_id", "cv")
    scored = (
        cand.join(F.broadcast(q), on="query_id")
        .join(c, on="neighbor_id")
        .withColumn(
            "cosine_r6",
            F.round(
                F.expr(_DOT) / (F.col("query_id_norm") * F.col("neighbor_id_norm")), 6
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_r6"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_r6", F.col("rank").cast("int").alias("rank")
        )
    )


def ivf_maintain(
    spark,
    index_path: str,
    skew_threshold: float = 2.0,
    n_clusters: int | None = None,
    max_iter: int = 4,
) -> dict:
    """The IVF maintenance DECISION composed end-to-end: check
    :func:`ivf_cell_drift` against the index's pinned training
    histogram, and when any cell flags, RETRAIN over the union corpus
    (``mlcodebooks.ivf_clusters_distributed`` — distributed k-means‖)
    and rewrite the index via :func:`ivf_index_write` — the evidence-
    triggered version of FAISS's "retrain when the distribution
    shifts" folklore, and the IVF analog of the dedup indexes' re-cap
    compaction.

    Returns an audit dict: ``{"checked": k, "flagged": [cells...],
    "retrained": bool, "trained_n": n}``.  No-drift calls cost one
    partition-column-only aggregate plus a k-row manifest read —
    cheap enough to run after every append batch.  The rewrite stages
    into a sibling temp dir and swaps via the aside-preserving
    :func:`dedup_index._swap_dir`, so a crash mid-maintenance leaves a
    complete readable index.  ``n_clusters`` defaults to the current
    cell count (retrain keeps the routing granularity unless told
    otherwise).
    """
    import os
    import shutil

    from userbehavioranalysis_spark.operators.dedup_index import _swap_dir
    from userbehavioranalysis_spark.operators.mlcodebooks import (
        ivf_clusters_distributed,
    )

    drift = ivf_cell_drift(spark, index_path, skew_threshold).collect()
    flagged = [int(r["cluster"]) for r in drift if r["drifted"]]
    if not flagged:
        return {
            "checked": len(drift),
            "flagged": [],
            "retrained": False,
            "trained_n": sum(int(r["trained_n"]) for r in drift),
        }
    vectors = spark.read.parquet(f"{index_path}/vectors").select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    k = n_clusters if n_clusters is not None else len(drift)
    clustered = ivf_clusters_distributed(vectors, n_clusters=k, max_iter=max_iter)
    tmp = f"{index_path}_retrain_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ivf_index_write(clustered, tmp)
    _swap_dir(tmp, index_path)
    n = sum(
        int(r["n"])
        for r in spark.read.parquet(f"{index_path}/vectors")
        .groupBy("cluster")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert not os.path.exists(tmp)
    return {
        "checked": len(drift),
        "flagged": flagged,
        "retrained": True,
        "trained_n": n,
    }
