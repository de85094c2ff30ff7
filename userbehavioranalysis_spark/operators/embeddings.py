"""Embedding-column compression operators (training-data extension).

At 100 TB an `array<float>` embedding column is routinely the widest
thing in the table: 64-768 float32 lanes per row dominate both shuffle
bytes and ANN scan cost.  Standard practice before similarity search at
scale is symmetric int8 quantization — 4× smaller than float32, ~8×
smaller than the float64 Spark would otherwise shuffle, with recall loss
well under a point for cosine/IP search (the FAISS/ScaNN default).

Both operators here are pure JVM-side higher-order-function expressions
(`transform` / `aggregate` / `array_max`): no Python, no UDF, fully
codegen'd, so they pipeline into whatever scan or join feeds them
without a stage break.  Determinism note: every arithmetic step is
IEEE-double identical on any engine and any partitioning (per-row only,
no cross-row float accumulation), which is what lets the quantized
arrays hash-match a DuckDB oracle bit-for-bit.

Rounding uses ``floor(x + 0.5)`` rather than a round() builtin because
round-half-even vs round-half-away differs between engines; floor
arithmetic is unambiguous IEEE everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DVEC = "cast({c} as array<double>)"


def l2_normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str | None = None
) -> DataFrame:
    """Unit-norm the embedding column (zero vectors pass through as-is).

    The norm is a per-row ``aggregate`` over the array — left-to-right
    accumulation in array order, so the result is identical regardless
    of partitioning (there is no cross-row reduction to reorder).
    """
    out = out_col or vec_col
    dv = _DVEC.format(c=vec_col)
    norm = f"sqrt(aggregate({dv}, cast(0 as double), (acc, x) -> acc + x * x))"
    return df.withColumn(
        out,
        F.expr(
            f"CASE WHEN {norm} = 0.0 THEN {dv} "
            f"ELSE transform({dv}, x -> x / {norm}) END"
        ),
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: ``scale = 127/max|x|``,
    ``q_i = floor(x_i * scale + 0.5)`` as tinyint, plus the scale column
    needed to dequantize (``x ≈ q / scale``).

    Per-vector (not global) scaling is the robust choice for a corpus
    whose norm distribution drifts across sources/shards: no global
    max-abs pass over 100 TB, no clipping outliers, and each vector's
    quantization error is bounded by ``0.5/scale`` of ITS OWN range.
    ``q`` carries 1 byte/lane through every downstream shuffle where the
    raw column carried 4-8.
    """
    dv = _DVEC.format(c=vec_col)
    maxabs = f"array_max(transform({dv}, x -> abs(x)))"
    df = df.withColumn(
        f"{prefix}_scale",
        F.expr(f"CASE WHEN {maxabs} = 0.0 THEN 0.0 ELSE 127.0 / {maxabs} END"),
    )
    return df.withColumn(
        f"{prefix}_vec",
        F.expr(
            f"transform({dv}, x -> cast(floor(x * {prefix}_scale + 0.5d) as tinyint))"
        ),
    )


def dequantize_int8(
    df: DataFrame, qvec_col: str = "q_vec", scale_col: str = "q_scale",
    out_col: str = "embedding_deq",
) -> DataFrame:
    """Inverse of :func:`quantize_int8` (lossy: error ≤ 0.5/scale per lane)."""
    return df.withColumn(
        out_col,
        F.expr(
            f"CASE WHEN {scale_col} = 0.0 THEN transform({qvec_col}, x -> 0.0d) "
            f"ELSE transform({qvec_col}, x -> cast(x as double) / {scale_col}) END"
        ),
    )


def ann_topk_quantized(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k over int8-QUANTIZED vectors — the
    compressed form of `similarity.ann_topk_brute`, demonstrating that
    the quantized column is directly searchable.

    The score is computed entirely from INTEGER dot products
    (``zip_with`` + ``aggregate`` over bigint, exact by construction):
    ``cos ≈ dot(qa,qb) / sqrt(dot(qa,qa) * dot(qb,qb))`` — the scales
    cancel in the cosine, so no float rescaling enters until the final
    division, which is IEEE-identical on any engine.  At scale the int8
    corpus moves 4× less memory bandwidth per scan than float32 and 8×
    less than the float64 Spark would shuffle; recall loss vs exact
    cosine is bounded by the per-lane quantization error (see the
    recall test).

    Plan: query side quantized and broadcast, corpus side quantized
    inline in the same codegen'd stage as the scan — one window rank
    on (query_id), no other shuffle.  Zero vectors (self-dot 0) are
    excluded from both sides to keep the division total.
    """
    idot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as bigint) * cast(y as bigint)),"
        " cast(0 as bigint), (acc, x) -> acc + x)"
    )
    def _qside(df: DataFrame, role: str) -> DataFrame:
        # zero-vector guard on the RAW column, before quantization: a
        # predicate on the computed self-dot would be pushdown-cloned
        # into the scan as an interpreted re-evaluation of the whole
        # quantize chain per row (same trap as InferFiltersFromGenerate,
        # via plain filter pushdown).  any-nonzero-element is exactly
        # self_dot > 0: the max-|x| lane always quantizes to ±127.
        nz = df.filter(
            F.expr(f"exists({_DVEC.format(c=vec_col)}, x -> x != 0.0d)")
        )
        out = quantize_int8(nz, vec_col=vec_col, prefix=f"_{role}")
        return out.select(
            F.col(id_col).alias(f"{role}_id"),
            F.col(f"_{role}_vec").alias(f"{role}v"),
            F.expr(idot.format(a=f"_{role}_vec", b=f"_{role}_vec")).alias(
                f"{role}_self"
            ),
        )

    # materialize the quantized corpus side: without the cache barrier
    # CollapseProject inlines the quantization transform INTO the
    # per-pair dot expression, re-quantizing every corpus vector once
    # per query (measured ~5x on the sf0.1 bench).  The broadcast
    # exchange already materializes the (tiny) query side.
    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )

    q = _qside(queries, "query")
    release_pooled()
    c = pooled_cache(_qside(embeddings, "neighbor"))
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(
            F.expr(idot.format(a="queryv", b="neighborv"))
            / F.sqrt(F.col("query_self").cast("double") * F.col("neighbor_self")),
            6,
        ).alias("qcosine_r6"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcosine_r6"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "qcosine_r6",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    sample_n: int = 512,
    iters: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Train product-quantization codebooks: ``m`` subspace k-means.

    PQ is the canonical memory-bound ANN representation (FAISS ``IVFPQ``
    / ScaNN): the vector splits into ``m`` subvectors, each quantized
    against its own ``n_codes``-entry codebook, so a 64-dim float32
    vector (256 B) becomes ``m`` byte codes (8 B at the defaults —
    32×).  Codebooks are trained DRIVER-SIDE on a bounded deterministic
    sample (``orderBy(xxhash64(id), id).limit(sample_n)`` — TakeOrdered,
    no full sort; PQ codebooks are trained on samples in production
    too) with farthest-point seeding and ``iters`` Lloyd rounds per
    subspace, ties broken by lowest index — bit-deterministic for a
    given corpus.  Returns a numpy ``(m, n_codes, dim/m)`` array of
    float64 centroids — driver-held model state, like the IVF
    centroids (similarity.assign_ivf_clusters).
    """
    import numpy as np

    rows = (
        embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(F.xxhash64(id_col), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    x = np.vstack([r[1] for r in rows])
    dim = x.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    sub = dim // m
    books = np.empty((m, n_codes, sub))
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        # farthest-point seeding from sample row 0 (deterministic)
        chosen = [0]
        d2 = ((xs - xs[0]) ** 2).sum(axis=1)
        for _ in range(1, min(n_codes, len(xs))):
            nxt = int(np.argmax(d2))
            chosen.append(nxt)
            d2 = np.minimum(d2, ((xs - xs[nxt]) ** 2).sum(axis=1))
        cb = xs[chosen].copy()
        if len(chosen) < n_codes:  # degenerate tiny sample: pad
            cb = np.vstack([cb] + [cb[-1:]] * (n_codes - len(chosen)))
        for _ in range(iters):
            d = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)  # ties -> lowest code
            for c in range(n_codes):
                mask = a == c
                if mask.any():
                    cb[c] = xs[mask].mean(axis=0)
        books[j] = cb
    return books


def pq_encode(
    embeddings: DataFrame,
    books,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode each vector as ``m`` nearest-codebook-entry codes.

    One Arrow-batched map pass (numpy argmin per subspace, ties →
    lowest code); output ``(vec_id, codes array<int>)`` is the 32×-
    compressed searchable column.  At 100 TB the codes column (8 B/row
    at the defaults) replaces the embedding in every ANN scan — memory
    bandwidth, not distance math, is what PQ buys back.
    """
    import pandas as pd

    m, n_codes, sub = books.shape

    def enc(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            codes = np.empty((len(pdf), m), dtype="int32")
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    src = embeddings.select(
        F.col(id_col).alias(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    return src.mapInPandas(enc, "vec_id long, codes array<int>")


def ann_topk_pq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 64,
    rerank_n: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    books=None,
) -> DataFrame:
    """PQ + ADC shortlist + exact rerank — the memory-bound ANN path.

    ``books`` injects pre-trained codebooks (an ``(m, n_codes, dim/m)``
    array, e.g. from mlcodebooks.pq_codebooks_distributed); ``None``
    trains the default sample-k-means codebooks here.

    Defaults (8 subspaces × 64 codes, rerank 100) measure 0.86
    recall@10 on the sf0.1 corpus, whose top-10 cosines crowd within a
    few hundredths — the hard case for any coarse quantizer; raise
    ``n_codes``/``rerank_n`` for recall, lower them for scan cost.

    Asymmetric distance computation: each (exact, uncompressed) query
    precomputes its ``m × n_codes`` table of subspace distances to the
    codebooks; a corpus vector's approximate distance is then ``m``
    table lookups summed over its codes — no per-pair float vector
    math at all.  The corpus pass touches only the 8 B/row code column
    (vs 256 B float32 / 512 B float64): PQ trades one cheap
    table-build per query for a ~32× lighter scan, which is the whole
    game at 100 TB.  The ADC top-``rerank_n`` shortlist is then
    exact-cosine reranked (the FAISS production shape — ADC alone
    reshuffles crowded neighborhoods, and this testdata's top-10
    cosines crowd within a few hundredths), touching raw vectors for
    only ``rerank_n·|queries|`` rows.  Output shape matches the other
    ANN operators: (query_id, neighbor_id, cosine_r6, rank).

    Determinism: codebooks/codes are deterministic given the corpus
    (see :func:`pq_codebooks`), ADC distances round to 6 dp with id
    tie-breaks, and the rerank is the exact integer-free cosine used
    corpus-wide — reproducible run-to-run, but the float k-means
    cannot be replayed in SQL, so the registry records a rows-only
    check + a recall-vs-brute test (the IVF precedent).
    """
    import pandas as pd

    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )
    from pyspark.sql import Window

    if books is None:
        books = pq_codebooks(
            embeddings, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col
        )
    assert books.shape[:2] == (m, n_codes), "books shape must match (m, n_codes)"
    release_pooled()
    codes = pooled_cache(pq_encode(embeddings, books, vec_col=vec_col, id_col=id_col))
    qrows = (
        queries.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(F.col(id_col))
        .collect()
    )
    import numpy as np

    qids = np.array([r[0] for r in qrows])
    qx = np.vstack([r[1] for r in qrows])
    sub = qx.shape[1] // m
    # ADC tables: (nq, m, n_codes)
    tables = np.stack(
        [
            ((qx[:, j * sub : (j + 1) * sub][:, None, :] - books[j][None, :, :]) ** 2).sum(
                axis=2
            )
            for j in range(m)
        ],
        axis=1,
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.vstack(pdf["codes"].to_numpy())  # (b, m)
            # sum_j tables[q, j, c[i, j]] -> (nq, b)
            d = np.zeros((len(qids), len(pdf)))
            for j in range(m):
                d += tables[:, j, :][:, c[:, j]]
            nid = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, len(pdf)),
                    "neighbor_id": np.tile(nid, len(qids)),
                    "adc_r6": np.round(d.ravel(), 6),
                }
            )

    scored = codes.mapInPandas(
        score, "query_id long, neighbor_id long, adc_r6 double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_r6"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= rerank_n)
        .select("query_id", "neighbor_id")
    )
    # exact rerank of the shortlist only: rerank_n·|queries| raw rows
    from userbehavioranalysis_spark.operators.similarity import _DOT, _normed

    qn = _normed(queries, "query_id", "qv")
    cn = _normed(embeddings, "neighbor_id", "cv")
    reranked = (
        shortlist.join(F.broadcast(qn), on="query_id")
        .join(cn, on="neighbor_id")
        .withColumn(
            "cosine_r6",
            F.round(
                F.expr(_DOT) / (F.col("query_id_norm") * F.col("neighbor_id_norm")), 6
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_r6"), F.asc("neighbor_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_r6",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def doc_embed_hashing(
    documents: DataFrame, dim: int = 64, text_col: str = "text"
) -> DataFrame:
    """Deterministic document embeddings via the hashing trick.

    Each token OCCURRENCE adds ±1 to one of ``dim`` buckets (bucket =
    portable 60-bit md5 hash mod dim; sign from an independent seeded
    hash — the signed feature-hashing estimator, unbiased under hash
    independence), and the integer count vector L2-normalizes to the
    final embedding.  Everything before the final division is exact
    integer arithmetic on the same md5 primitive the dedup family
    uses, so the embedding — and anything built on it (ANN, cosine
    dedup) — reproduces bit-for-bit in the DuckDB oracle: a fully
    hash-checkable text→embed→search pipeline, which no float model
    embedding can offer.

    Scale: one map-only pass, no shuffle — the fold is O(dim·tokens)
    per document and pipelines into the scan; the output column is the
    input to the ANN/dedup operators, so at 100 TB this runs as the
    embed stage of the corpus pipeline with zero extra exchanges.
    """
    # The whole per-doc embedding runs in ONE Arrow kernel (guide §4.2:
    # hand whole batches to native code) instead of the former
    # explode-per-occurrence → 64-conditional-sum HashAggregate: that
    # shape paid 2 interpreted md5 calls per token OCCURRENCE plus 64
    # branch evaluations per occurrence in the aggregate update, and
    # one full doc_id exchange to regroup what was already grouped (a
    # document row IS its own group).  The kernel memoizes each
    # distinct token's (bucket, sign) per task, so md5 runs once per
    # VOCABULARY entry, and the per-doc bucket sums never leave the
    # row — a map-only plan with ZERO exchanges (was 1).
    #
    # Bit-equality with the old JVM path, piece by piece (pinned by
    # tests/test_embeddings.py::test_doc_embed_kernel_matches_sql_fold):
    # - tokens: Spark `split(trim(text), '\\s+')` = strip ASCII spaces
    #   then Java-regex split with limit -1 (leading/trailing empty
    #   strings KEPT when delimited; "" -> [""]).  Python re.split over
    #   the explicit Java \s class reproduces that exactly.
    # - hashes: md5 over UTF-8 bytes, first 15 hex chars as int
    #   (< 2^60), pmod dim / parity sign — identical integer math.
    # - norm: the old fold `acc + double(x)*double(x)` left-to-right in
    #   float64; the kernel accumulates the same order in float64, so
    #   even a >2^53 corner rounds identically.  Division is IEEE
    #   float64 on both sides.
    # - a NULL text doc vanished through the old explode; the explicit
    #   isNotNull filter reproduces that.
    #
    # CPU-bound map side; rebalance so a few-row-group scan doesn't
    # serialize it.  NOTE (r8): removing this repartition was tried and
    # REVERTED — the embed output's partitioning is what downstream
    # consumers inherit, and doc_ann_topk's brute-force side has no
    # exchange of its own, so a 1-partition cached embed serialized its
    # whole cosine+rank pipeline (doc_ann_topk 2.95 s → 11.1 s
    # isolated).  The shuffle here is ~600 KB of text at bench scale
    # and buys 32-way parallelism for everything built on the
    # embeddings.
    documents = documents.repartition(
        documents.sparkSession.sparkContext.defaultParallelism
    )
    return documents.where(F.col(text_col).isNotNull()).select(
        "doc_id", _hash_embed_udf(dim)(F.col(text_col)).alias("embedding")
    )


def _hash_embed_udf(dim: int):
    """Arrow-batched signed-feature-hashing kernel for
    :func:`doc_embed_hashing`: text → L2-normalized dim-vector, one
    Python call per Arrow batch, md5 memoized per distinct token per
    task (vocabulary ≪ occurrences)."""
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf

    # Java \s is ASCII-only: [ \t\n\x0B\f\r].  Python \s would also
    # match unicode whitespace — spell the class out.
    _split = re.compile("[ \t\n\x0b\f\r]+").split

    @pandas_udf("array<double>")
    def embed(texts):
        import numpy as np
        import pandas as pd

        memo: dict[str, tuple[int, int]] = {}
        zero = [0.0] * dim
        out = []
        for t in texts:
            # Spark trim() strips ASCII space (0x20) only; Java split
            # with limit -1 keeps leading/trailing empty tokens ("" is
            # one empty token), matching re.split exactly
            vec = np.zeros(dim, dtype=np.int64)
            for w in _split(t.strip(" ")):
                bs = memo.get(w)
                if bs is None:
                    wb = w.encode("utf-8")
                    b = int(hashlib.md5(b"e#" + wb).hexdigest()[:15], 16) % dim
                    s = (
                        1
                        if int(hashlib.md5(b"s#" + wb).hexdigest()[:15], 16) % 2 == 0
                        else -1
                    )
                    memo[w] = bs = (b, s)
                vec[bs[0]] += bs[1]
            # norm: float64 accumulation in array order — the exact
            # arithmetic of the old SQL fold, not np.sum's pairwise
            acc = 0.0
            for x in vec:
                xd = float(x)
                acc += xd * xd
            if acc == 0.0:
                out.append(zero)
            else:
                nrm = acc ** 0.5
                out.append([float(x) / nrm for x in vec])
        return pd.Series(out, dtype="object")

    # asNondeterministic is a PLANNER fence, not a semantic claim (the
    # kernel is pure): left deterministic, Catalyst infers non-null/
    # non-empty constraints from downstream posexplode/norm filters and
    # pushes them BELOW the rebalance exchange — which re-evaluates the
    # whole kernel a second time per document just to pre-filter rows
    # the real evaluation then recomputes (observed: 2 ArrowEvalPython
    # nodes in doc_embed_hashing/doc_ann_topk, the lower one vacuous
    # since every non-null text yields a 64-element array).  Fencing
    # halves the Python-boundary work; values are identical.
    return embed.asNondeterministic()


def ann_topk_ivfpq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cluster_col: str = "label",
    n_probe: int = 3,
    m: int = 8,
    n_codes: int = 64,
    rerank_n: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF routing × PQ codes × exact rerank — FAISS ``IVFPQ`` proper.

    The full production ANN stack in one operator: each query probes
    only its ``n_probe`` nearest coarse clusters (partition pruning at
    100 TB — the codes table is bucketed by cluster id on disk), the
    scan inside the probed clusters touches only the 8 B/row PQ code
    column via ADC table lookups, and the ADC top-``rerank_n``
    shortlist is exact-cosine reranked.  Cost per query ≈
    (n_probe/n_clusters) of the corpus × 8 B/row + rerank_n raw rows —
    both knobs independent of corpus width.  Rows-only registry check
    (float k-means at both levels); recall pinned vs brute in pytest.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window

    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )
    from userbehavioranalysis_spark.operators.similarity import (
        _DOT,
        _combine_means,
        _normed,
        _PSUM_SCHEMA,
        _sum_by_cluster,
    )

    # coarse centroids via the fused partial-sum pass (driver reduces
    # <= partitions x clusters rows)
    parts = (
        embeddings.select(
            F.col(cluster_col).cast("int").alias("cluster"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .mapInPandas(_sum_by_cluster(), _PSUM_SCHEMA)
        .collect()
    )
    means = _combine_means(parts)
    cids = sorted(means)
    cmat = np.vstack([means[c] for c in cids])
    cnorm = np.linalg.norm(cmat, axis=1, keepdims=True)
    cnorm[cnorm == 0] = 1.0

    books = pq_codebooks(
        embeddings, m=m, n_codes=n_codes, vec_col=vec_col, id_col=id_col
    )
    release_pooled()
    codes = pooled_cache(
        pq_encode(embeddings, books, vec_col=vec_col, id_col=id_col).join(
            embeddings.select(
                F.col(id_col).alias("vec_id"),
                F.col(cluster_col).cast("int").alias("cluster"),
            ),
            on="vec_id",
        )
    )

    qrows = (
        queries.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .orderBy(F.col(id_col))
        .collect()
    )
    qids = [r[0] for r in qrows]
    qx = np.vstack([r[1] for r in qrows])
    sub = qx.shape[1] // m
    # probe sets: n_probe nearest centroids by cosine, ties -> lowest id
    qn = np.linalg.norm(qx, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    sim = (qx / qn) @ (cmat / cnorm).T
    probes = {
        qid: [cids[j] for j in np.lexsort((np.arange(len(cids)), -np.round(sim[i], 6)))[:n_probe]]
        for i, qid in enumerate(qids)
    }
    probe_df = embeddings.sparkSession.createDataFrame(
        [(int(q), int(c)) for q, cs in probes.items() for c in cs],
        "query_id long, cluster int",
    )
    tables = {
        qid: np.stack(
            [
                (
                    (qx[i, j * sub : (j + 1) * sub][None, :] - books[j]) ** 2
                ).sum(axis=1)
                for j in range(m)
            ]
        )
        for i, qid in enumerate(qids)
    }

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for qid, g in pdf.groupby("query_id"):
                t = tables[qid]
                cc = np.vstack(g["codes"].to_numpy())
                d = np.zeros(len(g))
                for j in range(m):
                    d += t[j][cc[:, j]]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": g["vec_id"].to_numpy(),
                            "adc_r6": np.round(d, 6),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    routed = codes.join(F.broadcast(probe_df), on="cluster").select(
        "query_id", "vec_id", "codes"
    )
    scored = routed.mapInPandas(
        score, "query_id long, neighbor_id long, adc_r6 double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_r6"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= rerank_n)
        .select("query_id", "neighbor_id")
    )
    qn_df = _normed(queries, "query_id", "qv")
    cn_df = _normed(embeddings, "neighbor_id", "cv")
    reranked = (
        shortlist.join(F.broadcast(qn_df), on="query_id")
        .join(cn_df, on="neighbor_id")
        .withColumn(
            "cosine_r6",
            F.round(
                F.expr(_DOT) / (F.col("query_id_norm") * F.col("neighbor_id_norm")), 6
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_r6"), F.asc("neighbor_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_r6",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# -- Fixed-codebook (hash-checkable) PQ / IVFPQ -------------------------------
#
# The float-k-means PQ/IVFPQ above are the production-realistic forms,
# but their codebooks cannot be replayed in SQL, so the registry records
# only rows-only checks for them.  These siblings make the SAME routing
# machinery (subspace codes, ADC table lookups, coarse-cluster probing,
# shortlist + exact rerank) value-hash-checkable end to end, the way
# `ann_topk_lsh`'s integer signatures already are:
#
#  - vectors L2-normalize then quantize with a FIXED scale 127
#    (`floor(x / ||x|| * 127 + 0.5)`) — metrically sound (everything on
#    one sphere) and IEEE-identical cross-engine;
#  - the codebook is not trained: its `n_codes` entries are the
#    quantized subvectors of deterministic LANDMARK rows — the corpus
#    rows with the smallest md5-derived h64(vec_id), the same seeding
#    primitive as the LSH hyperplanes (a random-sample codebook equals
#    k-means initialization; the exact rerank restores top-k quality);
#  - code assignment, ADC tables, and ADC scores are EXACT int64
#    arithmetic (ties -> lowest code / lowest id), so the shortlist is
#    engine-independent by construction; only the final rerank divides
#    floats, with the corpus-wide proven round-to-6dp + id tie-break.


def _quantize127(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vec_id, qv8) — L2-normalize then fixed-scale-127 integer lanes.

    Zero vectors are excluded (no direction to quantize), mirroring the
    zero-vector guards in the other ANN operators.
    """
    dv = _DVEC.format(c=vec_col)
    nrm = f"sqrt(aggregate({dv}, cast(0 as double), (acc, x) -> acc + x * x))"
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.expr(nrm).alias("_nrm"),
            F.expr(
                f"transform({dv}, x -> cast(floor(x / {nrm} * 127.0d + 0.5d)"
                " as bigint))"
            ).alias("qv8"),
        )
        .filter(F.col("_nrm") > 0)
        .drop("_nrm")
    )


def _fixed_codebooks(q8: DataFrame, m: int, n_codes: int):
    """(m, n_codes, dim/m) int64 codebooks from the md5-landmark rows.

    Landmark order (h64(vec_id), vec_id) is the code index — the same
    deterministic ordering the DuckDB oracle replays with a
    row_number() window.  Driver-held state: n_codes rows, bounded."""
    import numpy as np

    h = "cast(conv(substr(md5(cast(vec_id as string)), 1, 15), 16, 10) as bigint)"
    rows = q8.orderBy(F.expr(h), F.col("vec_id")).limit(n_codes).collect()
    x = np.vstack([r["qv8"] for r in rows]).astype("int64")
    dim = x.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    sub = dim // m
    return np.stack([x[:, j * sub : (j + 1) * sub] for j in range(m)]), sub


def _fixed_encode(q8: DataFrame, books, m: int, sub: int) -> DataFrame:
    """(vec_id, codes array<int>) — int64 argmin per subspace, ties ->
    lowest code (numpy argmin's first-occurrence == the oracle's
    row_number ORDER BY dist, code)."""
    import pandas as pd

    def enc(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(pdf["qv8"].to_numpy()).astype("int64")
            codes = np.empty((len(pdf), m), dtype="int32")
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d.argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "codes": list(codes)}
            )

    return q8.mapInPandas(enc, "vec_id long, codes array<int>")


def _rerank_exact(shortlist: DataFrame, embeddings: DataFrame,
                  queries: DataFrame, k: int) -> DataFrame:
    """Exact-cosine rerank of a (query_id, neighbor_id) shortlist —
    the shared tail of every ANN operator here."""
    from pyspark.sql import Window

    from userbehavioranalysis_spark.operators.similarity import _DOT, _normed

    qn = _normed(queries, "query_id", "qv")
    cn = _normed(embeddings, "neighbor_id", "cv")
    reranked = (
        shortlist.join(F.broadcast(qn), on="query_id")
        .join(cn, on="neighbor_id")
        .withColumn(
            "cosine_r6",
            F.round(
                F.expr(_DOT) / (F.col("query_id_norm") * F.col("neighbor_id_norm")), 6
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_r6"), F.asc("neighbor_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine_r6",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def ann_topk_pq_fixed(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    rerank_n: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ + ADC + exact rerank with the md5-landmark integer codebook —
    the hash-checkable sibling of :func:`ann_topk_pq` (see the section
    comment above).  Same plan shape and output schema; the ADC scan
    still touches only the m-byte code column, so the scale argument
    (memory-bound corpus pass) is identical — only the codebook source
    differs."""
    import numpy as np

    from pyspark.sql import Window

    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )

    release_pooled()
    # q8 feeds the landmark collect AND the encode pass — one scan+
    # quantize, not two (three in the IVFPQ sibling, which also sums
    # centroids over it)
    q8 = pooled_cache(_quantize127(embeddings, id_col, vec_col))
    books, sub = _fixed_codebooks(q8, m, n_codes)
    codes = pooled_cache(_fixed_encode(q8, books, m, sub))

    qrows = (
        _quantize127(queries, id_col, vec_col).orderBy(F.col("vec_id")).collect()
    )
    qids = np.array([r["vec_id"] for r in qrows])
    qx = np.vstack([r["qv8"] for r in qrows]).astype("int64")
    # integer ADC tables: (nq, m, n_codes)
    tables = np.stack(
        [
            ((qx[:, j * sub : (j + 1) * sub][:, None, :] - books[j][None, :, :]) ** 2)
            .sum(axis=2)
            for j in range(m)
        ],
        axis=1,
    )

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.vstack(pdf["codes"].to_numpy())
            d = np.zeros((len(qids), len(pdf)), dtype="int64")
            for j in range(m):
                d += tables[:, j, :][:, c[:, j]]
            nid = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, len(pdf)),
                    "neighbor_id": np.tile(nid, len(qids)),
                    "adc": d.ravel(),
                }
            )

    scored = codes.mapInPandas(
        score, "query_id long, neighbor_id long, adc long"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= rerank_n)
        .select("query_id", "neighbor_id")
    )
    return _rerank_exact(shortlist, embeddings, queries, k)


def ann_topk_ivfpq_fixed(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    cluster_col: str = "label",
    n_probe: int = 3,
    m: int = 8,
    n_codes: int = 16,
    rerank_n: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF routing × fixed-codebook PQ × exact rerank — the
    hash-checkable sibling of :func:`ann_topk_ivfpq`.

    Coarse routing is integer-exact too: the per-cluster "centroid" is
    the integer SUM of quantized lanes (mean direction × count — count
    cancels in cosine), the query-centroid similarity is
    ``int_dot / sqrt(int_self_dot)`` — two exact integers through one
    IEEE division and sqrt, bit-identical on any engine — and probes
    take the n_probe best (sim DESC, cluster ASC).  The ADC scan then
    touches only code rows in probed clusters: the same partition-
    pruning story as the float form, with every routing decision
    replayable in SQL."""
    import math

    import numpy as np

    from pyspark.sql import Window

    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )

    release_pooled()
    # one scan+quantize shared by the landmark collect, the encode
    # pass, and the centroid sums below
    q8 = pooled_cache(_quantize127(embeddings, id_col, vec_col))
    books, sub = _fixed_codebooks(q8, m, n_codes)
    dim = m * sub
    labels = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(cluster_col).cast("int").alias("cluster")
    )
    codes = pooled_cache(_fixed_encode(q8, books, m, sub).join(labels, on="vec_id"))

    # integer centroid sums per cluster: <= n_clusters rows collected
    cent_rows = (
        q8.join(labels, on="vec_id")
        .groupBy("cluster")
        .agg(*[F.sum(F.expr(f"qv8[{d}]")).alias(f"s{d}") for d in range(dim)])
        .collect()
    )
    cents = {
        r["cluster"]: np.array([r[f"s{d}"] for d in range(dim)], dtype="int64")
        for r in cent_rows
    }

    qrows = (
        _quantize127(queries, id_col, vec_col).orderBy(F.col("vec_id")).collect()
    )
    qids = [r["vec_id"] for r in qrows]
    qxs = {r["vec_id"]: np.array(r["qv8"], dtype="int64") for r in qrows}
    probes = []
    for qid in qids:
        sims = []
        for cl, sv in cents.items():
            # accumulate in unbounded Python ints: centroid SUM lanes
            # grow as 127·cluster_size, so an int64 (sv*sv).sum() would
            # wrap silently past ~3M vectors per cluster and corrupt
            # probe routing (the DuckDB oracle sums in HUGEINT)
            s2 = sum(int(v) * int(v) for v in sv)
            if s2 == 0:
                continue
            dot = sum(int(a) * int(b) for a, b in zip(qxs[qid], sv))
            # exact ints -> one IEEE division over one IEEE sqrt:
            # bit-identical in Spark, DuckDB, and CPython
            sims.append((-(dot / math.sqrt(s2)), cl))
        for _, cl in sorted(sims)[:n_probe]:
            probes.append((int(qid), int(cl)))
    probe_df = embeddings.sparkSession.createDataFrame(
        probes, "query_id long, cluster int"
    )

    qarr = np.vstack([qxs[q] for q in qids]).astype("int64")
    tables = {
        qid: np.stack(
            [
                ((qarr[i, j * sub : (j + 1) * sub][None, :] - books[j]) ** 2).sum(axis=1)
                for j in range(m)
            ]
        )
        for i, qid in enumerate(qids)
    }

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for qid, g in pdf.groupby("query_id"):
                t = tables[qid]
                cc = np.vstack(g["codes"].to_numpy())
                d = np.zeros(len(g), dtype="int64")
                for j in range(m):
                    d += t[j][cc[:, j]]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": g["vec_id"].to_numpy(),
                            "adc": d,
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    routed = codes.join(F.broadcast(probe_df), on="cluster").select(
        "query_id", "vec_id", "codes"
    )
    scored = routed.mapInPandas(
        score, "query_id long, neighbor_id long, adc long"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("adc_rank", F.row_number().over(w))
        .filter(F.col("adc_rank") <= rerank_n)
        .select("query_id", "neighbor_id")
    )
    return _rerank_exact(shortlist, embeddings, queries, k)
