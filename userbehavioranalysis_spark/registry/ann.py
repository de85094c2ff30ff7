"""Similarity search / embedding queries: brute, LSH (+persisted
index, multiprobe), IVF, PQ, IVFPQ, int8 — sample- and MLlib-trained."""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as _F

from userbehavioranalysis_spark import jobs as _jobs  # noqa: F401
from userbehavioranalysis_spark.functions import text as _T  # noqa: F401
from userbehavioranalysis_spark.operators import dedup as _dedup  # noqa: F401
from userbehavioranalysis_spark.operators import sequences as _seq  # noqa: F401
from userbehavioranalysis_spark.operators import similarity as _sim  # noqa: F401
from userbehavioranalysis_spark.operators import topn  # noqa: F401
from userbehavioranalysis_spark.operators import windowed_counts as wc  # noqa: F401
from userbehavioranalysis_spark.operators.graph import (  # noqa: F401
    item_triangles_oracle_sql as _triangles_oracle_sql,
    pagerank_oracle_sql as _pagerank_oracle_sql,
)
from userbehavioranalysis_spark.operators.sketches import (  # noqa: F401
    cms_oracle_sql as _cms_oracle_sql,
    histogram_quantiles_oracle_sql as _hq_oracle_sql,
    hll_oracle_sql as _hll_oracle_sql,
)
from userbehavioranalysis_spark.plans import relational as _rel  # noqa: F401
from userbehavioranalysis_spark.registry.core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _STREAM_STAGE_CACHE,
    _tables,
    query,
)
from userbehavioranalysis_spark.sources.readers import (  # noqa: F401
    events_with_item,
    load_testdata,
)


@query(
    "ann_topk_brute",
    oracle="""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
        FROM embeddings
    ), q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_sum(list_transform(range(1, len(q.ve) + 1),
                                             i -> q.ve[i] * c.ve[i]))
                     / (q.nrm * c.nrm), 6) AS cosine_r6
        FROM v c JOIN q ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_r6, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_r6 DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_ann_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.similarity import ann_topk_brute

    emb = _tables(spark, sf_dir)["embeddings"]
    return ann_topk_brute(emb, emb.filter(F.col("vec_id") < 5))


@query(
    "ann_topk_lsh",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * 1000000) AS BIGINT)) AS qint
        FROM embeddings
    ), planes AS (
        SELECT * FROM (VALUES {_sim._planes_duck_values(16)}) t(p, pl)
    ), dots AS (
        -- integer hyperplane dot against the md5-derived plane matrix
        -- (a VALUES CTE so the literal materializes once): exact,
        -- order-independent, matches the Spark aggregate() fold
        -- bit-for-bit (operators/similarity.py)
        SELECT vec_id, planes.p,
               list_sum(list_transform(range(0, len(qint)),
                   d -> qint[d + 1] * planes.pl[d + 1])) AS dot
        FROM v CROSS JOIN planes
    ), bands AS (
        SELECT vec_id, p // 4 AS band,
               CAST(sum(CASE WHEN dot > 0 THEN (1 << (p % 4)) ELSE 0 END) AS BIGINT) AS band_val
        FROM dots GROUP BY vec_id, p // 4
    ), cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM bands q JOIN bands c ON q.band = c.band AND q.band_val = c.band_val
        WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
    ), scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               round(list_sum(list_transform(range(1, len(q.ve) + 1),
                                             i -> q.ve[i] * c.ve[i]))
                     / (q.nrm * c.nrm), 6) AS cosine_r6
        FROM cand JOIN v q ON q.vec_id = cand.query_id
                  JOIN v c ON c.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_r6, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_r6 DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.similarity import ann_topk_lsh

    emb = _tables(spark, sf_dir)["embeddings"]
    return ann_topk_lsh(emb, emb.filter(F.col("vec_id") < 5))


def _ann_structural(res: DataFrame) -> DataFrame:
    """Scalar structural projection for APPROXIMATE ANN variants.

    Their neighbor SETS are engine-specific (k-means codebooks / probe
    routing are not SQL-replayable), so instead of surfacing in the
    driver as `err: no_oracle` forever, the registered output asserts
    the invariants any correct top-k must satisfy — per (query, rank):
    ranks dense 1..k, neighbor ≠ query, cosine within [-1, 1], and
    scores non-increasing down the ranking — folded into one boolean
    the oracle replays as literal TRUE over the same (query × rank)
    grid.  Row count pins k results per query; recall quality is pinned
    separately by the pytest recall floors vs ann_topk_brute."""
    from pyspark.sql import Window as _W

    prev = _F.lag("cosine_r6").over(
        _W.partitionBy("query_id").orderBy("rank")
    )
    return res.select(
        "query_id",
        _F.col("rank").cast("int").alias("rank"),
        (
            (_F.col("neighbor_id") != _F.col("query_id"))
            & (_F.col("cosine_r6") >= -1.0)
            & (_F.col("cosine_r6") <= 1.0)
            & (prev.isNull() | (prev >= _F.col("cosine_r6")))
        ).alias("valid"),
    )


# The structural oracle replays a FIXED (query × rank) grid, so it
# assumes every structural ANN query (a) filters queries to
# vec_id < _ANN_NQ and (b) returns a full dense 1.._ANN_K ranking per
# query (true whenever the probed candidate pool has ≥ k neighbors —
# holds at every tested sf; a variant that can legitimately return
# fewer must NOT use this oracle or a real contract violation becomes
# indistinguishable from under-filling).  Both constants are shared
# with the query definitions below so a future k / query-count change
# cannot desynchronize the grid from the queries.
_ANN_NQ = 5


_ANN_K = 10


_ANN_STRUCTURAL_ORACLE = f"""
    SELECT v.vec_id AS query_id, CAST(r.rank AS INTEGER) AS rank,
           TRUE AS valid
    FROM (SELECT vec_id FROM embeddings WHERE vec_id < {_ANN_NQ}) v
    CROSS JOIN (SELECT unnest(range(1, {_ANN_K} + 1)) AS rank) r
"""


# IVF is approximate by construction: recall is measured vs brute force
# in tests; the driver row hash-checks the structural top-k contract
# (see _ann_structural) instead of surfacing as `err: no_oracle`.
@query("ann_topk_ivf", oracle=_ANN_STRUCTURAL_ORACLE)
def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.similarity import (
        ann_topk_ivf,
        assign_ivf_clusters,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    clustered = assign_ivf_clusters(emb, n_clusters=10, iters=2)
    return _ann_structural(
        ann_topk_ivf(
            clustered,
            emb.filter(F.col("vec_id") < _ANN_NQ),
            k=_ANN_K,
            cluster_col="cluster",
        )
    )


@query(
    "doc_embedding_stats",
    oracle="""
    SELECT e.label, d.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
           round(CAST(sum(d.n_chars) AS DOUBLE) / count(*), 4) AS mean_chars_r4
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY e.label, d.lang
    """,
)
def q_doc_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal equi-join: text metadata × embedding cluster labels,
    aggregated per (label, lang).  The mean is derived from exact
    integer sums (not a float avg) so partial-agg summation order can
    never perturb the cross-engine hash."""
    import pyspark.sql.functions as F

    t = _tables(spark, sf_dir)
    j = t["documents"].join(
        t["embeddings"], t["documents"]["doc_id"] == t["embeddings"]["vec_id"]
    )
    return j.groupBy("label", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_chars_r4"),
    )


@query(
    "embedding_quantize",
    oracle="""
    WITH t AS (
        SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS v,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x))) AS maxabs
        FROM embeddings
    )
    SELECT vec_id,
           CASE WHEN maxabs = 0.0 THEN 0.0 ELSE 127.0 / maxabs END AS q_scale,
           CAST(unnest(range(0, len(v))) AS INTEGER) AS dim,
           CAST(unnest(list_transform(
               v, x -> CAST(floor(x * (CASE WHEN maxabs = 0.0 THEN 0.0
                                        ELSE 127.0 / maxabs END) + 0.5)
                            AS TINYINT))) AS INTEGER) AS q_val
    FROM t
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    pure higher-order-function expressions, IEEE-identical on any
    engine.

    Driver contract: registered output is the SCALARIZED
    (vec_id, q_scale, dim, q_val) posexplode of the int8 vector — the
    driver's pandas canonicalizer cannot sort/hash ARRAY columns
    (CORRECTNESS_r04 doc_embed_hashing).  quantize_int8's native
    array return stays for in-engine composition (int8 ANN path)."""
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.embeddings import quantize_int8

    q = quantize_int8(_tables(spark, sf_dir)["embeddings"])
    return q.select(
        "vec_id", "q_scale", F.posexplode("q_vec").alias("dim", "q_val")
    ).withColumn("q_val", F.col("q_val").cast("int"))


@query(
    "ann_topk_quantized",
    oracle="""
    WITH t AS (
        SELECT vec_id,
               CAST(embedding AS DOUBLE[]) AS v,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x))) AS maxabs
        FROM embeddings
    ), qz AS (
        SELECT vec_id,
               list_transform(
                   v, x -> CAST(floor(x * (CASE WHEN maxabs = 0.0 THEN 0.0
                                            ELSE 127.0 / maxabs END) + 0.5)
                                AS BIGINT)) AS qv
        FROM t
    ), s AS (
        SELECT vec_id, qv,
               list_sum(list_transform(qv, x -> x * x)) AS self_dot
        FROM qz
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_sum(list_transform(range(1, len(q.qv) + 1),
                                             i -> q.qv[i] * c.qv[i]))
                     / sqrt(CAST(q.self_dot AS DOUBLE) * c.self_dot),
                     6) AS qcosine_r6
        FROM s c JOIN (SELECT * FROM s WHERE vec_id < 5) q
          ON q.vec_id <> c.vec_id
        WHERE c.self_dot > 0 AND q.self_dot > 0
    )
    SELECT query_id, neighbor_id, qcosine_r6, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY qcosine_r6 DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-k over int8-quantized vectors: integer dot products
    (scales cancel in the cosine), same query set as ann_topk_brute so
    the two rankings are directly comparable."""
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.embeddings import ann_topk_quantized

    emb = _tables(spark, sf_dir)["embeddings"]
    return ann_topk_quantized(emb, emb.filter(F.col("vec_id") < 5))


@query("ann_topk_lsh_indexed", oracle=None)
def q_ann_topk_lsh_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_topk_lsh probing a PERSISTED Hive-partitioned band index:
    partition-pruned scans (the 100 TB vector-store posture the LSH
    docstring promises), identical candidates/output — same oracle."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.similarity import (
        ann_index_write,
        ann_topk_lsh_indexed,
    )

    key = (sf_dir, "ann-index")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index")):
        stage = tempfile.mkdtemp(prefix="uba_ann_index_")
        emb = _tables(spark, sf_dir)["embeddings"]
        ann_index_write(emb, os.path.join(stage, "index"))
        _STREAM_STAGE_CACHE[key] = stage
    emb = _tables(spark, sf_dir)["embeddings"]
    return ann_topk_lsh_indexed(
        emb, emb.filter(_F.col("vec_id") < 5), os.path.join(stage, "index")
    )


# same result as ann_topk_lsh by construction → same oracle SQL
ORACLES["ann_topk_lsh_indexed"] = ORACLES["ann_topk_lsh"]


@query("ann_topk_lsh_append", oracle=None)
def q_ann_topk_lsh_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-ANN index MAINTENANCE (operators/similarity.ann_index_append
    — completing the band store's write/probe/append lifecycle): the
    index is written from HALF the corpus (even vec_ids), the other
    half is APPENDED — banded with the manifest's signing parameters
    into the same (band, band_val) partition layout, no rewrite — and
    the probe of the appended index must hash-equal ann_topk_lsh over
    the full corpus (the same FULL VALUE oracle as ann_topk_lsh_indexed,
    the strongest append proof in the ANN family: unlike IVF there is
    no training to drift, the hyperplanes are a fixed literal matrix,
    so write(A)+append(B) ≡ write(A∪B) exactly)."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.similarity import (
        ann_index_append,
        ann_index_write,
        ann_topk_lsh_indexed,
    )

    key = (sf_dir, "ann-index-append")
    stage = _STREAM_STAGE_CACHE.get(key)
    emb = _tables(spark, sf_dir)["embeddings"]
    if stage is None or not os.path.isdir(os.path.join(stage, "index")):
        stage = tempfile.mkdtemp(prefix="uba_ann_idx_app_")
        ann_index_write(
            emb.filter(_F.col("vec_id") % 2 == 0), os.path.join(stage, "index")
        )
        ann_index_append(
            emb.filter(_F.col("vec_id") % 2 == 1), os.path.join(stage, "index")
        )
        _STREAM_STAGE_CACHE[key] = stage
    return ann_topk_lsh_indexed(
        emb, emb.filter(_F.col("vec_id") < 5), os.path.join(stage, "index")
    )


# write(A) + append(B) probes exactly like the one-shot full index →
# the same full value oracle as ann_topk_lsh / ann_topk_lsh_indexed
ORACLES["ann_topk_lsh_append"] = ORACLES["ann_topk_lsh"]


_HASH_EMBED_CTE = f"""
    t AS (
        SELECT doc_id, {_T.TOKENS_DUCK} AS toks FROM documents
    ), pr AS (
        -- hash each token occurrence ONCE to (bucket, sign)
        SELECT doc_id, list_transform(toks, w -> struct_pack(
            b := ('0x' || substr(md5('e#' || w), 1, 15))::BIGINT % 64,
            sg := CASE WHEN ('0x' || substr(md5('s#' || w), 1, 15))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END)) AS p
        FROM t
    ), iv AS (
        SELECT doc_id, list_transform(range(0, 64), d ->
            list_sum(list_transform(p, x -> CASE WHEN x.b = d THEN x.sg ELSE 0 END))) AS iv
        FROM pr
    ), emb AS (
        SELECT doc_id, iv,
               sqrt(list_sum(list_transform(iv, x -> (x::DOUBLE) * (x::DOUBLE)))) AS nrm
        FROM iv
    ), hemb AS (
        SELECT doc_id,
               CASE WHEN nrm = 0 THEN list_transform(iv, x -> 0.0)
                    ELSE list_transform(iv, x -> x::DOUBLE / nrm) END AS embedding
        FROM emb
    )
"""


@query(
    "doc_embed_hashing",
    oracle=f"""
    WITH {_HASH_EMBED_CTE}
    SELECT doc_id, CAST(d.dim AS INTEGER) AS dim, embedding[d.dim + 1] AS value
    FROM hemb CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
    """,
)
def q_doc_embed_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature-hashing document embeddings: integer bucket
    counts (portable md5) → L2 normalize.  The embed stage of a fully
    hash-checkable text→embed→search pipeline — exact integer
    arithmetic until the one IEEE-identical division.

    Driver contract: the registered output is the SCALARIZED
    (doc_id, dim, value) posexplode of the 64-dim vector — the
    driver's pandas canonicalizer sorts columns and cannot hash an
    ARRAY column (the one red row of CORRECTNESS_r04).  The array
    form stays the operator's native return (doc_ann_topk composes
    it directly)."""
    from userbehavioranalysis_spark.operators.embeddings import doc_embed_hashing

    emb = doc_embed_hashing(_tables(spark, sf_dir)["documents"])
    return emb.select(
        "doc_id", _F.posexplode("embedding").alias("dim", "value")
    )


@query(
    "doc_ann_topk",
    oracle=f"""
    WITH {_HASH_EMBED_CTE},
    v AS (
        -- norm recomputed over the normalized vector (≈1 but not
        -- exactly 1 in floats) to mirror the Spark side's _normed
        SELECT doc_id AS vec_id, embedding AS ve,
               sqrt(list_sum(list_transform(embedding, x -> x * x))) AS nrm
        FROM hemb
        WHERE list_sum(list_transform(embedding, x -> abs(x))) > 0
    ), q AS (SELECT * FROM v WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_sum(list_transform(range(1, len(q.ve) + 1),
                                             i -> q.ve[i] * c.ve[i]))
                     / (q.nrm * c.nrm), 6) AS cosine_r6
        FROM q JOIN v c ON q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_r6, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_r6 DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_doc_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end text→embed→search, exactly oracle-checked: hashing-
    trick embeddings feed brute-force cosine top-10 — the composed
    pipeline a retrieval corpus runs, with every stage reproducible in
    SQL (no float model in the loop)."""
    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )
    from userbehavioranalysis_spark.operators.embeddings import doc_embed_hashing
    from userbehavioranalysis_spark.operators.similarity import ann_topk_brute

    emb = doc_embed_hashing(_tables(spark, sf_dir)["documents"]).select(
        _F.col("doc_id").alias("vec_id"), "embedding"
    )
    emb = emb.filter(
        _F.expr("aggregate(embedding, cast(0 as double), (acc, x) -> acc + abs(x)) > 0")
    )
    # one embed materialization shared by the corpus and query sides
    # (without the barrier the hash+aggregate pipeline runs for each)
    release_pooled()
    emb = pooled_cache(emb)
    return ann_topk_brute(emb, emb.filter(_F.col("vec_id") < 5), k=10)


@query(
    "ann_topk_lsh_multiprobe",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * 1000000) AS BIGINT)) AS qint
        FROM embeddings
    ), planes AS (
        SELECT * FROM (VALUES {_sim._planes_duck_values(16)}) t(p, pl)
    ), dots AS (
        SELECT vec_id, planes.p,
               list_sum(list_transform(range(0, len(qint)),
                   d -> qint[d + 1] * planes.pl[d + 1])) AS dot
        FROM v CROSS JOIN planes
    ), bands AS (
        SELECT vec_id, p // 4 AS band,
               CAST(sum(CASE WHEN dot > 0 THEN (1 << (p % 4)) ELSE 0 END) AS BIGINT) AS band_val
        FROM dots GROUP BY vec_id, p // 4
    ), qprobe AS (
        -- each query band probes itself + its 4 one-bit flips
        SELECT DISTINCT vec_id AS query_id, band,
               CASE WHEN f.j = 0 THEN band_val
                    ELSE xor(band_val, 1 << (f.j - 1)) END AS band_val
        FROM bands CROSS JOIN range(0, 5) f(j)
        WHERE vec_id < 5
    ), cand AS (
        SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
        FROM qprobe q JOIN bands c
          ON q.band = c.band AND q.band_val = c.band_val
        WHERE q.query_id <> c.vec_id
    ), scored AS (
        SELECT cand.query_id, cand.neighbor_id,
               round(list_sum(list_transform(range(1, len(q.ve) + 1),
                                             i -> q.ve[i] * c.ve[i]))
                     / (q.nrm * c.nrm), 6) AS cosine_r6
        FROM cand JOIN v q ON q.vec_id = cand.query_id
                  JOIN v c ON c.vec_id = cand.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_r6, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_r6 DESC, neighbor_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_ann_topk_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: exact band buckets + every 1-bit-flip
    neighbor bucket (Lv et al. VLDB'07) — recall of ~double the bands
    at the same index size, query-side-only fan-out, and a fully
    deterministic probe set so the result stays hash-checkable."""
    from userbehavioranalysis_spark.operators.similarity import (
        ann_topk_lsh_multiprobe,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    return ann_topk_lsh_multiprobe(emb, emb.filter(_F.col("vec_id") < 5))


# IVFPQ with float k-means codebooks (the production-realistic form):
# pytest recall pins (on this crowded corpus it matches plain IVF's
# recall at equal n_probe — the rerank fully recovers the PQ error —
# while the probed scan touches only the 8-byte code column).  The
# hash-checkable routing proof lives in the fixed-codebook sibling
# `ann_topk_ivfpq` below; the driver row hash-checks the structural
# top-k contract (_ann_structural).
@query("ann_topk_ivfpq_kmeans", oracle=_ANN_STRUCTURAL_ORACLE)
def q_ann_topk_ivfpq_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FAISS-IVFPQ-shaped ANN: coarse-cluster routing (partition
    pruning at scale) × PQ-ADC code scan × exact top-100 rerank —
    float-k-means codebooks; structural-contract driver hash +
    recall-tested vs brute."""
    from userbehavioranalysis_spark.operators.embeddings import ann_topk_ivfpq

    emb = _tables(spark, sf_dir)["embeddings"]
    return _ann_structural(
        ann_topk_ivfpq(emb, emb.filter(_F.col("vec_id") < _ANN_NQ), k=_ANN_K)
    )


# PQ with float-k-means codebooks (deterministic per corpus but not
# SQL-replayable): structural-contract driver hash + recall-vs-brute test.
@query("ann_topk_pq_kmeans", oracle=_ANN_STRUCTURAL_ORACLE)
def q_ann_topk_pq_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 8×64-code k-means codebooks → 8-byte
    codes (32× lighter corpus scan than float32), ADC table-lookup
    shortlist, exact-cosine rerank of the top-100 — the memory-bound
    ANN path (FAISS IVFPQ shape) beside brute/LSH/IVF/int8."""
    from userbehavioranalysis_spark.operators.embeddings import ann_topk_pq

    emb = _tables(spark, sf_dir)["embeddings"]
    return _ann_structural(
        ann_topk_pq(emb, emb.filter(_F.col("vec_id") < _ANN_NQ), k=_ANN_K)
    )


# Shared SQL fragments for the fixed-codebook PQ/IVFPQ oracles: L2
# normalize + fixed-scale-127 integer quantization, md5-landmark
# codebook, per-(vector, subspace, code) integer distances.
_PQF_COMMON = """
    v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
        FROM embeddings
    ), q8 AS (
        SELECT vec_id,
               list_transform(ve, x -> CAST(floor(x / nrm * 127.0 + 0.5)
                                            AS BIGINT)) AS qv
        FROM v WHERE nrm > 0
    ), land AS (
        SELECT * FROM (
            SELECT qv, row_number() OVER (
                ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT,
                         vec_id
            ) - 1 AS code
            FROM q8
        ) WHERE code < 16
    ), dists AS (
        SELECT c.vec_id, g.j, l.code,
               list_sum(list_transform(range(1, 9),
                   d -> (c.qv[g.j * 8 + d] - l.qv[g.j * 8 + d])
                      * (c.qv[g.j * 8 + d] - l.qv[g.j * 8 + d]))) AS dist
        FROM q8 c CROSS JOIN generate_series(0, 7) g(j) CROSS JOIN land l
    ), enc AS (
        SELECT vec_id, j, code FROM dists
        QUALIFY row_number() OVER (PARTITION BY vec_id, j
                                   ORDER BY dist, code) = 1
    ), qtab AS (
        SELECT vec_id AS query_id, j, code, dist FROM dists WHERE vec_id < 5
    )
"""


_PQF_TAIL = """
    , short AS (
        SELECT query_id, neighbor_id FROM adc
        QUALIFY row_number() OVER (PARTITION BY query_id
                                   ORDER BY adc, neighbor_id) <= 100
    ), rr AS (
        SELECT s.query_id, s.neighbor_id,
               round(list_sum(list_transform(range(1, len(q.ve) + 1),
                                             i -> q.ve[i] * c.ve[i]))
                     / (q.nrm * c.nrm), 6) AS cosine_r6
        FROM short s
        JOIN v q ON q.vec_id = s.query_id
        JOIN v c ON c.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine_r6, CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine_r6 DESC,
                                              neighbor_id ASC) AS rank
        FROM rr
    ) WHERE rank <= 10
"""


@query(
    "ann_topk_pq",
    oracle=f"""
    WITH {_PQF_COMMON}
    , adc AS (
        SELECT t.query_id, en.vec_id AS neighbor_id, sum(t.dist) AS adc
        FROM enc en JOIN qtab t ON t.j = en.j AND t.code = en.code
        WHERE t.query_id <> en.vec_id
        GROUP BY 1, 2
    )
    {_PQF_TAIL}
    """,
)
def q_ann_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable PQ ANN: md5-landmark INTEGER codebooks (the LSH-
    plane seeding move applied to product quantization), int64 code
    assignment and ADC tables (ties → lowest code/id, engine-exact),
    top-100 shortlist, exact-cosine rerank.  Same ADC routing machinery
    and 8-byte-code corpus scan as the k-means sibling — every stage
    replayed value-for-value by the DuckDB oracle."""
    from userbehavioranalysis_spark.operators.embeddings import ann_topk_pq_fixed

    emb = _tables(spark, sf_dir)["embeddings"]
    return ann_topk_pq_fixed(emb, emb.filter(_F.col("vec_id") < 5))


@query(
    "ann_topk_ivfpq",
    oracle=f"""
    WITH {_PQF_COMMON}
    , cent AS (
        SELECT e.label AS cluster, g.d, sum(q.qv[g.d]) AS s
        FROM q8 q JOIN embeddings e USING (vec_id)
        CROSS JOIN generate_series(1, 64) g(d)
        GROUP BY 1, 2
    ), centv AS (
        SELECT cluster, list(s ORDER BY d) AS sv FROM cent GROUP BY cluster
    ), probe AS (
        SELECT q.vec_id AS query_id, c.cluster
        FROM (SELECT * FROM q8 WHERE vec_id < 5) q CROSS JOIN (
            SELECT cluster, sv,
                   list_sum(list_transform(sv, x -> x * x)) AS s2
            FROM centv
        ) c
        WHERE c.s2 > 0
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY CAST(list_sum(list_transform(range(1, 65),
                                                  i -> q.qv[i] * c.sv[i]))
                          AS DOUBLE) / sqrt(CAST(c.s2 AS DOUBLE)) DESC,
                     c.cluster ASC
        ) <= 3
    ), adc AS (
        SELECT t.query_id, en.vec_id AS neighbor_id, sum(t.dist) AS adc
        FROM enc en
        JOIN embeddings el ON el.vec_id = en.vec_id
        JOIN probe p ON p.cluster = el.label
        JOIN qtab t ON t.query_id = p.query_id
                   AND t.j = en.j AND t.code = en.code
        WHERE t.query_id <> en.vec_id
        GROUP BY 1, 2
    )
    {_PQF_TAIL}
    """,
)
def q_ann_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable IVFPQ ANN: integer coarse-centroid SUMS route each
    query to its 3 best clusters (int dot / sqrt(int self-dot) — exact
    integers through one IEEE division, bit-identical on any engine),
    then the fixed-codebook ADC scan runs only inside probed clusters
    (the partition-pruning story, now value-replayable in SQL), with
    the shared top-100 exact rerank."""
    from userbehavioranalysis_spark.operators.embeddings import (
        ann_topk_ivfpq_fixed,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    return ann_topk_ivfpq_fixed(emb, emb.filter(_F.col("vec_id") < 5))


# The north star names "Structured Streaming + MLlib"; these are the
# MLlib leg — codebook/centroid training as DISTRIBUTED k-means|| jobs
# over the full corpus (vs the hand-rolled sample trainers), feeding
# the exact same search paths.  Float k-means isn't SQL-replayable, so
# both carry the structural top-k contract + pytest recall floors —
# the same standing as the sample-k-means siblings.
@query("ann_topk_pq_mllib", oracle=_ANN_STRUCTURAL_ORACLE)
def q_ann_topk_pq_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN with codebooks trained by pyspark.ml KMeans over the FULL
    corpus (one distributed fit per subspace, k-means|| init) — the
    100 TB training leg; ADC scan + exact rerank are shared with
    ann_topk_pq_kmeans."""
    from userbehavioranalysis_spark.operators.embeddings import ann_topk_pq
    from userbehavioranalysis_spark.operators.mlcodebooks import (
        pq_codebooks_distributed,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    books = pq_codebooks_distributed(emb, m=8, n_codes=16)
    return _ann_structural(
        ann_topk_pq(
            emb,
            emb.filter(_F.col("vec_id") < _ANN_NQ),
            k=_ANN_K,
            m=8,
            n_codes=16,
            books=books,
        )
    )


@query("ann_topk_ivf_mllib", oracle=_ANN_STRUCTURAL_ORACLE)
def q_ann_topk_ivf_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with coarse centroids trained by one distributed
    pyspark.ml KMeans over the full corpus; probe routing and rerank
    are shared with ann_topk_ivf."""
    from userbehavioranalysis_spark.operators.mlcodebooks import (
        ivf_clusters_distributed,
    )
    from userbehavioranalysis_spark.operators.similarity import ann_topk_ivf

    emb = _tables(spark, sf_dir)["embeddings"]
    clustered = ivf_clusters_distributed(emb, n_clusters=10)
    return _ann_structural(
        ann_topk_ivf(
            clustered,
            emb.filter(_F.col("vec_id") < _ANN_NQ),
            k=_ANN_K,
            cluster_col="cluster",
        )
    )


@query("ann_topk_ivf_indexed", oracle=_ANN_STRUCTURAL_ORACLE)
def q_ann_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_topk_ivf probing a PERSISTED cluster-partitioned parquet
    index (operators/similarity.ivf_index_write — the FAISS
    inverted-list layout in parquet terms: one directory per coarse
    cell + a stored centroid routing table, built once and cached
    across calls); the probe reads only its n_probe routed directories
    (PartitionFilters asserted in tests).  Same routing/scoring as
    ann_topk_ivf — equality-tested; structural-contract driver hash."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.similarity import (
        ann_topk_ivf_indexed,
        assign_ivf_clusters,
        ivf_index_write,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    key = (sf_dir, "ivf-index")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "vectors")):
        stage = tempfile.mkdtemp(prefix="uba_ivf_index_")
        clustered = assign_ivf_clusters(emb, n_clusters=10, iters=2)
        ivf_index_write(clustered, os.path.join(stage, "index"))
        _STREAM_STAGE_CACHE[key] = stage
    return _ann_structural(
        ann_topk_ivf_indexed(
            emb.filter(_F.col("vec_id") < _ANN_NQ),
            os.path.join(stage, "index"),
            k=_ANN_K,
        )
    )


@query("ann_topk_ivf_append", oracle=_ANN_STRUCTURAL_ORACLE)
def q_ann_topk_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index MAINTENANCE (operators/similarity.ivf_index_append —
    the leg that completes the vector store's write/probe/append
    triple, matching the minhash index's): the index is written from
    HALF the corpus (even vec_ids) with its trained routing table, the
    other half is APPENDED raw — routed against the STORED centroids
    (FAISS add-after-train semantics) into the same cluster partition
    layout, no rewrite, no retrain — and the probe of the appended
    index must equal the one-shot index holding the same assignments
    (pinned in tests/test_plans.py).  Drift trade documented on the
    operator: appends shift the distribution, so periodic retrain +
    rewrite (ivf_clusters_distributed) is the compaction analog.
    Structural-contract driver hash + recall floor via the shared IVF
    search path."""
    from userbehavioranalysis_spark.operators.similarity import (
        ann_topk_ivf_indexed,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    idx = _ivf_append_stage(spark, sf_dir)
    return _ann_structural(
        ann_topk_ivf_indexed(
            emb.filter(_F.col("vec_id") < _ANN_NQ), idx, k=_ANN_K
        )
    )


def _ivf_append_stage(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per sf_dir) the trained-then-appended IVF index the
    maintenance queries share: trained on the EVEN vec_ids, the odd
    half appended raw against the stored centroids — exactly the
    add-after-train state ann_topk_ivf_append probes and
    ivf_cell_drift audits."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.similarity import (
        assign_ivf_clusters,
        ivf_index_append,
        ivf_index_write,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    key = (sf_dir, "ivf-index-append")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "vectors")):
        stage = tempfile.mkdtemp(prefix="uba_ivf_idx_app_")
        clustered = assign_ivf_clusters(
            emb.filter(_F.col("vec_id") % 2 == 0), n_clusters=10, iters=2
        )
        ivf_index_write(clustered, os.path.join(stage, "index"))
        ivf_index_append(
            emb.filter(_F.col("vec_id") % 2 == 1), os.path.join(stage, "index")
        )
        _STREAM_STAGE_CACHE[key] = stage
    return os.path.join(stage, "index")


@query(
    "ivf_cell_drift",
    oracle="""
    SELECT CAST(count(*) FILTER (WHERE vec_id % 2 = 0) AS BIGINT) AS trained_total,
           CAST(count(*) AS BIGINT) AS current_total,
           TRUE AS cells_valid,
           TRUE AS growth_valid,
           TRUE AS skew_valid
    FROM embeddings
    """,
)
def q_ivf_cell_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF drift monitor (operators/similarity.ivf_cell_drift) over the
    shared trained-on-even / appended-odd index: live per-cell counts
    (a partition-column-only aggregate) vs the training histogram the
    manifest pins.  Per-cell rows aren't SQL-replayable (k-means cells
    are engine-specific), so — the _ann_structural pattern — the
    registered output is the one-row AUDIT the drift frame must
    satisfy: its trained_n column re-sums to the even-half count and
    current_n to the full corpus (both value-checked against SQL),
    every cell grew monotonically (appends never shrink a cell), the
    cell count is within the trained domain, and every skew is
    positive.  The flag actually TRIPPING on a skewed append is pinned
    in tests/test_plans.py with a constructed hot cell."""
    from userbehavioranalysis_spark.operators.similarity import ivf_cell_drift

    drift = ivf_cell_drift(spark, _ivf_append_stage(spark, sf_dir))
    return drift.agg(
        _F.sum("trained_n").cast("bigint").alias("trained_total"),
        _F.sum("current_n").cast("bigint").alias("current_total"),
        ((_F.count("*") >= 1) & (_F.count("*") <= 10)).alias("cells_valid"),
        (_F.min(_F.col("current_n") - _F.col("trained_n")) >= 0).alias(
            "growth_valid"
        ),
        (_F.min("skew") > 0).alias("skew_valid"),
    )
