"""Distributed codebook / centroid training via Spark MLlib k-means.

The hand-rolled trainers (embeddings.pq_codebooks,
similarity.assign_ivf_clusters) deliberately train driver-side on a
bounded deterministic sample — that keeps them hash-checkable and is
the standard production shortcut for codebooks.  What they give up is
the one thing MLlib genuinely adds at 100 TB: training that SEES the
whole corpus, as a distributed job, with k-means|| initialization
(Bahmani et al., VLDB'12) instead of a sample.  These wrappers are
that leg — ``pyspark.ml.clustering.KMeans`` over the full embedding
table, returning artifacts in exactly the shapes the existing PQ / IVF
search paths consume, so the *search* code (ADC scan, probe routing,
rerank) is shared and only the training stage differs.

Float k-means is not SQL-replayable, so registry entries for these
variants use the structural top-k contract (registry._ann_structural)
plus pytest recall floors vs brute force — the same standing as the
sample-trained k-means siblings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pq_codebooks_distributed(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    max_iter: int = 4,
    seed: int = 7,
    vec_col: str = "embedding",
):
    """Train PQ codebooks with one distributed MLlib k-means PER
    SUBSPACE over the FULL corpus (vs pq_codebooks' 512-row sample).

    The corpus is sliced into ``m`` subvector columns in one cached
    projection (one scan feeds all ``m`` fits); each fit is a
    k-means|| distributed job whose per-iteration cost is a map-side
    assign + small aggregate — the canonical MLlib shape that holds at
    any corpus size.  Returns a numpy ``(m, n_codes, dim/m)`` array —
    the same driver-held model artifact pq_codebooks produces — with
    each subspace's centroids sorted lexicographically so the codebook
    order is a function of the trained centers, not of MLlib's
    arbitrary cluster numbering.
    """
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    arr = embeddings.select(F.col(vec_col).cast("array<double>").alias("e"))
    head = arr.head()
    assert head is not None, "empty corpus"
    dim = len(head["e"])
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    sub = dim // m
    base = arr.select(
        *[F.slice("e", j * sub + 1, sub).alias(f"s{j}") for j in range(m)]
    ).cache()
    try:
        books = np.empty((m, n_codes, sub))

        def fit_one(j: int) -> None:
            df = base.select(array_to_vector(F.col(f"s{j}")).alias("features"))
            model = KMeans(
                k=n_codes, maxIter=max_iter, seed=seed, initMode="k-means||"
            ).fit(df)
            centers = np.array(model.clusterCenters())
            if len(centers) < n_codes:  # degenerate tiny corpus: pad
                centers = np.vstack(
                    [centers] + [centers[-1:]] * (n_codes - len(centers))
                )
            books[j] = centers[np.lexsort(centers.T[::-1])]

        # the m subspace fits are INDEPENDENT (each reads only its own
        # cached column and trains its own estimator with a fixed
        # seed): submit them from a small thread pool so a fit's many
        # tiny driver-coordinated k-means|| jobs back-fill the gaps of
        # the others' (guide §2.6 overlap-independent-jobs; measured
        # ~2x wall on the 8-fit PQ training at bench scale).  Results
        # are identical — per-fit determinism doesn't depend on which
        # thread runs it, and books[j] writes are index-disjoint.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(fit_one, range(m)))
        return books
    finally:
        base.unpersist()


def ivf_clusters_distributed(
    embeddings: DataFrame,
    n_clusters: int = 10,
    max_iter: int = 4,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization trained by distributed MLlib k-means
    over the full corpus (vs assign_ivf_clusters' sampled Lloyd).

    Returns (vec_id, embedding, cluster) — the exact input shape
    similarity.ann_topk_ivf probes, so routing/probing/rerank are the
    shared code path.  At 100 TB this is the "train once" stage whose
    output cluster id the corpus is bucketed by, turning every probe
    into a partition-pruned scan (see ann_index_write for the persisted
    form of that posture).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.withColumn(
        "features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=n_clusters, maxIter=max_iter, seed=seed, initMode="k-means||"
    ).fit(feat)
    return (
        model.transform(feat)
        .select(id_col, vec_col, F.col("prediction").cast("int").alias("cluster"))
    )
