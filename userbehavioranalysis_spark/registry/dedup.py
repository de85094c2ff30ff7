"""Dedup family + composed corpus pipelines (build-brief
extensions; full-SQL minhash/simhash/ngram oracles)."""
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
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_md5,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS keeper_id
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.exact_dedup(_tables(spark, sf_dir)["documents"])


def _minhash_oracle(
    max_bucket: int | None = None,
    incremental_split: tuple[str, str] | None = None,
    min_match: int = 0,
) -> str:
    """MinHash-LSH oracle builder — the single SQL-side source of the
    band key format (mirror of ``operators/dedup._band_expr``; 12
    hashes / 4 bands / 3 rows).

    Default: symmetric near-dup pairs (doc_a < doc_b), optionally with
    the hot-bucket cap the Spark operator applies (identical windowed
    bucket-size filter).  With ``incremental_split=(corpus_pred,
    new_pred)``: the batch-vs-corpus incremental form
    (dedup_incremental), where ``max_bucket`` caps the CORPUS side
    only — exactly like ``minhash_incremental_matches``."""

    def buckets_of(idcol: str, pred: str) -> str:
        where = f"\n        WHERE {pred}" if pred else ""
        return f"""
        SELECT doc_id AS {idcol}, b.band_id,
               array_to_string(sig[b.band_id * 3 + 1 : b.band_id * 3 + 3], '-')
                   AS band_sig
        FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS band_id) b{where}"""

    def capped(cte: str, idcol: str) -> str:
        if max_bucket is None:
            return f"SELECT * FROM {cte}"
        return f"""SELECT {idcol}, band_id, band_sig FROM (
            SELECT *, count(*) OVER (PARTITION BY band_id, band_sig) AS bsz
            FROM {cte}
        ) WHERE bsz <= {max_bucket}"""

    head = f"""
    WITH toks AS (
        SELECT doc_id, {_T.TOKENS_DUCK} AS tokens FROM documents
    ), sigs AS (
        SELECT doc_id, {_T.minhash_sig_duck(12)} AS sig
        FROM (SELECT doc_id, list_distinct(tokens) AS shingles FROM toks)
    )"""
    score = (
        "CAST(len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) "
        "AS INTEGER)"
    )
    if incremental_split is None:
        assert min_match == 0, "symmetric form registers unfiltered scores"
        return f"""{head}, buckets AS ({buckets_of('doc_id', '')}
    ), kept AS (
        {capped('buckets', 'doc_id')}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM kept a
        JOIN kept b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                   AND a.doc_id < b.doc_id
    )
    SELECT cand.doc_a, cand.doc_b, {score} AS match_count
    FROM cand
    JOIN sigs sa ON sa.doc_id = cand.doc_a
    JOIN sigs sb ON sb.doc_id = cand.doc_b
"""
    corpus_pred, new_pred = incremental_split
    return f"""{head}, bc0 AS ({buckets_of('corpus_doc_id', corpus_pred)}
    ), bc AS (
        {capped('bc0', 'corpus_doc_id')}
    ), bn AS ({buckets_of('new_doc_id', new_pred)}
    ), cand AS (
        SELECT DISTINCT bn.new_doc_id, bc.corpus_doc_id
        FROM bn JOIN bc USING (band_id, band_sig)
    ), scored AS (
        SELECT cand.new_doc_id, cand.corpus_doc_id, {score} AS match_count
        FROM cand
        JOIN sigs sa ON sa.doc_id = cand.new_doc_id
        JOIN sigs sb ON sb.doc_id = cand.corpus_doc_id
    )
    SELECT * FROM scored WHERE match_count >= {min_match}
"""


_MINHASH_ORACLE = _minhash_oracle()


@query("dedup_minhash_lsh", oracle=_MINHASH_ORACLE)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.minhash_lsh_pairs(_tables(spark, sf_dir)["documents"])


@query("dedup_minhash_capped", oracle=_minhash_oracle(max_bucket=32))
def q_dedup_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH with the production hot-bucket cap (max 32 docs per
    band bucket): mega-buckets of near-identical boilerplate are dropped
    as low-information, bounding candidates at O(corpus · cap) instead
    of O(hottest-bucket²) — the guard that keeps banded LSH viable on a
    dup-dense 100 TB corpus."""
    return _dedup.minhash_lsh_pairs(
        _tables(spark, sf_dir)["documents"], max_bucket=32
    )


_SIMHASH_ORACLE = f"""
    WITH sk AS (
        SELECT doc_id, {_T.simhash_duck(63)} AS simhash
        FROM (
            SELECT doc_id,
                   list_transform(list_distinct({_T.TOKENS_DUCK}), w -> {_T.h64_duck('w')})
                       AS word_hashes
            FROM documents
        )
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sk a JOIN sk b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Narrow 8/63-bit simhash pairs — SEMANTICS pinned to the oracle
    at every sf via allow_narrow_at_scale=True (the adaptive wide
    reroute would silently switch to 8/(n·60) semantics past 100 k
    docs and hash-mismatch this oracle).  The scale-safe sibling with
    self-sizing wide sketches is registered as dedup_simhash_wide."""
    return _dedup.simhash_pairs(
        _tables(spark, sf_dir)["documents"], allow_narrow_at_scale=True
    )


# transitive closure over the simhash pair graph: the oracle's
# recursive CTE computes exact min-reachable-id components, which the
# Spark pointer-jumping label propagation must reproduce exactly
_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE sk AS (
        SELECT doc_id, {_T.simhash_duck(63)} AS simhash
        FROM (
            SELECT doc_id,
                   list_transform(list_distinct({_T.TOKENS_DUCK}), w -> {_T.h64_duck('w')})
                       AS word_hashes
            FROM documents
        )
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sk a JOIN sk b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        SELECT a AS doc, a AS r FROM edges
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.doc
    )
    SELECT doc AS doc_id, min(r) AS cluster_id,
           (doc = min(r)) AS is_canonical
    FROM reach GROUP BY doc
"""


@query("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: simhash pairs → connected components →
    (doc, cluster, canonical keep flag) — the keep/drop decision step
    of a corpus cleaning pipeline.  Narrow 8/63 semantics pinned to
    the oracle (see q_dedup_simhash); dedup_clusters_wide is the
    scale path."""
    pairs = _dedup.simhash_pairs(
        _tables(spark, sf_dir)["documents"], allow_narrow_at_scale=True
    )
    return _dedup.dedup_clusters(pairs)


_NGRAM_ORACLE = f"""
    WITH sh0 AS (
        SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
        FROM (
            SELECT doc_id, list_distinct({_T.shingles_duck(3)}) AS shingles
            FROM (SELECT doc_id, {_T.TOKENS_DUCK} AS tokens FROM documents)
        )
    ), sh1 AS (
        -- join on the same portable 60-bit shingle hash the Spark side
        -- uses, so any hash collision affects both engines identically
        SELECT doc_id, n_sh, {_T.h64_duck('shingle')} AS sh_h FROM sh0
    ), sh AS (
        -- same df cutoff as the Spark operator: drop df=1 (can't
        -- intersect) and df > min(512, max(2, floor(0.1 * n_docs)))
        -- stop-shingles (the absolute term is the df² scale guard)
        SELECT doc_id, n_sh, sh_h FROM (
            SELECT *, count(*) OVER (PARTITION BY sh_h) AS df FROM sh1
        )
        WHERE df >= 2
          AND df <= least(512, greatest(2, CAST(floor(0.1 * (SELECT count(*) FROM documents)) AS BIGINT)))
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.n_sh AS n_a, b.n_sh AS n_b,
               CAST(count(*) AS BIGINT) AS inter_count
        FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, inter_count,
           n_a + n_b - inter_count AS union_count
    FROM inter
    WHERE inter_count * 10 >= (n_a + n_b - inter_count) * 1
"""


@query("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.ngram_jaccard_pairs(_tables(spark, sf_dir)["documents"])


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, len(a.ve) + 1), i -> a.ve[i] * b.ve[i]))
          / (a.nrm * b.nrm) >= 0.4
    """,
)
def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.embedding_dedup_pairs(_tables(spark, sf_dir)["embeddings"])


_CLEAN_CORPUS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, {_T.TOKENS_DUCK} AS tokens FROM documents
    ), q AS (
        SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
               round(least(len(tokens)::DOUBLE / 100, 1.0) * 0.5
                     + (1.0 - len(list_filter(tokens, x -> x IN ('the','a','of','and')))::DOUBLE
                              / len(tokens)) * 0.5, 4) AS score_r4
        FROM toks
    ), hits AS (
        SELECT doc_id,
           len(list_filter(tokens, x -> x IN ('der','die','und','das'))) AS h_de,
           len(list_filter(tokens, x -> x IN ('the','a','of','and'))) AS h_en,
           len(list_filter(tokens, x -> x IN ('el','la','de','y'))) AS h_es,
           len(list_filter(tokens, x -> x IN ('le','la','et','les'))) AS h_fr
        FROM toks
    ), lang AS (
        SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                ELSE 'de' END AS lang_guess
        FROM hits
    ), keepers AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), sigs AS (
        SELECT doc_id, {_T.minhash_sig_duck(12)} AS sig
        FROM (SELECT doc_id, list_distinct(tokens) AS shingles FROM toks)
    ), buckets AS (
        SELECT doc_id, b.band_id,
               array_to_string(sig[b.band_id * 3 + 1 : b.band_id * 3 + 3], '-') AS band_sig
        FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS band_id) b
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a
        JOIN buckets b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                      AND a.doc_id < b.doc_id
    ), losers AS (
        SELECT DISTINCT cand.doc_b AS doc_id
        FROM cand
        JOIN sigs sa ON sa.doc_id = cand.doc_a
        JOIN sigs sb ON sb.doc_id = cand.doc_b
        WHERE len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) >= 9
    )
    SELECT q.doc_id, q.n_tokens, q.score_r4
    FROM q
    JOIN lang ON q.doc_id = lang.doc_id
    WHERE lang.lang_guess = 'en' AND q.score_r4 >= 0.5
      AND q.doc_id IN (SELECT doc_id FROM keepers)
      AND q.doc_id NOT IN (SELECT doc_id FROM losers)
"""


@query("pipeline_clean_corpus", oracle=_CLEAN_CORPUS_ORACLE)
def q_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data pipeline: quality gate → language gate →
    exact-dup keepers → near-dup removal, one declarative plan."""
    from userbehavioranalysis_spark.operators.pipeline import clean_corpus

    return clean_corpus(_tables(spark, sf_dir)["documents"])


_SUBSTRING_ORACLE = f"""
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents
    ), sp AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   {_T.shingles_duck(8)},
                   x -> {_T.h64_duck('x')}))) AS span_h
        FROM tok
    ), df AS (
        SELECT span_h, CAST(count(*) AS BIGINT) AS span_df FROM sp GROUP BY 1
    ), per_doc AS (
        SELECT sp.doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(CASE WHEN df.span_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_shared_spans
        FROM sp JOIN df USING (span_h)
        GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(p.n_spans, 0) AS n_spans,
           coalesce(p.n_shared_spans, 0) AS n_shared_spans,
           coalesce(round(p.n_shared_spans / p.n_spans, 4), 0.0)
               AS dup_span_ratio_r4,
           CAST(coalesce(round(p.n_shared_spans / p.n_spans, 4) >= 0.5, false)
                AS INTEGER) AS flagged
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


@query("dedup_substring_spans", oracle=_SUBSTRING_ORACLE)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span duplication (Lee et al. method family):
    flags documents sharing verbatim 8-token spans with the rest of the
    corpus — catches boilerplate/quotation that whole-doc similarity
    sketches miss."""
    from userbehavioranalysis_spark.operators.dedup import substring_spans

    return substring_spans(_tables(spark, sf_dir)["documents"])


_WH0 = "list_transform(toks, w -> ('0x' || substr(md5('0#' || w), 1, 15))::BIGINT)"


_WH1 = "list_transform(toks, w -> ('0x' || substr(md5('1#' || w), 1, 15))::BIGINT)"


@query(
    "dedup_simhash_wide",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, list_distinct({_T.TOKENS_DUCK}) AS toks FROM documents
    ),
    h AS (
        SELECT doc_id, {_WH0} AS wh0, {_WH1} AS wh1 FROM t
    ),
    sk AS (
        SELECT doc_id,
               {_T.simhash_duck(60, 'wh0')} AS sh0,
               {_T.simhash_duck(60, 'wh1')} AS sh1
        FROM h
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1))
                AS INTEGER) AS hamming
    FROM sk a JOIN sk b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) <= 8
    """,
)
def q_dedup_simhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide (120-bit, 2x60 fully-informative h64 bits) SimHash near-dup pairs — the stated scale path
    for the 63-bit pigeonhole blocking, whose 7-bit segments collide
    every 2⁷ sketches (~n²/2⁷ candidates; >79 GB spill measured at
    500k docs).  14-bit segments cut random candidates 2⁷×."""
    from userbehavioranalysis_spark.operators.dedup import simhash_wide_pairs

    return simhash_wide_pairs(_tables(spark, sf_dir)["documents"])


@query(
    "dedup_clusters_wide",
    oracle=f"""
    WITH RECURSIVE t AS (
        SELECT doc_id, list_distinct({_T.TOKENS_DUCK}) AS toks FROM documents
    ),
    h AS (
        SELECT doc_id, {_WH0} AS wh0, {_WH1} AS wh1 FROM t
    ),
    sk AS (
        SELECT doc_id,
               {_T.simhash_duck(60, 'wh0')} AS sh0,
               {_T.simhash_duck(60, 'wh1')} AS sh1
        FROM h
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sk a JOIN sk b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sh0, b.sh0)) + bit_count(xor(a.sh1, b.sh1)) <= 8
    ), edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), reach AS (
        SELECT a AS doc, a AS r FROM edges
        UNION
        SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.doc
    )
    SELECT doc AS doc_id, min(r) AS cluster_id,
           (doc = min(r)) AS is_canonical
    FROM reach GROUP BY doc
    """,
)
def q_dedup_clusters_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop clustering step over WIDE-simhash edges — the
    end-to-end 100 TB path: 120-bit sketches keep the candidate join
    ~n·dup_density instead of the 63-bit n²/2⁷ wall, and the
    pointer-jumping components consume whatever edge set they are
    given, so the pair generator is the only scale-sensitive stage."""
    from userbehavioranalysis_spark.operators.dedup import simhash_wide_pairs

    pairs = simhash_wide_pairs(_tables(spark, sf_dir)["documents"])
    return _dedup.dedup_clusters(pairs)


@query(
    "dedup_embedding_lsh",
    oracle=f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve,
               sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * 1000000) AS BIGINT)) AS qint
        FROM embeddings
    ), planes AS (
        SELECT * FROM (VALUES {_sim._planes_duck_values(128)}) t(p, pl)
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
        SELECT vec_id, p // 16 AS band,
               CAST(sum(CASE WHEN dot > 0 THEN (1 << (p % 16)) ELSE 0 END) AS BIGINT) AS band_val
        FROM dots GROUP BY vec_id, p // 16
    ), cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_val = b.band_val AND a.vec_id < b.vec_id
    )
    SELECT cand.vec_a, cand.vec_b
    FROM cand JOIN v a ON a.vec_id = cand.vec_a
              JOIN v b ON b.vec_id = cand.vec_b
    WHERE list_sum(list_transform(range(1, len(a.ve) + 1), i -> a.ve[i] * b.ve[i]))
          >= a.nrm * b.nrm * 0.4
    """,
)
def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-quadratic embedding near-dup pairs: banded hyperplane LSH
    candidates (integer-exact signatures → deterministic, hash-checkable
    unlike sampled ANN) + exact cosine verify within candidates — the
    100 TB path beside the exact-but-O(n²) dedup_embedding_cosine."""
    return _dedup.embedding_dedup_lsh(_tables(spark, sf_dir)["embeddings"])


@query(
    "dedup_incremental",
    oracle=_minhash_oracle(
        incremental_split=("doc_id % 2 = 0", "doc_id % 2 = 1"), min_match=6
    ),
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a NEW batch (odd doc_ids) against the
    EXISTING corpus (even doc_ids) via the banded-MinHash index — the
    daily-refresh shape where only the delta's signatures are computed
    and the corpus index is the persisted artifact
    (operators/dedup.minhash_incremental_matches)."""
    docs = _tables(spark, sf_dir)["documents"]
    return _dedup.minhash_incremental_matches(
        docs.filter(_F.col("doc_id") % 2 == 0),
        docs.filter(_F.col("doc_id") % 2 == 1),
    )


@query(
    "dedup_incremental_capped",
    oracle=_minhash_oracle(
        max_bucket=32,
        incremental_split=("doc_id % 2 = 0", "doc_id % 2 = 1"),
        min_match=6,
    ),
)
def q_dedup_incremental_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production form of dedup_incremental: corpus-side band
    buckets capped at 32 docs (a boilerplate mega-bucket fans every
    matching new doc into |bucket| candidates; the cap bounds the probe
    at O(batch · cap) — measured 1.5× wall at 100× data against a 92×
    output, BASELINE.md round-5 additions)."""
    docs = _tables(spark, sf_dir)["documents"]
    return _dedup.minhash_incremental_matches(
        docs.filter(_F.col("doc_id") % 2 == 0),
        docs.filter(_F.col("doc_id") % 2 == 1),
        max_bucket=32,
    )


@query(
    "dedup_incremental_indexed",
    oracle=_minhash_oracle(
        max_bucket=32,
        incremental_split=("doc_id % 2 = 0", "doc_id % 2 = 1"),
        min_match=6,
    ),
)
def q_dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_incremental_capped probing a PERSISTED parquet band index
    (operators/dedup.minhash_index_write): corpus signatures + band
    buckets Hive-partitioned by (band_id, sig_shard), built once and
    cached across calls; the probe turns the batch's observed shards
    into partition-pruning predicates (PartitionFilters asserted in
    tests/test_plans.py).  Same capped semantics, same oracle — hash
    equality proves the persisted path end-to-end."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches_indexed,
        minhash_index_write,
    )

    docs = _tables(spark, sf_dir)["documents"]
    key = (sf_dir, "minhash-index")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "buckets")):
        stage = tempfile.mkdtemp(prefix="uba_minhash_index_")
        minhash_index_write(
            docs.filter(_F.col("doc_id") % 2 == 0),
            os.path.join(stage, "index"),
            max_bucket=32,
        )
        _STREAM_STAGE_CACHE[key] = stage
    return minhash_incremental_matches_indexed(
        docs.filter(_F.col("doc_id") % 2 == 1), os.path.join(stage, "index")
    )


@query(
    "dedup_incremental_index_append",
    oracle=_minhash_oracle(
        incremental_split=("doc_id % 2 = 0", "doc_id % 2 = 1"), min_match=6
    ),
)
def q_dedup_incremental_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE proof: the corpus index is written from HALF
    the corpus (doc_id % 4 == 0), the other half (% 4 == 2) is
    APPENDED (operators/dedup.minhash_index_append — new parquet files
    into the same partition layout, no rewrite), and the probe of the
    appended index must hash-equal the one-shot index over the full
    corpus — the same full SQL oracle as dedup_incremental.  This is
    the daily loop's closing step: gate → dedup → append survivors, so
    tomorrow's delta probes today's corpus.  Uncapped on both write and
    append (the cap is a rewrite-time property; see the operator
    docstring)."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches_indexed,
        minhash_index_append,
        minhash_index_write,
    )

    docs = _tables(spark, sf_dir)["documents"]
    key = (sf_dir, "minhash-index-append")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "buckets")):
        stage = tempfile.mkdtemp(prefix="uba_minhash_idx_app_")
        minhash_index_write(
            docs.filter(_F.col("doc_id") % 4 == 0), os.path.join(stage, "index")
        )
        minhash_index_append(
            docs.filter(_F.col("doc_id") % 4 == 2), os.path.join(stage, "index")
        )
        _STREAM_STAGE_CACHE[key] = stage
    return minhash_incremental_matches_indexed(
        docs.filter(_F.col("doc_id") % 2 == 1), os.path.join(stage, "index")
    )


@query(
    "dedup_incremental_index_compact",
    oracle=_minhash_oracle(
        max_bucket=32,
        incremental_split=("doc_id % 2 = 0", "doc_id % 2 = 1"),
        min_match=6,
    ),
)
def q_dedup_incremental_index_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index COMPACTION proof (operators/dedup.minhash_index_compact —
    the LSM re-cap rewrite): an UNCAPPED index is written from half
    the corpus (doc_id % 4 == 0), the other half appended (appends
    never re-evaluate the cap, so buckets drift past any limit), then
    compacted with max_bucket=32 — after which the probe must
    hash-equal a fresh CAPPED one-shot index over the full even
    corpus, i.e. exactly dedup_incremental_indexed's oracle.  This is
    the periodic-rewrite step the append docstring promises, made
    first-class and pinned."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.dedup import (
        minhash_incremental_matches_indexed,
        minhash_index_append,
        minhash_index_compact,
        minhash_index_write,
    )

    docs = _tables(spark, sf_dir)["documents"]
    key = (sf_dir, "minhash-index-compact")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "buckets")):
        stage = tempfile.mkdtemp(prefix="uba_minhash_idx_cmp_")
        minhash_index_write(
            docs.filter(_F.col("doc_id") % 4 == 0), os.path.join(stage, "index")
        )
        minhash_index_append(
            docs.filter(_F.col("doc_id") % 4 == 2), os.path.join(stage, "index")
        )
        minhash_index_compact(os.path.join(stage, "index"), max_bucket=32)
        _STREAM_STAGE_CACHE[key] = stage
    return minhash_incremental_matches_indexed(
        docs.filter(_F.col("doc_id") % 2 == 1), os.path.join(stage, "index")
    )


_INCR_REFRESH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, {_T.TOKENS_DUCK} AS tokens FROM documents
    ), q AS (
        SELECT doc_id, CAST(len(tokens) AS BIGINT) AS n_tokens,
               round(least(len(tokens)::DOUBLE / 100, 1.0) * 0.5
                     + (1.0 - len(list_filter(tokens, x -> x IN ('the','a','of','and')))::DOUBLE
                              / len(tokens)) * 0.5, 4) AS score_r4
        FROM toks WHERE doc_id % 2 = 1
    ), hits AS (
        SELECT doc_id,
           len(list_filter(tokens, x -> x IN ('der','die','und','das'))) AS h_de,
           len(list_filter(tokens, x -> x IN ('the','a','of','and'))) AS h_en,
           len(list_filter(tokens, x -> x IN ('el','la','de','y'))) AS h_es,
           len(list_filter(tokens, x -> x IN ('le','la','et','les'))) AS h_fr
        FROM toks WHERE doc_id % 2 = 1
    ), lang AS (
        SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                ELSE 'de' END AS lang_guess
        FROM hits
    ), keepers AS (
        SELECT min(doc_id) AS doc_id FROM documents WHERE doc_id % 2 = 1
        GROUP BY md5(text)
    ), corpus_exact_losers AS (
        SELECT doc_id FROM documents
        WHERE doc_id % 2 = 1 AND md5(text) IN (
            SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)
    ), sigs AS (
        SELECT doc_id, {_T.minhash_sig_duck(12)} AS sig
        FROM (SELECT doc_id, list_distinct(tokens) AS shingles FROM toks)
    ), buckets AS (
        SELECT doc_id, b.band_id,
               array_to_string(sig[b.band_id * 3 + 1 : b.band_id * 3 + 3], '-')
                   AS band_sig
        FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS band_id) b
    ), self_losers AS (
        SELECT DISTINCT c.doc_b AS doc_id
        FROM (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM buckets a
            JOIN buckets b ON a.band_id = b.band_id AND a.band_sig = b.band_sig
                          AND a.doc_id < b.doc_id
            WHERE a.doc_id % 2 = 1 AND b.doc_id % 2 = 1
        ) c
        JOIN sigs sa ON sa.doc_id = c.doc_a
        JOIN sigs sb ON sb.doc_id = c.doc_b
        WHERE len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) >= 9
    ), cross_losers AS (
        SELECT DISTINCT c.new_doc_id AS doc_id
        FROM (
            SELECT DISTINCT bn.doc_id AS new_doc_id, bc.doc_id AS corpus_doc_id
            FROM buckets bn
            JOIN buckets bc ON bn.band_id = bc.band_id
                           AND bn.band_sig = bc.band_sig
            WHERE bn.doc_id % 2 = 1 AND bc.doc_id % 2 = 0
        ) c
        JOIN sigs sa ON sa.doc_id = c.new_doc_id
        JOIN sigs sb ON sb.doc_id = c.corpus_doc_id
        WHERE len(list_filter(range(1, 13), i -> sa.sig[i] = sb.sig[i])) >= 9
    )
    SELECT q.doc_id, q.n_tokens, q.score_r4
    FROM q
    JOIN lang ON q.doc_id = lang.doc_id
    WHERE lang.lang_guess = 'en' AND q.score_r4 >= 0.5
      AND q.doc_id IN (SELECT doc_id FROM keepers)
      AND q.doc_id NOT IN (SELECT doc_id FROM corpus_exact_losers)
      AND q.doc_id NOT IN (SELECT doc_id FROM self_losers)
      AND q.doc_id NOT IN (SELECT doc_id FROM cross_losers)
"""


@query("pipeline_incremental_refresh", oracle=_INCR_REFRESH_ORACLE)
def q_pipeline_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed daily-refresh loop (pipeline.incremental_refresh):
    a new batch (odd doc_ids) is quality- and language-gated, exact-
    deduped against itself AND the existing corpus (even doc_ids), then
    near-dup-probed against the corpus band index — the full SQL oracle
    replays every stage, so the hash pins the composition end-to-end,
    not just the parts."""
    from userbehavioranalysis_spark.operators.pipeline import incremental_refresh

    docs = _tables(spark, sf_dir)["documents"]
    return incremental_refresh(
        docs.filter(_F.col("doc_id") % 2 == 0),
        docs.filter(_F.col("doc_id") % 2 == 1),
    )


def _emb_incr_oracle(
    max_bucket: int | None = None, sequential_batches: int | None = None
) -> str:
    """Oracle builder for incremental embedding dedup — shared by the
    in-memory, persisted-index, index-append, and capped forms (the
    first three must hash-equal the uncapped build; equality across
    them IS the persistence proof).  ``max_bucket`` replicates the
    corpus-side hot-bucket cap of ``embedding_index_write`` with the
    identical windowed bucket-size filter.

    ``sequential_batches=n`` generates the STREAMING-refresh variant:
    the delta arrives in n tertile micro-batches (batch of delta
    vec_id v = ((v - 10000000) // 16) % n) and each batch's vectors
    are APPENDED to the index after its probe — so batch i's
    candidates may also come from deltas of batches 0..i-1.  The
    corpus side of the candidate join then admits a delta vector c
    exactly when batch(c) < batch(n): the sequential append semantics,
    stated as one pair predicate instead of n unrolled rounds."""
    corpus_bands = "SELECT * FROM bands WHERE vec_id < 10000000"
    pair_pred = ""
    if sequential_batches is not None:
        assert max_bucket is None, "sequential oracle models the uncapped index"
        corpus_bands = "SELECT * FROM bands"
        pair_pred = f"""
          AND (c.vec_id < 10000000
               OR ((c.vec_id - 10000000) // 16) % {sequential_batches}
                  < ((n.vec_id - 10000000) // 16) % {sequential_batches})"""
    if max_bucket is not None:
        corpus_bands = f"""SELECT vec_id, band, band_val FROM (
            SELECT *, count(*) OVER (PARTITION BY band, band_val) AS bsz
            FROM bands WHERE vec_id < 10000000
        ) WHERE bsz <= {max_bucket}"""
    return f"""
    WITH vc AS (
        SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings
    ), vb AS (
        -- the derived delta: every 16th vector re-crawled with its
        -- first dimension zeroed (a deterministic near-dup both
        -- engines construct identically)
        SELECT vec_id + 10000000 AS vec_id,
               list_transform(range(1, len(e) + 1),
                              i -> CASE WHEN i = 1 THEN 0.0 ELSE e[i] END) AS ve
        FROM (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
              WHERE vec_id % 16 = 0)
    ), allv AS (
        SELECT * FROM vc UNION ALL SELECT * FROM vb
    ), v AS (
        SELECT vec_id, ve,
               sqrt(list_sum(list_transform(ve, x -> x * x))) AS nrm,
               list_transform(ve, x -> CAST(round(x * 1000000) AS BIGINT)) AS qint
        FROM allv
    ), planes AS (
        SELECT * FROM (VALUES {_sim._planes_duck_values(128)}) t(p, pl)
    ), dots AS (
        SELECT vec_id, planes.p,
               list_sum(list_transform(range(0, len(qint)),
                   d -> qint[d + 1] * planes.pl[d + 1])) AS dot
        FROM v CROSS JOIN planes
    ), bands AS (
        SELECT vec_id, p // 16 AS band,
               CAST(sum(CASE WHEN dot > 0 THEN (1 << (p % 16)) ELSE 0 END) AS BIGINT) AS band_val
        FROM dots GROUP BY vec_id, p // 16
    ), cbands AS (
        {corpus_bands}
    ), cand AS (
        SELECT DISTINCT n.vec_id AS new_vec_id, c.vec_id AS corpus_vec_id
        FROM bands n JOIN cbands c
          ON n.band = c.band AND n.band_val = c.band_val
        WHERE n.vec_id >= 10000000{pair_pred}
    )
    SELECT cand.new_vec_id, cand.corpus_vec_id
    FROM cand JOIN v a ON a.vec_id = cand.new_vec_id
              JOIN v b ON b.vec_id = cand.corpus_vec_id
    WHERE list_sum(list_transform(range(1, len(a.ve) + 1), i -> a.ve[i] * b.ve[i]))
          >= a.nrm * b.nrm * 0.4
    """


_EMB_INCR_ORACLE = _emb_incr_oracle()


def _emb_delta(emb) -> DataFrame:
    """The deterministic embedding delta every incremental-embedding
    query shares: every 16th vector 're-crawled' with its first
    dimension zeroed — a constructed near-dup both engines derive
    identically (the natural corpus has ~no cross-vector near-dups at
    the 0.4 threshold)."""
    return emb.filter(_F.col("vec_id") % 16 == 0).select(
        (_F.col("vec_id") + 10000000).alias("vec_id"),
        _F.expr(
            "transform(embedding,"
            " (x, i) -> case when i = 0 then cast(0.0 as float) else x end)"
        ).alias("embedding"),
    )


@query("dedup_embedding_incremental", oracle=_EMB_INCR_ORACLE)
def q_dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING dedup: a derived delta (every 16th vector
    "re-crawled" with one zeroed dimension — a deterministic near-dup
    both engines construct identically; the natural corpus has ~no
    cross-vector near-dups at this threshold) matched against the full
    corpus via banded hyperplane LSH — the semantic-dedup sibling of
    dedup_incremental, completing the incremental family across
    modalities.  Only the delta is signed fresh; the corpus band table
    is the persisted artifact (the SAME integer-exact signatures the
    ANN index stores, so dedup probe and vector store share one signing
    scheme).  Deterministic candidates + exact cosine => full SQL
    replay; 31 of the 32 sf0.01 delta vectors match their source
    through >=1 surviving band.  NOTE: this form re-signs the corpus
    per call (the in-memory baseline); the production steady state is
    dedup_embedding_incremental_indexed below."""
    emb = _tables(spark, sf_dir)["embeddings"]
    return _dedup.embedding_dedup_incremental(emb, _emb_delta(emb))


@query("dedup_embedding_incremental_indexed", oracle=_EMB_INCR_ORACLE)
def q_dedup_embedding_incremental_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """dedup_embedding_incremental probing a PERSISTED parquet band
    index (operators/dedup.embedding_index_write): corpus vectors +
    hyperplane band signatures Hive-partitioned by (band, band_shard),
    built once and cached across calls; the probe turns the delta's
    observed shards into partition-pruning predicates (PartitionFilters
    asserted in tests/test_plans.py).  Same semantics, same oracle as
    the in-memory form — hash equality proves the persisted path
    end-to-end, and the sf100 probe wall decouples from the O(corpus)
    signature fold the in-memory form pays per call."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_incremental_indexed,
        embedding_index_write,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    key = (sf_dir, "embedding-index")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "bands")):
        stage = tempfile.mkdtemp(prefix="uba_emb_index_")
        embedding_index_write(emb, os.path.join(stage, "index"))
        _STREAM_STAGE_CACHE[key] = stage
    return embedding_dedup_incremental_indexed(
        _emb_delta(emb), os.path.join(stage, "index")
    )


@query("dedup_embedding_incremental_capped", oracle=_emb_incr_oracle(max_bucket=1))
def q_dedup_embedding_incremental_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The capped form of the persisted embedding probe: the index is
    written with the (band, band_val) hot-bucket guard
    (embedding_index_write max_bucket), so boilerplate/near-zero
    vectors whose band values concentrate can never fan a colliding
    delta vector into O(bucket) candidates — the same O(delta · cap)
    bound the minhash family's capped index gives, now on the
    embedding side.  The synthetic corpus is bucket-flat by
    construction (max natural bucket = 2 at the driver scales), so the
    registered cap is 1 — the only value that BITES here — and the
    oracle replicates the identical windowed bucket-size filter;
    behavior on a constructed hot bucket (a repeated boilerplate
    vector) is pinned separately in tests/test_plans.py."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_incremental_indexed,
        embedding_index_write,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    key = (sf_dir, "embedding-index-capped")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "bands")):
        stage = tempfile.mkdtemp(prefix="uba_emb_index_cap_")
        embedding_index_write(emb, os.path.join(stage, "index"), max_bucket=1)
        _STREAM_STAGE_CACHE[key] = stage
    return embedding_dedup_incremental_indexed(
        _emb_delta(emb), os.path.join(stage, "index")
    )


@query("dedup_embedding_index_append", oracle=_EMB_INCR_ORACLE)
def q_dedup_embedding_index_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-index MAINTENANCE proof (mirror of
    dedup_incremental_index_append): the band index is written from
    HALF the corpus (even vec_ids), the other half is APPENDED
    (operators/dedup.embedding_index_append — new parquet files into
    the same (band, band_shard) layout, no rewrite), and the delta
    probe of the appended index must hash-equal the same full-corpus
    SQL oracle as the one-shot index — the closing step of the
    embedding-side daily loop."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.dedup import (
        embedding_dedup_incremental_indexed,
        embedding_index_append,
        embedding_index_write,
    )

    emb = _tables(spark, sf_dir)["embeddings"]
    key = (sf_dir, "embedding-index-append")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "bands")):
        stage = tempfile.mkdtemp(prefix="uba_emb_idx_app_")
        embedding_index_write(
            emb.filter(_F.col("vec_id") % 2 == 0), os.path.join(stage, "index")
        )
        embedding_index_append(
            emb.filter(_F.col("vec_id") % 2 == 1), os.path.join(stage, "index")
        )
        _STREAM_STAGE_CACHE[key] = stage
    return embedding_dedup_incremental_indexed(
        _emb_delta(emb), os.path.join(stage, "index")
    )
