"""Text-analysis and curation queries over the documents table."""
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


_LANGID_ORACLE = """
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents
    ), hits AS (
        SELECT doc_id,
           len(list_filter(tokens, x -> x IN ('der','die','und','das'))) AS h_de,
           len(list_filter(tokens, x -> x IN ('the','a','of','and'))) AS h_en,
           len(list_filter(tokens, x -> x IN ('el','la','de','y'))) AS h_es,
           len(list_filter(tokens, x -> x IN ('le','la','et','les'))) AS h_fr
        FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
                WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
                WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
                WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
                ELSE 'de' END AS lang_guess,
           CAST(greatest(h_de, h_en, h_es, h_fr) AS INTEGER) AS marker_hits
    FROM hits
"""


@query("language_id", oracle=_LANGID_ORACLE)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from userbehavioranalysis_spark.operators.text_analysis import language_id

    return language_id(_tables(spark, sf_dir)["documents"])


@query(
    "pii_redact",
    oracle="""
    WITH seeded AS (
        SELECT doc_id,
               text || CASE doc_id % 3
                   WHEN 0 THEN ' contact: user' || doc_id::VARCHAR || '@example.com'
                   WHEN 1 THEN ' from 10.0.' || (doc_id % 200)::VARCHAR || '.'
                               || (doc_id % 250)::VARCHAR
                   ELSE '' END AS text
        FROM documents
    ), red AS (
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(text,
                   '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}')) AS n_ips,
               regexp_replace(regexp_replace(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}', '<IP>', 'g') AS redacted
        FROM seeded
    )
    SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails, CAST(n_ips AS BIGINT) AS n_ips,
           CAST(length(redacted) AS BIGINT) AS redacted_len,
           md5(redacted) AS redacted_md5
    FROM red
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub demo over a deterministically seeded dirty corpus: the
    synthetic documents carry no natural PII, so every 3rd doc gets an
    email and every 3rd an IPv4 appended (derived from doc_id — the
    oracle seeds identically), then the generic redactor counts and
    masks them.  Hash-checked down to the md5 of the redacted text."""
    import pyspark.sql.functions as F

    from userbehavioranalysis_spark.operators.text_analysis import pii_redact

    docs = _tables(spark, sf_dir)["documents"]
    seeded = docs.withColumn(
        "text",
        F.expr(
            "concat(text, CASE cast(doc_id % 3 AS int)"
            " WHEN 0 THEN concat(' contact: user', doc_id, '@example.com')"
            " WHEN 1 THEN concat(' from 10.0.', doc_id % 200, '.', doc_id % 250)"
            " ELSE '' END)"
        ),
    )
    return pii_redact(seeded)


@query(
    "curate_sample",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, text,
               regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents
    ), q AS (
        SELECT doc_id,
               round(least(len(tokens)::DOUBLE / 100, 1.0) * 0.5
                     + (1.0 - len(list_filter(tokens, x -> x IN ('the','a','of','and')))::DOUBLE
                              / len(tokens)) * 0.5, 4) AS score_r4
        FROM t
    ), g AS (
        SELECT doc_id, lang FROM t WHERE substr(md5(text), 1, 2) <= '28'
    )
    SELECT doc_id, lang, score_r4, CAST(lang_rank AS INTEGER) AS lang_rank
    FROM (
        SELECT g.doc_id, g.lang, q.score_r4,
               row_number() OVER (PARTITION BY g.lang
                                  ORDER BY q.score_r4 DESC, g.doc_id ASC) AS lang_rank
        FROM g JOIN q USING (doc_id)
    ) WHERE lang_rank <= 25
    """,
)
def q_curate_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-slice assembly: reproducible md5-prefix ~16 %
    sample gate (content-hash sampling, no rand()) then a per-language
    quality-ranked cap of 25 docs."""
    from userbehavioranalysis_spark.operators.text_analysis import curate_sample

    return curate_sample(_tables(spark, sf_dir)["documents"])


@query(
    "token_topk",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
        FROM documents
    )
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from userbehavioranalysis_spark.operators.text_analysis import token_topk

    return token_topk(_tables(spark, sf_dir)["documents"])


_REP_DUP_DUCK = """CASE WHEN len(bigrams) = 0 THEN 0.0
                ELSE round(1.0 - len(list_distinct(bigrams))::DOUBLE / len(bigrams), 4)
           END"""


_REP_TOP_DUCK = """round(list_max(list_transform(list_distinct(tokens),
                     t2 -> len(list_filter(tokens, x -> x = t2))))::DOUBLE
                 / len(tokens), 4)"""


@query(
    "repetition_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_T.TOKENS_DUCK} AS tokens FROM documents
    ), b AS (
        SELECT doc_id, tokens, {_T.shingles_duck(2)} AS bigrams FROM t
    ), m AS (
        SELECT doc_id,
               {_REP_DUP_DUCK} AS dup,
               {_REP_TOP_DUCK} AS top
        FROM b
    )
    SELECT doc_id, dup AS dup_bigram_ratio_r4, top AS top_token_ratio_r4,
           CAST(CASE WHEN dup > 0.2 OR top > 0.3 THEN 1 ELSE 0 END AS INTEGER) AS flagged
    FROM m
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-doc repetition filters: duplicate-bigram
    ratio + most-common-token fraction, flagged at the conventional
    0.2/0.3 thresholds.  Map-only higher-order functions."""
    from userbehavioranalysis_spark.operators.text_analysis import repetition_score

    return repetition_score(_tables(spark, sf_dir)["documents"])


# Shared by the in-memory and persisted-fingerprint decontamination
# forms — hash equality across the two IS the persistence proof.
_DECONTAMINATE_ORACLE = f"""
    WITH t AS (
        SELECT doc_id, {_T.TOKENS_DUCK} AS tokens FROM documents
    ), s AS (
        SELECT doc_id,
               list_distinct(list_transform({_T.shingles_duck(3)},
                                            x -> {_T.h64_duck('x')})) AS hs
        FROM t
    ), e AS (
        SELECT doc_id, unnest(hs) AS h FROM s
    ), b AS (
        SELECT DISTINCT h FROM e WHERE doc_id % 17 = 0
    ), hits AS (
        SELECT e.doc_id, count(*) AS n FROM e JOIN b USING (h)
        WHERE e.doc_id % 17 <> 0 GROUP BY 1
    )
    SELECT s.doc_id,
           CAST(coalesce(hits.n, 0) AS BIGINT) AS n_hit_shingles,
           CAST(CASE WHEN coalesce(hits.n, 0) > 0 THEN 1 ELSE 0 END AS INTEGER)
               AS contaminated
    FROM s LEFT JOIN hits ON s.doc_id = hits.doc_id
    WHERE s.doc_id % 17 <> 0
    """


@query("decontaminate", oracle=_DECONTAMINATE_ORACLE)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: corpus docs scored by distinct 3-gram
    overlap with the held-out benchmark slice (doc_id % 17 == 0); the
    benchmark shingle-hash set is broadcast, so the corpus side never
    shuffles for the membership test."""
    from userbehavioranalysis_spark.operators.text_analysis import decontaminate

    return decontaminate(_tables(spark, sf_dir)["documents"])


@query("decontaminate_indexed", oracle=_DECONTAMINATE_ORACLE)
def q_decontaminate_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontaminate probing a PERSISTED benchmark fingerprint
    (operators/text_analysis.benchmark_index_write): the benchmark
    slice's distinct shingle hashes are written once with a shingle-k
    manifest, and each scrub broadcasts the stored set against a
    freshly-shingled corpus — the per-snapshot steady state
    (benchmarks change rarely; the corpus is re-scrubbed per
    snapshot).  Same split, same output, same full SQL oracle as
    decontaminate — hash equality proves the persisted path."""
    import os
    import tempfile

    from userbehavioranalysis_spark.operators.text_analysis import (
        benchmark_index_write,
        decontaminate_indexed,
    )

    docs = _tables(spark, sf_dir)["documents"]
    key = (sf_dir, "benchmark-index")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "index", "shingles")):
        stage = tempfile.mkdtemp(prefix="uba_bench_index_")
        benchmark_index_write(
            docs.filter(_F.col("doc_id") % 17 == 0), os.path.join(stage, "index")
        )
        _STREAM_STAGE_CACHE[key] = stage
    return decontaminate_indexed(
        docs.filter(_F.col("doc_id") % 17 != 0), os.path.join(stage, "index")
    )


@query(
    "mixture_sample",
    oracle=f"""
    SELECT * FROM (
        SELECT doc_id, source,
               CAST({_T.h64_duck("source || '#' || doc_id::VARCHAR")} % 1000
                    AS INTEGER) AS bucket,
               CAST(100 + {_T.h64_duck('source')} % 800 AS INTEGER) AS permille
        FROM documents
    ) WHERE bucket < permille
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling: per-source deterministic keep-rate
    (md5 threshold, no rand()) — the zero-shuffle map-side filter that
    re-weights a corpus toward a target domain blend."""
    from userbehavioranalysis_spark.operators.text_analysis import mixture_sample

    return mixture_sample(_tables(spark, sf_dir)["documents"])


@query(
    "split_assign",
    oracle=f"""
    SELECT doc_id, lang,
           CAST({_T.h64_duck('text')} % 1000 AS INTEGER) AS bucket,
           CASE WHEN {_T.h64_duck('text')} % 1000 < 10 THEN 'val'
                WHEN {_T.h64_duck('text')} % 1000 < 20 THEN 'test'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-proof train/val/test assignment: content-hash buckets, so
    exact duplicates share a split and reruns never reshuffle docs."""
    from userbehavioranalysis_spark.operators.text_analysis import split_assign

    return split_assign(_tables(spark, sf_dir)["documents"])


@query(
    "doc_rarity",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, list_distinct({_T.TOKENS_DUCK}) AS toks FROM documents
    ), e AS (
        SELECT doc_id, unnest(toks) AS token FROM t
    ), df AS (
        SELECT token, count(*) AS df FROM e GROUP BY 1
    ), agg AS (
        SELECT e.doc_id, count(*) AS n, sum(df.df) AS sum_df
        FROM e JOIN df USING (token) GROUP BY 1
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_distinct_tokens,
           CAST(sum_df AS BIGINT) AS sum_df,
           round(sum_df::DOUBLE / n, 4) AS mean_df_r4
    FROM agg
    """,
)
def q_doc_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style rarity: corpus DF table joined back per doc, exact
    integer sums both passes."""
    from userbehavioranalysis_spark.operators.text_analysis import doc_rarity

    return doc_rarity(_tables(spark, sf_dir)["documents"])


@query(
    "pack_shards",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text,
                   '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
           CAST((cum - n_tokens) // 2000 AS INTEGER) AS shard
    FROM (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
        FROM t
    )
    """,
)
def q_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing via per-source running sums — the
    deterministic, distributable form of pre-training file packing."""
    from userbehavioranalysis_spark.operators.text_analysis import pack_shards

    return pack_shards(_tables(spark, sf_dir)["documents"])


@query(
    "pack_sequences",
    oracle="""
    WITH t AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(text,
                   '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_first,
           CAST((cum - 1) // 512 AS BIGINT) AS seq_last,
           CAST((cum - n_tokens) % 512 AS BIGINT) AS seq_offset
    FROM (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
        FROM t
    )
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style continuous-concatenation sequence packing: map each doc
    onto the fixed-length training sequences its tokens land in (docs
    straddle cuts), per source — the loader-metadata step after shard
    layout.  Same one-window shape as pack_shards."""
    from userbehavioranalysis_spark.operators.text_analysis import pack_sequences

    return pack_sequences(_tables(spark, sf_dir)["documents"])


@query(
    "length_quantiles",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 4) AS p50_r4,
           round(quantile_cont(n_chars, 0.9), 4) AS p90_r4,
           round(quantile_cont(n_chars, 0.99), 4) AS p99_r4
    FROM documents GROUP BY lang
    """,
)
def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language length percentiles (linear interpolation in
    both engines; approx_percentile is the stated 100 TB variant)."""
    from userbehavioranalysis_spark.operators.text_analysis import length_quantiles

    return length_quantiles(_tables(spark, sf_dir)["documents"])


@query(
    "quality_score",
    oracle="""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(len(tokens) AS BIGINT) AS n_tokens,
           round(list_sum(list_transform(tokens, x -> length(x)::DOUBLE))
                 / len(tokens), 4) AS mean_token_len_r4,
           round(len(list_filter(tokens, x -> x IN ('the','a','of','and')))::DOUBLE
                 / len(tokens), 4) AS stopword_ratio_r4,
           round(least(len(tokens)::DOUBLE / 100, 1.0) * 0.5
                 + (1.0 - len(list_filter(tokens, x -> x IN ('the','a','of','and')))::DOUBLE
                          / len(tokens)) * 0.5, 4) AS score_r4
    FROM t
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from userbehavioranalysis_spark.operators.text_analysis import quality_score

    return quality_score(_tables(spark, sf_dir)["documents"])


@query(
    "unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
        FROM documents
    ), f AS (
        SELECT t, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY 1
    ), tot AS (
        SELECT sum(cnt) AS total FROM f
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(log2((SELECT total FROM tot)) - avg(log2(f.cnt)), 4) AS xent_r4
    FROM tok JOIN f USING (t)
    GROUP BY doc_id
    """,
)
def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/Gopher-style unigram cross-entropy quality proxy — the
    LM-perplexity stand-in a cleaning pipeline ranks documents by when
    no trained model is available.  Exact double math both engines;
    4-decimal rounding absorbs summation-order wobble."""
    from userbehavioranalysis_spark.operators.text_analysis import unigram_logprob

    return unigram_logprob(_tables(spark, sf_dir)["documents"])


@query(
    "token_counts",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\s]'))
                AS BIGINT) AS bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from userbehavioranalysis_spark.operators.text_analysis import token_counts

    return token_counts(_tables(spark, sf_dir)["documents"])


_FP_H64 = "('0x' || substr(md5(x), 1, 15))::BIGINT"


@query(
    "doc_fingerprints",
    oracle=f"""
    WITH s AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(tokens) - 4 + 2),
                             i -> array_to_string(tokens[i:i + 3], ' '))) AS shingles
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tokens
              FROM documents)
    )
    SELECT doc_id,
           array_to_string(list_sort(list_transform(shingles, x -> {_FP_H64}))[1:4], '-')
               AS fingerprint
    FROM s
    """,
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from userbehavioranalysis_spark.operators.text_analysis import fingerprints

    return fingerprints(_tables(spark, sf_dir)["documents"])


@query(
    "quality_gate",
    oracle="""
    WITH cuts AS (
        SELECT lang, round(quantile_cont(n_chars, 0.1), 4) AS cut_r4
        FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.lang, d.n_chars, c.cut_r4
    FROM documents d JOIN cuts c USING (lang)
    WHERE d.n_chars >= c.cut_r4
    """,
)
def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language percentile quality gate: each language's bottom
    decile by length is dropped against its OWN cutoff (broadcast of a
    one-row-per-language aggregate; the corpus never shuffles)."""
    from userbehavioranalysis_spark.operators.text_analysis import quality_gate

    return quality_gate(_tables(spark, sf_dir)["documents"])


@query("token_cms_estimates", oracle=_cms_oracle_sql())
def q_token_cms_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch token-frequency estimates vs exact counts —
    a sketch whose md5-derived hashes are portable, so (unusually) the
    whole sketch pipeline is value-hash-checkable cross-engine."""
    from userbehavioranalysis_spark.operators.sketches import (
        token_cms_estimates,
    )

    return token_cms_estimates(_tables(spark, sf_dir)["documents"])


@query(
    "importance_sample",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, text,
               regexp_split_to_array(trim(text), '\\s+') AS tokens
        FROM documents
    ),
    q AS (
        SELECT doc_id, lang, text,
               round(least(len(tokens)::DOUBLE / 100, 1.0) * 0.5
                     + (1.0 - len(list_filter(tokens,
                                x -> x IN ('the','a','of','and')))::DOUBLE
                              / len(tokens)) * 0.5, 4) AS score_r4
        FROM t
    )
    SELECT doc_id, lang, score_r4
    FROM q
    WHERE ('0x' || substr(md5(text), 1, 15))::BIGINT % 10000
          < CAST(round(score_r4 * 10000) AS INTEGER)
    """,
)
def q_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling: keep probability = quality score,
    drawn from the md5-of-content hash — deterministic, rand()-free."""
    from userbehavioranalysis_spark.operators.text_analysis import (
        importance_sample,
    )

    return importance_sample(_tables(spark, sf_dir)["documents"])


@query(
    "stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang ORDER BY md5(text), doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, lang, CAST(rk AS INTEGER) AS sample_rank
    FROM ranked WHERE rk <= 25
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language quota sample (25/lang), content-hash ordered —
    reproducible, ingestion-order-free, skew-safe via WindowGroupLimit."""
    from userbehavioranalysis_spark.operators.text_analysis import (
        stratified_sample,
    )

    return stratified_sample(_tables(spark, sf_dir)["documents"])


@query(
    "temperature_mixture",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY 1
    ),
    w AS (
        SELECT source, n_s,
               CAST(floor(1000.0 * sqrt(n_s)) AS BIGINT) AS w_s
        FROM counts
    ),
    s AS (SELECT sum(w_s) AS sum_w, sum(n_s) AS total FROM w),
    rates AS (
        SELECT source,
               CAST((CAST(1000 AS HUGEINT) * 500 * total * w_s)
                    // (CAST(sum_w AS HUGEINT) * n_s) AS BIGINT) AS rate_ppm
        FROM w CROSS JOIN s
    )
    SELECT d.doc_id, d.source, least(r.rate_ppm, 1000000) AS rate_ppm
    FROM documents d JOIN rates r USING (source)
    WHERE ({_T.h64_duck("d.source || '~' || d.doc_id")} % 1000000)
          < least(r.rate_ppm, 1000000)
    """,
)
def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced domain sampling (α=0.5): per-source keep
    rates derived from the corpus's own domain counts via integer-
    quantized weights — engine-exact despite the sqrt, because every
    division is integer floor-division."""
    from userbehavioranalysis_spark.operators.text_analysis import (
        temperature_mixture,
    )

    return temperature_mixture(_tables(spark, sf_dir)["documents"])


@query(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_T.TOKENS_DUCK}) AS t FROM documents
    ),
    freq AS (
        SELECT t, count(*) AS n FROM toks GROUP BY 1
    ),
    vocab AS (
        SELECT list(t) AS v FROM (
            SELECT t FROM (
                SELECT t, row_number() OVER (ORDER BY n DESC, t ASC) AS rk
                FROM freq
            ) WHERE rk <= 20 ORDER BY t
        )
    )
    SELECT d.doc_id,
           CAST(len({_T.TOKENS_DUCK}) AS BIGINT) AS n_tokens,
           CAST(len(list_filter({_T.TOKENS_DUCK},
                                x -> NOT list_contains(vocab.v, x))) AS BIGINT)
               AS oov_tokens,
           CAST((1000000 * len(list_filter({_T.TOKENS_DUCK},
                                x -> NOT list_contains(vocab.v, x))))
                // len({_T.TOKENS_DUCK}) AS BIGINT) AS oov_ppm
    FROM documents d CROSS JOIN vocab
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary OOV rate per document against the corpus
    top-20 vocabulary (broadcast membership, exact integer ppm)."""
    from userbehavioranalysis_spark.operators.text_analysis import vocab_coverage

    return vocab_coverage(_tables(spark, sf_dir)["documents"])


@query(
    "keyword_search",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_T.TOKENS_DUCK}) AS t FROM documents
    ),
    postings AS (
        SELECT t, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2
    ),
    hits AS (SELECT * FROM postings WHERE t IN ('spark', 'window')),
    per_doc AS (
        SELECT doc_id, CAST(count(DISTINCT t) AS BIGINT) AS n_hits,
               CAST(sum(tf) AS BIGINT) AS total_tf
        FROM hits GROUP BY 1
    ),
    ranked AS (
        SELECT doc_id, n_hits, total_tf,
               CAST(row_number() OVER (ORDER BY total_tf DESC, doc_id ASC)
                    AS INTEGER) AS rank
        FROM per_doc WHERE n_hits = 2
    )
    SELECT * FROM ranked WHERE rank <= 10
    """,
)
def q_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive keyword search over an inverted index (posting
    table), ranked by summed term frequency — the retrieval/example-
    mining shape; postings persist bucketed-by-token at scale."""
    from userbehavioranalysis_spark.operators.text_analysis import keyword_search

    return keyword_search(_tables(spark, sf_dir)["documents"])


@query(
    "bm25_search",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_T.TOKENS_DUCK}) AS t FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
    stats AS (
        SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl
    ),
    tf AS (
        SELECT doc_id, t, count(*) AS tf FROM toks
        WHERE t IN ('spark', 'hash', 'window') GROUP BY 1, 2
    ),
    df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * tf.tf * (1.2 + 1)
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75
                      * (dl.dl / (CAST(s.total_tokens AS DOUBLE) / s.n_docs))))
               ), 4) AS score_r4
        FROM tf JOIN df USING (t) JOIN dl USING (doc_id) CROSS JOIN stats s
        GROUP BY 1
    )
    SELECT doc_id, score_r4,
           CAST(rank AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY score_r4 DESC, doc_id ASC) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked retrieval over the inverted-index shape: Lucene-form
    idf × saturated tf × length normalization, one corpus shuffle, df
    and corpus scalars broadcast; score rounded to 4 dp before ranking
    (the unigram_logprob live-ln precedent), ties on doc_id."""
    from userbehavioranalysis_spark.operators.text_analysis import bm25_search

    return bm25_search(_tables(spark, sf_dir)["documents"])


@query(
    "dq_audit",
    oracle="""
    SELECT 'lineitem.quantity_not_null' AS rule,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.discount_in_[0,1]',
           CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.extendedprice_positive',
           CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders.totalprice_positive',
           CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.status_in_domain',
           CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders.custkey_fk_customer', CAST(count(*) AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem.orderkey_fk_orders', CAST(count(*) AS BIGINT),
           CAST(NULL AS BIGINT)
    FROM lineitem l
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders.orderkey_unique',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders
    """,
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations audit (dbt-test/Deequ stage): all
    single-table rules compile to ONE conditional-agg pass per table;
    FK orphans are counted LEFT ANTI joins."""
    from userbehavioranalysis_spark.operators.dataquality import dq_audit

    t = _tables(spark, sf_dir)
    return dq_audit(t["orders"], t["lineitem"], t["customer"])


@query(
    "doc_chunks",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_T.TOKENS_DUCK} AS toks,
               CAST(len({_T.TOKENS_DUCK}) AS BIGINT) AS n
        FROM documents
    ), c AS (
        SELECT doc_id, toks, n,
               CASE WHEN n <= 32 THEN 1 ELSE (n - 32 + 23) // 24 + 1 END
                   AS n_chunks
        FROM t
    ), e AS (
        SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_id FROM c
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * 24 + 1 AS BIGINT) AS chunk_start,
           CAST(least(32, n - chunk_id * 24) AS BIGINT) AS chunk_len,
           array_to_string(
               toks[(chunk_id * 24 + 1):(chunk_id * 24 + least(32, n - chunk_id * 24))],
               ' ') AS chunk_text
    FROM e
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding token-window chunking (32-token chunks, 8-token overlap)
    — the RAG-indexing / long-document unit-of-retrieval step; map-only
    explode, integer-exact chunk grid, word-exact chunk text (full SQL
    replay on both)."""
    from userbehavioranalysis_spark.operators.text_analysis import chunk_documents

    return chunk_documents(
        _tables(spark, sf_dir)["documents"], chunk_tokens=32, overlap=8
    )


def _snapshot_table(spark: SparkSession, sf_dir: str) -> str:
    """Stage the versioned corpus table ONCE per sf_dir: v1 =
    overwrite(even docs), v2 = append(odd docs), v3 = compact — the
    exact lifecycle a daily-ingested, periodically-compacted corpus
    store goes through.  Both snapshot queries read from it, so the
    pinned-v1 read is proven against a table that has ALREADY been
    appended to and compacted since."""
    import os
    import tempfile

    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_append,
        snapshot_compact,
        snapshot_overwrite,
    )

    key = (sf_dir, "snapshot-table")
    stage = _STREAM_STAGE_CACHE.get(key)
    if stage is None or not os.path.isdir(os.path.join(stage, "tbl", "_snapshots")):
        stage = tempfile.mkdtemp(prefix="uba_snapshots_")
        docs = _tables(spark, sf_dir)["documents"].select(
            "doc_id", "lang", "source", "n_chars"
        )
        tbl = os.path.join(stage, "tbl")
        snapshot_overwrite(docs.filter(_F.col("doc_id") % 2 == 0), tbl)
        snapshot_append(docs.filter(_F.col("doc_id") % 2 == 1), tbl)
        snapshot_compact(spark, tbl)
        _STREAM_STAGE_CACHE[key] = stage
    return os.path.join(stage, "tbl")


@query(
    "corpus_snapshot_pinned",
    oracle="""
    SELECT doc_id, lang, source, n_chars FROM documents
    WHERE doc_id % 2 = 0
    """,
)
def q_corpus_snapshot_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL / reproducible-corpus pinning
    (sources/snapshots.py): version 1 of the staged table is read back
    AFTER an append (v2) and a compaction (v3) have been committed on
    top of it — the manifest's explicit file list insulates the pinned
    read, so it must still hash-equal exactly the even-doc_id slice it
    was committed with.  This is the property a training run needs to
    be rerunnable months later; naive directory reads (and in-place
    compaction) destroy it."""
    from userbehavioranalysis_spark.sources.snapshots import snapshot_read

    return snapshot_read(spark, _snapshot_table(spark, sf_dir), version=1)


@query(
    "corpus_snapshot_latest",
    oracle="SELECT doc_id, lang, source, n_chars FROM documents",
)
def q_corpus_snapshot_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The latest version of the staged snapshot table (post-append,
    post-compact) must hold exactly the full corpus: append added the
    odd half without rewriting v1's files, and compaction rewrote the
    content into fewer files WITHOUT changing it (committed as a new
    version, parent retained for time travel)."""
    from userbehavioranalysis_spark.sources.snapshots import snapshot_read

    return snapshot_read(spark, _snapshot_table(spark, sf_dir))


@query(
    "corpus_snapshot_diff",
    oracle="""
    SELECT doc_id, lang, source, n_chars, 'added' AS change
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-to-version corpus diff (sources/snapshots.snapshot_diff)
    over the staged snapshot table, exercising BOTH execution paths in
    one hash: v1→v2 straddles only an append, so the file-lineage fast
    path reads exactly the appended files (the odd-doc_id half — the
    value-checked rows); v2→v3 straddles the compaction, so file
    identity is useless and the row-level key fallback runs — and must
    prove the compaction changed NOTHING (zero rows; any row it
    contributed would break the hash).  At 100 TB the fast path is a
    scan of one day's files; the fallback's anti-join cost is the
    honest price of diffing across a rewrite."""
    from userbehavioranalysis_spark.sources.snapshots import snapshot_diff

    tbl = _snapshot_table(spark, sf_dir)
    append_diff = snapshot_diff(spark, tbl, 1, 2)
    compact_diff = snapshot_diff(spark, tbl, 2, 3, key_cols=["doc_id"])
    return append_diff.unionByName(compact_diff)


def _fresh_snapshot_stage(spark: SparkSession, sf_dir: str, key: str) -> str:
    """A per-(query, sf_dir) snapshot-table staging dir, WIPED and
    rebuilt on every call — for queries whose operation mutates the
    table (restore commits versions, vacuum deletes files), where a
    shared cached stage would make re-runs non-deterministic."""
    import os
    import shutil
    import tempfile

    cache_key = (sf_dir, key)
    stage = _STREAM_STAGE_CACHE.get(cache_key)
    if stage is None:
        stage = tempfile.mkdtemp(prefix=f"uba_{key}_")
        _STREAM_STAGE_CACHE[cache_key] = stage
    tbl = os.path.join(stage, "tbl")
    shutil.rmtree(tbl, ignore_errors=True)
    return tbl


@query(
    "corpus_snapshot_restore",
    oracle="""
    SELECT 'latest_after_restore' AS state, doc_id, lang, source, n_chars
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT 'poisoned_v2' AS state, doc_id, lang, source, n_chars
    FROM documents
    """,
)
def q_corpus_snapshot_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLBACK (sources/snapshots.snapshot_restore): v1 = the good
    corpus (even doc_ids), v2 = a "poisoned" refresh appended the odd
    half, restore(v1) commits v3 metadata-only.  The hash proves both
    halves of the contract at once: the LATEST read equals v1's
    content exactly (the rollback took), and the pinned v2 read still
    equals the full corpus (history preserved — the bad version stays
    readable for the post-mortem).  At 100 TB the rollback writes one
    JSON manifest; nothing is copied."""
    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_append,
        snapshot_overwrite,
        snapshot_read,
        snapshot_restore,
    )

    docs = _tables(spark, sf_dir)["documents"].select(
        "doc_id", "lang", "source", "n_chars"
    )
    tbl = _fresh_snapshot_stage(spark, sf_dir, "snap_restore")
    snapshot_overwrite(docs.filter(_F.col("doc_id") % 2 == 0), tbl)
    snapshot_append(docs.filter(_F.col("doc_id") % 2 == 1), tbl)
    snapshot_restore(tbl, 1)
    return (
        snapshot_read(spark, tbl)
        .withColumn("state", _F.lit("latest_after_restore"))
        .unionByName(
            snapshot_read(spark, tbl, version=2).withColumn(
                "state", _F.lit("poisoned_v2")
            )
        )
        .select("state", "doc_id", "lang", "source", "n_chars")
    )


@query(
    "corpus_snapshot_vacuum",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(1 AS BIGINT) AS orphans_deleted,
           CAST(1 AS BIGINT) AS tmp_manifests_deleted
    FROM documents
    """,
)
def q_corpus_snapshot_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan GC (sources/snapshots.snapshot_vacuum): the staged table
    gets a crashed writer's leftovers — one landed-but-never-committed
    parquet file and one torn .tmp manifest — then a zero-grace
    vacuum.  The audit row value-checks that exactly the two orphans
    were reclaimed AND that the table's full content survived (n_docs
    re-counted from the post-vacuum latest read against SQL).  The
    grace-period behavior (a fresh orphan survives the default
    24 h grace) is pinned in tests/test_plans.py."""
    from userbehavioranalysis_spark.sources.snapshots import (
        _write_new_files,
        snapshot_append,
        snapshot_overwrite,
        snapshot_read,
        snapshot_vacuum,
    )

    docs = _tables(spark, sf_dir)["documents"].select(
        "doc_id", "lang", "source", "n_chars"
    )
    tbl = _fresh_snapshot_stage(spark, sf_dir, "snap_vacuum")
    snapshot_overwrite(docs.filter(_F.col("doc_id") % 2 == 0), tbl)
    snapshot_append(docs.filter(_F.col("doc_id") % 2 == 1), tbl)
    _write_new_files(docs.limit(10).coalesce(1), tbl)  # crashed writer
    import os

    with open(os.path.join(tbl, "_snapshots", "v9.json.dead.tmp"), "w") as f:
        f.write('{"torn":')
    stats = snapshot_vacuum(tbl, min_age_seconds=0)
    return snapshot_read(spark, tbl).agg(
        _F.count("*").cast("bigint").alias("n_docs"),
        _F.lit(stats["deleted_files"]).cast("bigint").alias("orphans_deleted"),
        _F.lit(stats["deleted_tmp_manifests"])
        .cast("bigint")
        .alias("tmp_manifests_deleted"),
    )


@query(
    "corpus_snapshot_evolution",
    oracle="""
    SELECT 'latest' AS state, doc_id, lang,
           CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE NULL END AS n_chars
    FROM documents
    UNION ALL
    SELECT 'pinned_v1' AS state, doc_id, lang, NULL AS n_chars
    FROM documents WHERE doc_id % 2 = 0
    """,
)
def q_corpus_snapshot_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION on the snapshot store: v1 commits the corpus
    narrow (doc_id, lang); a later ingest generation appends the odd
    half WIDENED with n_chars.  The manifest records each version's
    schema (append = parent schema + new columns appended; same-name
    type changes refuse), and reads apply it EXPLICITLY — no
    mergeSchema footer pass at any scale — so the latest read returns
    all docs with v1's rows NULL-filled in the new column, while the
    pinned v1 read keeps its original narrow two-column schema (the
    reproducibility contract extends to SCHEMA, not just rows: a
    pinned training run re-reads exactly the columns it saw).  Both
    reads value-checked in one hash (the pinned leg NULL-padded only
    for the union's column alignment)."""
    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_append,
        snapshot_overwrite,
        snapshot_read,
    )

    docs = _tables(spark, sf_dir)["documents"]
    tbl = _fresh_snapshot_stage(spark, sf_dir, "snap_evolve")
    snapshot_overwrite(
        docs.filter(_F.col("doc_id") % 2 == 0).select("doc_id", "lang"), tbl
    )
    snapshot_append(
        docs.filter(_F.col("doc_id") % 2 == 1).select("doc_id", "lang", "n_chars"),
        tbl,
    )
    latest = snapshot_read(spark, tbl).withColumn("state", _F.lit("latest"))
    pinned = snapshot_read(spark, tbl, version=1)
    assert pinned.columns == ["doc_id", "lang"], pinned.columns
    return latest.unionByName(
        pinned.withColumn("state", _F.lit("pinned_v1")).withColumn(
            "n_chars", _F.lit(None).cast("long")
        )
    ).select("state", "doc_id", "lang", "n_chars")


@query(
    "corpus_snapshot_partitioned",
    oracle="""
    SELECT 'latest_en' AS state, doc_id, lang, n_chars
    FROM documents WHERE lang = 'en'
    UNION ALL
    SELECT 'pinned_v1_en' AS state, doc_id, lang, n_chars
    FROM documents WHERE lang = 'en' AND doc_id % 2 = 0
    """,
)
def q_corpus_snapshot_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITIONED snapshot table (the 100 TB layout question for the
    store): the corpus commits Hive-partitioned by lang — directories
    at a fixed depth under data/, so one basePath covers every
    commit's files — and a read filtered on the partition column
    partition-PRUNES within the version's explicit file list
    (PartitionFilters plan-pinned in tests/test_plans.py).  The hash
    value-checks the pruned LATEST read and the pruned PINNED-v1 read
    (after an append landed) in one gate: pruning changes I/O, never
    results, and time travel composes with it."""
    from userbehavioranalysis_spark.sources.snapshots import (
        snapshot_append,
        snapshot_overwrite,
        snapshot_read,
    )

    docs = _tables(spark, sf_dir)["documents"].select("doc_id", "lang", "n_chars")
    tbl = _fresh_snapshot_stage(spark, sf_dir, "snap_part")
    snapshot_overwrite(
        docs.filter(_F.col("doc_id") % 2 == 0), tbl, partition_by=["lang"]
    )
    snapshot_append(docs.filter(_F.col("doc_id") % 2 == 1), tbl)
    latest_en = (
        snapshot_read(spark, tbl)
        .filter(_F.col("lang") == "en")
        .withColumn("state", _F.lit("latest_en"))
    )
    pinned_en = (
        snapshot_read(spark, tbl, version=1)
        .filter(_F.col("lang") == "en")
        .withColumn("state", _F.lit("pinned_v1_en"))
    )
    return latest_en.unionByName(pinned_en).select(
        "state", "doc_id", "lang", "n_chars"
    )
