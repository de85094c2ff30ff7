"""Text-analysis operators for training-data curation (build-brief
extension; the reference has no document processing).

- ``language_id``     n-gram/marker-word heuristic language guess
- ``quality_score``   length / punctuation / stopword-ratio scoring
- ``token_counts``    whitespace + BPE-ish regex token counting
- ``fingerprints``    min-k rolling document fingerprint (winnowing-style)
- ``pii_redact``      count + mask email/IPv4 literals (regexp, all-matches)
- ``curate_sample``   deterministic md5-prefix corpus sample with a
  per-language quality-ranked cap — the "assemble a balanced training
  slice" step of a curation pipeline
- ``repetition_score`` Gopher-style intra-document repetition filters
  (duplicate-bigram ratio, most-common-token fraction)
- ``decontaminate``   benchmark n-gram overlap detection (test-set
  contamination scrub) via a broadcast shingle-hash join
- ``mixture_sample``  per-source hash-threshold sampling toward target
  mixture weights (domain balancing without rand())

Everything is Catalyst column expressions over the scan — per-document,
embarrassingly parallel, no shuffle at all (these are map-only jobs at
any scale).  Floats appear only in ``quality_score`` and are rounded to
4 dp with the identical expression order on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from userbehavioranalysis_spark.functions import text as T
from userbehavioranalysis_spark.functions.arrays import exploded

# marker stopwords per language — tiny fixed sets keep the heuristic
# deterministic and SQL-expressible in both engines
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "und", "das"),
}

_BPE_REGEX = "[a-z]+|[A-Z][a-z]*|[0-9]+|[^a-zA-Z0-9\\\\s]"


def _marker_count(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return f"size(filter(tokens, t -> t in ({words})))"


def _lang_best_expr() -> str:
    """The argmax struct behind :func:`language_id`, over a ``tokens``
    column — exposed so composites (operators/pipeline) can evaluate
    the language gate in the same projection as the quality gate
    instead of joining two one-row-per-doc frames."""
    score_struct = ", ".join(
        f"struct({_marker_count(lang)} as hits, '{lang}' as lang)"
        for lang in sorted(LANG_MARKERS)
    )
    return f"array_max(array({score_struct}))"  # max by (hits, lang), lang desc ties


def lang_guess_expr() -> str:
    """SQL expression (over a ``tokens`` array column) for
    :func:`language_id`'s ``lang_guess`` — single source for the gate
    fusion in operators/pipeline."""
    best = _lang_best_expr()
    return f"if(({best}).hits = 0, 'und', ({best}).lang)"


def language_id(documents: DataFrame) -> DataFrame:
    """Heuristic language guess from marker-word hit counts.

    Scores each candidate language by how many tokens are in its marker
    set; argmax with deterministic tie-break on language code; 'und'
    when nothing matches.  Returns (doc_id, lang_guess, marker_hits).
    """
    df = documents.withColumn("tokens", F.expr(T.TOKENS_SPARK))
    best = _lang_best_expr()
    return df.select(
        "doc_id",
        F.expr(lang_guess_expr()).alias("lang_guess"),
        F.expr(f"cast(({best}).hits as int)").alias("marker_hits"),
    )


def quality_score_expr() -> str:
    """SQL expression (over a ``tokens`` array column) for
    :func:`quality_score`'s ``score_r4`` — single source for the gate
    fusion in operators/pipeline; MUST stay textually identical to the
    score expression below (the oracles replay it verbatim)."""
    stop = _marker_count("en")
    return (
        f"round(least(cast(size(tokens) as double) / 100, 1.0) * 0.5"
        f" + (1.0 - cast({stop} as double) / size(tokens)) * 0.5, 4)"
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Document quality heuristics.

    Returns (doc_id, n_tokens, mean_token_len_r4, stopword_ratio_r4,
    score_r4).  ``score`` blends length (capped), mean token length and
    stopword ratio — a stand-in for the fastText-style quality filters
    of large-corpus pipelines, numerically identical cross-engine.
    """
    df = documents.withColumn("tokens", F.expr(T.TOKENS_SPARK))
    stop = _marker_count("en")
    return df.select(
        "doc_id",
        F.expr("cast(size(tokens) as bigint)").alias("n_tokens"),
        F.expr(
            "round(aggregate(tokens, cast(0 as double), (acc, t) -> acc + length(t))"
            " / size(tokens), 4)"
        ).alias("mean_token_len_r4"),
        F.expr(f"round(cast({stop} as double) / size(tokens), 4)").alias(
            "stopword_ratio_r4"
        ),
        F.expr(quality_score_expr()).alias("score_r4"),
    )


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace and BPE-ish token counts per document.

    The regex tokenizer splits lowercase runs, Capitalized runs, digit
    runs and single punctuation — a deterministic proxy for subword
    tokenizers when estimating corpus token budgets.  Returns (doc_id,
    ws_tokens, bpe_tokens, n_chars).
    """
    return documents.select(
        "doc_id",
        F.expr(f"cast(size({T.TOKENS_SPARK}) as bigint)").alias("ws_tokens"),
        F.expr(
            f"cast(size(regexp_extract_all(text, '{_BPE_REGEX}', 0)) as bigint)"
        ).alias("bpe_tokens"),
        F.expr("cast(length(text) as bigint)").alias("n_chars"),
    )


# PII patterns chosen for identical semantics under Java regex (Spark)
# and RE2 (DuckDB): plain character classes, no lookaround/backrefs.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"


def pii_redact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Count and mask email / IPv4 literals in a text column.

    The standard pre-training scrub step: all matches replaced
    (``<EMAIL>`` / ``<IP>``), counts kept for audit.  Pure columnar
    ``regexp_count``/``regexp_replace`` — map-only at any scale, and
    the md5 of the redacted text makes the whole transform
    hash-checkable, not just the counts.  Returns (doc_id, n_emails,
    n_ips, redacted_len, redacted_md5).
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )
    return documents.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("bigint").alias("n_ips"),
        F.length(redacted).cast("bigint").alias("redacted_len"),
        F.md5(F.encode(redacted, "utf-8")).alias("redacted_md5"),
    )


def curate_sample(
    documents: DataFrame, hash_prefix_max: str = "28", per_lang: int = 25
) -> DataFrame:
    """Deterministic curation sample: hash-gate then per-language cap.

    Two standard curation moves composed: (1) a reproducible ~16 %
    corpus sample via md5(text) hex-prefix ≤ ``hash_prefix_max`` — the
    content-hash sampling used in corpus dedup/ablation studies (no
    rand(), so every engine and every rerun selects the same docs);
    (2) a per-language quality-ranked cap (``row_number ≤ per_lang`` by
    quality score) for language balance.  Returns (doc_id, lang,
    score_r4, lang_rank).

    Scale: the hash gate is a pushable map-side filter that drops ~84 %
    of the corpus *before* the only shuffle (the per-language rank);
    language cardinality is tiny so the window never skews.
    """
    from pyspark.sql import Window

    q = quality_score(documents).select("doc_id", "score_r4")
    gated = documents.filter(
        F.substring(F.md5(F.encode(F.col("text"), "utf-8")), 1, 2) <= hash_prefix_max
    ).select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.desc("score_r4"), F.asc("doc_id"))
    return (
        gated.join(q, on="doc_id")
        .withColumn("lang_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("lang_rank") <= per_lang)
        .select("doc_id", "lang", "score_r4", "lang_rank")
    )


def token_topk(documents: DataFrame, k: int = 20) -> DataFrame:
    """Exact corpus-wide top-k tokens by frequency.

    The vocabulary/stop-word discovery pass of corpus analysis.  Token
    frequency is the canonical skewed aggregation ('the' can be 10⁴×
    the median) — handled entirely by Catalyst's partial aggregation:
    map-side combine collapses each partition's counts before the
    shuffle moves one row per distinct token per partition, so hot
    tokens never concentrate rows on one reducer.  The final
    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject (per-
    partition heap + driver merge of k rows), not a global sort.
    Deterministic total order: (n DESC, token ASC).  Returns (token, n).
    """
    return (
        exploded(documents, F.expr(T.TOKENS_SPARK), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
    )


def repetition_score(documents: DataFrame) -> DataFrame:
    """Intra-document repetition filters (Gopher §A1.1-style).

    Two standard repetition signals per document:

    - ``dup_bigram_ratio``: 1 − distinct/total word bigrams — catches
      boilerplate loops and copy-paste padding;
    - ``top_token_ratio``: the most frequent token's share of all
      tokens — catches keyword-stuffed or single-word-spam docs.

    ``flagged`` = 1 when either exceeds its conventional threshold
    (0.2 / 0.3).  All higher-order column functions over the scan —
    map-only, zero shuffle at any scale.  The per-doc distinct×filter
    token count is O(n²) in *document* length, which is bounded, not
    in corpus size.  Returns (doc_id, dup_bigram_ratio_r4,
    top_token_ratio_r4, flagged).
    """
    df = documents.withColumn("tokens", F.expr(T.TOKENS_SPARK)).withColumn(
        "bigrams", F.expr(T.shingles_spark(2))
    )
    dup = (
        "if(size(bigrams) = 0, cast(0.0 as double),"
        " round(1.0 - cast(size(array_distinct(bigrams)) as double)"
        " / size(bigrams), 4))"
    )
    top = (
        "round(cast(array_max(transform(array_distinct(tokens),"
        " t -> size(filter(tokens, x -> x = t)))) as double)"
        " / size(tokens), 4)"
    )
    return df.select(
        "doc_id",
        F.expr(dup).alias("dup_bigram_ratio_r4"),
        F.expr(top).alias("top_token_ratio_r4"),
        F.expr(f"cast(({dup}) > 0.2 or ({top}) > 0.3 as int)").alias("flagged"),
    )


def decontaminate(
    documents: DataFrame, benchmark_mod: int = 17, shingle_k: int = 3
) -> DataFrame:
    """Benchmark-contamination scrub: flag corpus docs sharing any word
    k-gram with a held-out benchmark set.

    The standard pre-training decontamination pass (n-gram overlap
    against eval sets).  The "benchmark" here is the deterministic
    slice ``doc_id % benchmark_mod == 0``; every other document is
    scored by how many of its distinct shingle *hashes* appear in the
    benchmark's shingle set.

    Scale shape: shingling + hashing stay in whole-stage codegen over
    the scan; the benchmark shingle set is small by nature (eval sets
    are tiny vs a 100 TB corpus), so the membership test is a
    **broadcast** hash join — the corpus side never shuffles for it.
    The only corpus-keyed exchanges are the per-doc hit count and the
    left join back, both over the (small) hit set and bare doc ids.
    Returns (doc_id, n_hit_shingles, contaminated) for non-benchmark
    docs.
    """
    sh = exploded(
        documents.withColumn("tokens", F.expr(T.TOKENS_SPARK))
        .withColumn("sh", F.array_distinct(F.expr(T.shingles_spark(shingle_k)))),
        "sh", "s", "doc_id",
    ).select("doc_id", F.expr(T.h64_spark("s")).alias("h"))
    bench = sh.filter(F.col("doc_id") % benchmark_mod == 0).select("h").distinct()
    hits = (
        sh.filter(F.col("doc_id") % benchmark_mod != 0)
        .join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    corpus = documents.filter(F.col("doc_id") % benchmark_mod != 0).select("doc_id")
    return corpus.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hit_shingles"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


def benchmark_index_write(
    benchmark_docs: DataFrame, path: str, shingle_k: int = 3
) -> None:
    """Fingerprint a benchmark/eval set ONCE as a persisted
    decontamination index: the distinct word ``shingle_k``-gram hashes
    as parquet plus a ``_manifest.json`` recording the shingle width
    (operators/manifests.py discipline — a probe shingling at a
    different k would silently miss every contamination hit).

    Production shape: benchmark sets change rarely while the corpus is
    re-scrubbed per snapshot — the artifact is fingerprinted at
    benchmark-release time and every snapshot's scrub just broadcasts
    the stored hashes (eval sets are tiny vs a 100 TB corpus, so the
    whole index is a broadcast-sized single file; ``coalesce(1)``).
    """
    from userbehavioranalysis_spark.operators.manifests import (
        write_index_manifest,
    )

    sh = exploded(
        benchmark_docs.withColumn("tokens", F.expr(T.TOKENS_SPARK))
        .withColumn("sh", F.array_distinct(F.expr(T.shingles_spark(shingle_k)))),
        "sh", "s", "doc_id",
    ).select(F.expr(T.h64_spark("s")).alias("h")).distinct()
    sh.coalesce(1).write.mode("overwrite").parquet(f"{path}/shingles")
    write_index_manifest(path, {"shingle_k": shingle_k})


def decontaminate_indexed(
    documents: DataFrame, index_path: str, shingle_k: int | None = None
) -> DataFrame:
    """:func:`decontaminate` probing a PERSISTED benchmark fingerprint
    (:func:`benchmark_index_write`) instead of re-fingerprinting the
    benchmark per scrub — the per-snapshot steady state.

    ``documents`` is the corpus to scrub (the caller's non-benchmark
    split); only it is shingled fresh.  The stored hash set rides a
    broadcast join exactly like the in-memory form, so the corpus side
    never shuffles for the membership test, and the output
    (doc_id, n_hit_shingles, contaminated) is IDENTICAL to
    ``decontaminate`` on the same split — same oracle, hash-checkable.
    The shingle width resolves through the index manifest (explicit
    conflicts raise).
    """
    from userbehavioranalysis_spark.operators.manifests import (
        resolve_signing_params,
    )

    p = resolve_signing_params(
        index_path, {"shingle_k": 3}, {"shingle_k": shingle_k}
    )
    bench = documents.sparkSession.read.parquet(f"{index_path}/shingles")
    sh = exploded(
        documents.withColumn("tokens", F.expr(T.TOKENS_SPARK))
        .withColumn(
            "sh", F.array_distinct(F.expr(T.shingles_spark(p["shingle_k"])))
        ),
        "sh", "s", "doc_id",
    ).select("doc_id", F.expr(T.h64_spark("s")).alias("h"))
    hits = (
        sh.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return documents.select("doc_id").join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hit_shingles"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


def mixture_sample(documents: DataFrame, source_col: str = "source") -> DataFrame:
    """Domain-mixture sampling: keep each doc with a per-source target
    probability, deterministically.

    Mixture re-weighting is how pipelines hit a target domain blend
    (web 50 %, code 20 %, …) without materializing per-source splits.
    Here each source's keep-rate in permille is itself derived from the
    source id (100 + h(source) % 800 — stands in for a config map,
    which at scale would be a broadcast dim), and a doc is kept iff
    ``h(source#doc_id) % 1000 < permille``.  md5-based — no ``rand()``,
    so the sample is identical on every engine, rerun and partitioning.
    Pure map-side filter over the scan: zero shuffle at any scale.
    Returns (doc_id, source, bucket, permille) for kept docs.
    """
    permille = f"cast(100 + {T.h64_spark(source_col)} % 800 as int)"
    sel_hash = T.h64_spark(f"concat({source_col}, '#', doc_id)")
    bucket = f"cast({sel_hash} % 1000 as int)"
    return (
        documents.select(
            "doc_id",
            source_col,
            F.expr(bucket).alias("bucket"),
            F.expr(permille).alias("permille"),
        )
        .filter(F.col("bucket") < F.col("permille"))
    )


def doc_rarity(documents: DataFrame) -> DataFrame:
    """Two-pass rarity score: mean corpus document-frequency of each
    doc's distinct tokens.

    The distributed pattern behind TF-IDF-style quality signals: pass 1
    builds the vocabulary DF table (explode distinct tokens → groupBy
    token, fully partial-aggregated map-side); pass 2 joins it back and
    re-aggregates per doc.  All integer sums — the mean is derived from
    exact BIGINTs, so partial-agg order can never wobble the hash.

    Scale: the token⋈vocab equi join shuffles on token, where partial
    aggregation has already collapsed each partition to one row per
    distinct token; hot tokens ('the') are single vocab rows, not skewed
    row groups, and AQE handles the residual join skew.  Returns
    (doc_id, n_distinct_tokens, sum_df, mean_df_r4) — low mean_df =
    rare vocabulary.
    """
    toks = exploded(
        documents, F.array_distinct(F.expr(T.TOKENS_SPARK)), "token", "doc_id"
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        toks.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_tokens"),
            F.sum("df").cast("bigint").alias("sum_df"),
        )
        .select(
            "doc_id",
            "n_distinct_tokens",
            "sum_df",
            F.round(
                F.col("sum_df").cast("double") / F.col("n_distinct_tokens"), 4
            ).alias("mean_df_r4"),
        )
    )


def pack_shards(documents: DataFrame, budget: int = 2000) -> DataFrame:
    """Token-budget shard packing: assign docs to fixed-budget training
    shards by running token count, per source.

    The "write ~N-token files" step before tokenizer/training ingestion.
    A doc opens a new shard when the tokens packed before it cross the
    budget — pure integer math over one running-sum window, so the
    layout is identical on every engine and rerun (no greedy bin-packing
    loop, which wouldn't distribute).  Partitioned by source: each
    domain packs independently, so the window never funnels the corpus
    through one reducer at scale.  Returns (doc_id, source, n_tokens,
    cum_tokens, shard).
    """
    from pyspark.sql import Window

    n = F.expr(
        f"cast(size(regexp_extract_all(text, '{_BPE_REGEX}', 0)) as bigint)"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        documents.select("doc_id", "source", n.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "cum_tokens",
            F.expr(f"cast((cum_tokens - n_tokens) div {budget} as int)").alias(
                "shard"
            ),
        )
    )


def length_quantiles(documents: DataFrame) -> DataFrame:
    """Exact per-language doc-length percentiles (p50/p90/p99).

    The corpus profiling pass behind length-filter thresholds.  Uses
    the *exact* ``percentile`` aggregate (linear interpolation over the
    sorted group — ObjectHashAggregate buffers the group's values), so
    the result is engine-checkable; at 100 TB you'd flip the same query
    to ``approx_percentile`` (t-digest, mergeable partial aggs) and
    lose only the hash-exactness.  Returns (lang, n_docs, p50_r4,
    p90_r4, p99_r4).
    """
    pct = F.expr("percentile(n_chars, array(0.5, 0.9, 0.99))")
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            pct.alias("pct"),
        )
        .select(
            "lang",
            "n_docs",
            F.round(F.col("pct")[0], 4).alias("p50_r4"),
            F.round(F.col("pct")[1], 4).alias("p90_r4"),
            F.round(F.col("pct")[2], 4).alias("p99_r4"),
        )
    )


def split_assign(
    documents: DataFrame, val_permille: int = 10, test_permille: int = 10
) -> DataFrame:
    """Deterministic train/val/test split assignment by content hash.

    The standard leak-proof split: bucket = h(doc content) % 1000, so
    (1) assignment is reproducible across engines/reruns with no
    rand(); (2) exact duplicates land in the SAME split (hashing the
    text, not the id — id-hash splits leak duplicated content across
    splits); (3) re-running after corpus growth never moves an existing
    doc between splits.  Map-only, zero shuffle at any scale.  Returns
    (doc_id, lang, bucket, split).
    """
    h = T.h64_spark("text")
    val_hi = val_permille
    test_hi = val_permille + test_permille
    return documents.select(
        "doc_id",
        "lang",
        F.expr(f"cast({h} % 1000 as int)").alias("bucket"),
        F.expr(
            f"CASE WHEN {h} % 1000 < {val_hi} THEN 'val' "
            f"WHEN {h} % 1000 < {test_hi} THEN 'test' "
            f"ELSE 'train' END"
        ).alias("split"),
    )


def fingerprints(documents: DataFrame, shingle_k: int = 4, keep: int = 4) -> DataFrame:
    """Min-k document fingerprint over rolling word shingles.

    The ``keep`` smallest shingle hashes, sorted and dash-joined —
    a compact winnowing-style identity that survives small edits.
    Returns (doc_id, fingerprint).
    """
    return (
        documents.withColumn("tokens", F.expr(T.TOKENS_SPARK))
        .withColumn("shingles", F.array_distinct(F.expr(T.shingles_spark(shingle_k))))
        .select(
            "doc_id",
            F.expr(
                f"array_join(slice(array_sort(transform(shingles, x -> {T.h64_spark('x')})),"
                f" 1, {keep}), '-')"
            ).alias("fingerprint"),
        )
    )


def quality_gate(documents: DataFrame, q: float = 0.1) -> DataFrame:
    """Per-language percentile quality gate: drop each language's bottom
    ``q`` tail by length (the simplest robust quality proxy; swap the
    metric column for a model score in production).

    Per-GROUP cutoffs matter: a global cutoff silently deletes compact
    languages (e.g. CJK chars-per-word) — the standard multilingual
    curation mistake.  Plan: the per-lang exact ``percentile`` reduces
    to one row per language, broadcasts back, and the gate evaluates
    map-side — one tiny aggregation exchange, the corpus never
    shuffles.  At 100 TB swap ``percentile`` for ``approx_percentile``
    (same plan shape, sketch-mergeable).

    The cutoff is rounded to 4 decimals BEFORE comparing so the
    boundary decision is identical on any engine (linear-interpolation
    percentiles agree cross-engine at that precision; raw-float >=
    at an exact integer boundary is last-ulp-fragile).  Returns kept
    rows as (doc_id, lang, n_chars, cut_r4).
    """
    cuts = documents.groupBy("lang").agg(
        F.round(F.expr(f"percentile(n_chars, {q})"), 4).alias("cut_r4")
    )
    return (
        documents.join(F.broadcast(cuts), "lang")
        .filter(F.col("n_chars") >= F.col("cut_r4"))
        .select("doc_id", "lang", "n_chars", "cut_r4")
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Unigram cross-entropy per document — the CCNet/Gopher-style
    language-model quality proxy: documents whose tokens are improbable
    under the corpus' own unigram distribution score high (gibberish,
    boilerplate ids), formulaic documents score low.

    ``xent = log2(total_tokens) - avg_t(log2(count(t)))`` — identical
    to ``-avg_t(log2(p(t)))`` but needs no per-row division.  Two
    aggregations: token frequencies (map-side partial combine, shuffle
    one row per distinct token) and the per-doc average over a
    frequency equi-join.  The frequency table is vocabulary-sized, so
    Catalyst broadcasts it into the per-token join and the corpus
    itself shuffles once, on doc_id — at 100 TB a web-scale vocabulary
    (~1e8 rows) still broadcasts at int-pair width, and the all-table
    window computing the total collapses to a metadata-sized exchange
    because it runs on the AGGREGATED frequency table, never the
    corpus.  Returns (doc_id, n_tokens, xent_r4); rounding to 4
    decimals absorbs float-sum ordering across engines.
    """
    from pyspark.sql import Window

    tok = exploded(
        documents.withColumn("toks", F.expr(T.TOKENS_SPARK)),
        "toks",
        "t",
        "doc_id",
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    freq = freq.withColumn(
        "total", F.sum("cnt").over(Window.partitionBy())
    )
    return (
        tok.join(F.broadcast(freq), "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(
                F.first(F.log2("total")) - F.avg(F.log2("cnt")), 4
            ).alias("xent_r4"),
        )
    )


def chunk_documents(
    documents: DataFrame, chunk_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Sliding token-window chunking with overlap — the RAG-indexing /
    long-document pretraining staple: cut each document into
    ``chunk_tokens``-token windows advancing by ``chunk_tokens −
    overlap``, so consecutive chunks share ``overlap`` tokens and no
    token is lost at a boundary.

    All integer arithmetic (ceil-div via ``div``), so the chunk grid is
    bit-identical on any engine; the chunk text is a word-exact
    ``slice`` + join.  Chunk count per doc is
    ``1 + ceil_div(n − chunk, stride)`` for ``n > chunk`` else 1 (a
    short document yields exactly one short chunk).

    Scale: map-only — one ``explode`` whose fan-out is n_tokens/stride
    per document, no shuffle at all; the natural pre-step to
    ``doc_embed_hashing``/ANN indexing where the unit of retrieval is
    the chunk, not the document.  Returns (doc_id, chunk_id,
    chunk_start, chunk_len, chunk_text), 1-based token offsets.
    """
    assert 0 <= overlap < chunk_tokens, "overlap must be < chunk_tokens"
    stride = chunk_tokens - overlap
    toks = (
        documents.withColumn("toks", F.expr(T.TOKENS_SPARK))
        .select("doc_id", "toks", F.expr("cast(size(toks) as bigint)").alias("n"))
        .withColumn(
            "n_chunks",
            F.expr(
                f"if(n <= {chunk_tokens}, cast(1 as bigint), "
                f"(n - {chunk_tokens} + {stride} - 1) div {stride} + 1)"
            ),
        )
    )
    out = exploded(
        toks, F.expr("sequence(cast(0 as bigint), n_chunks - 1)"),
        "chunk_id", "doc_id", "toks", "n",
    )
    # grid arithmetic computed ONCE; chunk_text slices by the same
    # chunk_start/chunk_len columns it reports, so the text can never
    # desynchronize from the reported grid
    grid = out.select(
        "doc_id",
        "chunk_id",
        F.expr(f"chunk_id * {stride} + 1").alias("chunk_start"),
        F.expr(
            f"least(cast({chunk_tokens} as bigint), n - (chunk_id * {stride}))"
        ).alias("chunk_len"),
        "toks",
    )
    return grid.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        "chunk_len",
        F.expr(
            "array_join(slice(toks, cast(chunk_start as int), "
            "cast(chunk_len as int)), ' ')"
        ).alias("chunk_text"),
    )


def pack_sequences(documents: DataFrame, seq_len: int = 512) -> DataFrame:
    """Continuous-concatenation sequence packing: map each document onto
    the fixed-length training sequences its tokens land in.

    The GPT-style packing step AFTER shard layout: tokens concatenate
    continuously per source and cut every ``seq_len``, documents
    straddling a cut span multiple sequences.  Emits per doc the span
    (first/last sequence index, offset within the first sequence) a
    loader needs to materialize attention-boundary metadata — all from
    one running-sum window partitioned by source, same distribution
    properties as ``pack_shards`` (no per-source funnel of the corpus;
    the window carries two longs per doc).  Returns (doc_id, source,
    n_tokens, seq_first, seq_last, seq_offset).
    """
    from pyspark.sql import Window

    n = F.expr(
        f"cast(size(regexp_extract_all(text, '{_BPE_REGEX}', 0)) as bigint)"
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        documents.select("doc_id", "source", n.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            # integer div, not double floor — exact at any corpus size
            F.expr(f"cast((cum_tokens - n_tokens) div {seq_len} as bigint)").alias(
                "seq_first"
            ),
            F.expr(f"cast((cum_tokens - 1) div {seq_len} as bigint)").alias(
                "seq_last"
            ),
            F.expr(f"cast((cum_tokens - n_tokens) % {seq_len} as bigint)").alias(
                "seq_offset"
            ),
        )
    )


def stratified_sample(documents: DataFrame, per_lang: int = 25) -> DataFrame:
    """Exact per-language quota sampling: deterministically keep (up to)
    ``per_lang`` documents per language — the balanced-eval-set / data-
    mixture primitive that ``mixture_sample``'s hash-RATE gate cannot
    express (a rate keeps a proportional share; a quota keeps an exact
    count regardless of language skew).

    Selection order is ``md5(text)`` (doc_id tie-break): a content hash
    is an order-free shuffle of each stratum, so the sample is unbiased
    w.r.t. ingestion order yet fully reproducible on any engine.

    Plan shape: one exchange on ``lang``, then rank-and-filter.  The
    window sorts each language's stratum, and language skew is real at
    100 TB (one language can be half the corpus) — the production
    variant pre-filters with a per-partition local top-``per_lang``
    per lang (partial TakeOrdered) before the exchange, so the global
    sort sees ≤ partitions·per_lang rows per language; at the tested
    SFs Catalyst's rank-filter pushdown (WindowGroupLimit) already
    performs exactly that partial pruning map-side.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("text")).asc(), F.col("doc_id").asc()
    )
    return (
        documents.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= per_lang)
        .select("doc_id", "lang", F.col("rk").alias("sample_rank"))
    )


def importance_sample(documents: DataFrame) -> DataFrame:
    """Quality-weighted (importance) sampling: each document's keep
    probability IS its quality score — high-quality docs are kept at
    ~score rate, low-quality docs are mostly dropped, without the hard
    cliff of a threshold gate.  The curation move between
    ``mixture_sample``'s flat per-source rate and ``quality_gate``'s
    percentile cutoff.

    Determinism: the uniform draw is the md5-of-content 60-bit hash mod
    10 000 (no ``rand()``), compared against ``round(score·10⁴)`` —
    integers on both sides, so every engine, rerun, and partitioning
    keeps exactly the same documents.

    Scale: one doc_id-keyed join attaches the score (at 100 TB the
    score projection would fuse inline with the scan instead); the
    draw-vs-score comparison is a map-side filter, no extra shuffle.
    """
    q = quality_score(documents).select("doc_id", "score_r4")
    h = T.h64_spark("encode(text, 'utf-8')")
    u = F.expr(f"{h} % 10000")
    p = F.round(F.col("score_r4") * 10000).cast("int")
    return (
        documents.select("doc_id", "lang", u.alias("draw"))
        .join(q, on="doc_id")
        .where(F.col("draw") < p)
        .select("doc_id", "lang", "score_r4")
    )


def temperature_mixture(
    documents: DataFrame,
    alpha_permille: int = 500,
    target_permille: int = 500,
    source_col: str = "source",
) -> DataFrame:
    """Temperature-balanced domain sampling: per-source keep rates
    ∝ n_s^α / n_s, the standard multi-domain rebalance (α=1 keeps the
    natural blend, α→0 flattens to uniform-by-domain; the default
    α=0.5 is the multilingual-sampling convention).

    Where :func:`mixture_sample` takes per-source rates as GIVEN, this
    derives them from the corpus itself: big domains are downsampled
    toward ``total·target_permille/1000`` docs distributed by
    ``w_s = n_s^α``.

    Cross-engine determinism is the hard part: ``n^α`` is a double, and
    a double SUM over sources is partition-order-dependent, so a naive
    share computation can flip a floor() at the boundary between
    engines.  The fix — integer-quantized weights: ``w_s =
    floor(1000·n_s^0.5)`` (IEEE sqrt is correctly rounded, hence
    engine-exact; the floor is then exact), summed as INTEGERS (exact,
    order-free), and the per-source rate ``(10³·T·total·w_s) div
    (Σw·n_s)`` computed with integer floor-DIVISION over DECIMAL(38,0)
    operands — exact at any corpus size (decimal ``/`` would round to
    result scale BEFORE a floor(), which can cross an integer boundary;
    ``div`` never rounds).  The doc-level draw is the usual md5
    hash-gate — no rand().

    Shape at scale: one tiny groupBy(source) aggregate, its rate table
    broadcast back onto the scan; the keep decision is a map-side
    filter.  Returns (doc_id, source, rate_ppm) for kept docs.
    """
    if alpha_permille != 500:
        raise ValueError("only α=0.5 (sqrt) has an exact integer-quantized form")
    counts = documents.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_s"))
    weights = counts.withColumn(
        "w_s", F.floor(F.lit(1000.0) * F.sqrt(F.col("n_s"))).cast("long")
    )
    sums = weights.agg(
        F.sum("w_s").alias("sum_w"), F.sum("n_s").alias("total")
    )
    rates = (
        weights.crossJoin(F.broadcast(sums))
        .withColumn(
            "_num",
            F.lit(1000).cast("decimal(38,0)")
            * F.lit(target_permille).cast("decimal(38,0)")
            * F.col("total").cast("decimal(38,0)")
            * F.col("w_s").cast("decimal(38,0)"),
        )
        .withColumn(
            "_den",
            F.col("sum_w").cast("decimal(38,0)") * F.col("n_s").cast("decimal(38,0)"),
        )
        .select(source_col, F.expr("cast(_num div _den as bigint)").alias("rate_ppm"))
    )
    key = f"concat({source_col}, '~', doc_id)"
    draw = F.expr(f"cast({T.h64_spark(key)} % 1000000 as bigint)")
    return (
        documents.select("doc_id", source_col, draw.alias("_draw"))
        .join(F.broadcast(rates), on=source_col)
        .where(F.col("_draw") < F.least(F.col("rate_ppm"), F.lit(1000000)))
        .select("doc_id", source_col, F.least(F.col("rate_ppm"), F.lit(1000000)).alias("rate_ppm"))
    )


def vocab_coverage(documents: DataFrame, vocab_k: int = 20) -> DataFrame:
    """Per-document tokenizer-vocabulary coverage: what fraction of a
    doc's tokens fall outside the corpus's top-``vocab_k`` vocabulary
    (the OOV rate a fixed-vocab tokenizer would see).

    The curation use: docs with high OOV against the training
    vocabulary fragment into long byte-level token sequences —
    pipelines cap or re-route them.  Two passes: (1) the corpus
    vocabulary (token frequency top-k — the skewed-agg shape of
    ``token_topk``, partial-agg combined, vocabulary-sized output);
    (2) a map-side membership count per doc against the BROADCAST
    vocabulary array.  OOV rate in exact integer ppm (``10⁶·oov div
    n_tokens``), so the output value-hashes cross-engine.  Returns
    (doc_id, n_tokens, oov_tokens, oov_ppm).
    """
    from pyspark.sql import Window

    toks = documents.select(
        "doc_id", F.explode(F.expr(T.TOKENS_SPARK)).alias("t")
    )
    freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy(F.desc("n"), F.asc("t"))
    vocab = (
        freq.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= vocab_k)
        .select("t")
        .agg(F.collect_list("t").alias("vocab"))
    )
    per_doc = (
        documents.crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(f"cast(size({T.TOKENS_SPARK}) as bigint)").alias("n_tokens"),
            F.expr(
                f"cast(size(filter({T.TOKENS_SPARK},"
                f" x -> not array_contains(vocab, x))) as bigint)"
            ).alias("oov_tokens"),
        )
    )
    return per_doc.withColumn(
        "oov_ppm",
        F.expr("cast((1000000 * oov_tokens) div n_tokens as bigint)"),
    )


def keyword_search(
    documents: DataFrame, terms: tuple[str, ...] = ("spark", "window"), k: int = 10
) -> DataFrame:
    """Conjunctive (AND) keyword search over an inverted index, ranked
    by total term frequency — the retrieval shape of a corpus search /
    example-mining pass.

    Build: the posting table (token → doc, tf) — one explode +
    groupBy, the same partial-agg shape as ``token_topk``; at 100 TB
    the postings are the PERSISTED artifact (bucketed by token, as the
    ANN band index persists its buckets) and queries never touch raw
    text.  Query: filter postings to the search terms (token-pruned —
    with a bucketed index a partition-pruned read), then require ALL
    terms per doc (``count distinct = n_terms`` beats an n-way
    self-join) and rank by summed tf.  Ties break on doc_id for a
    deterministic, hash-checkable top-k.  Returns (doc_id, n_hits,
    total_tf, rank).
    """
    from pyspark.sql import Window

    toks = documents.select("doc_id", F.explode(F.expr(T.TOKENS_SPARK)).alias("t"))
    postings = toks.groupBy("t", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    hits = postings.where(F.col("t").isin(*terms))
    per_doc = hits.groupBy("doc_id").agg(
        F.countDistinct("t").alias("n_hits"),
        F.sum("tf").alias("total_tf"),
    )
    conj = per_doc.where(F.col("n_hits") == len(terms))
    w = Window.orderBy(F.desc("total_tf"), F.asc("doc_id"))
    return (
        conj.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_id", "n_hits", "total_tf", "rank")
    )


def bm25_search(
    documents: DataFrame,
    terms: tuple[str, ...] = ("spark", "hash", "window"),
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked retrieval over the same inverted-index shape as
    :func:`keyword_search` — the standard relevance function for
    corpus search / example mining (Robertson-Spärck Jones).

    ``score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))`` (the always-
    positive Lucene form).  Disjunctive (OR) matching: any document
    containing ≥1 term scores.

    Plan: ONE corpus explode feeds ONE doc-keyed aggregate that
    computes the document length AND every term's tf as conditional
    sums (the simhash-vote shape — fixed small term set, partial agg
    map-side); per-term df and the (N, avgdl) scalars are one-row
    aggregates OVER that per-doc frame, broadcast back, and the score
    is a map-only expression — the corpus is scanned once and shuffled
    once (doc_id) regardless of scale.  At 100 TB the per-doc frame is
    the persisted artifact and queries never rescan text.  Float
    determinism follows the ``unigram_logprob`` precedent: live ``ln``
    on identical doubles in both engines, score rounded to 4 dp BEFORE
    ranking, ties broken on doc_id — hash-checkable top-k.  Returns
    (doc_id, score_r4, rank).
    """
    from pyspark.sql import Window

    from userbehavioranalysis_spark.operators.cachepool import (
        pooled_cache,
        release_pooled,
    )

    toks = documents.select("doc_id", F.explode(F.expr(T.TOKENS_SPARK)).alias("t"))
    release_pooled()
    # per-doc frame (1 long + |terms| ints per doc) feeds both the
    # one-row global aggregate and the scorer: cache it so the corpus
    # is scanned/exploded ONCE, not once per branch
    per_doc = pooled_cache(
        toks.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum(F.when(F.col("t") == term, 1).otherwise(0)).alias(f"tf{i}")
                for i, term in enumerate(terms)
            ],
        )
    )
    gl = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    score = " + ".join(
        f"if(tf{i} > 0,"
        f" ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * tf{i} * ({k1} + 1)"
        f" / (tf{i} + {k1} * (1 - {b} + {b}"
        f" * (dl / (cast(total_tokens as double) / n_docs)))), 0.0d)"
        for i in range(len(terms))
    )
    scored = (
        per_doc.where(
            " or ".join(f"tf{i} > 0" for i in range(len(terms)))
        )
        .crossJoin(F.broadcast(gl))
        .select("doc_id", F.round(F.expr(score), 4).alias("score_r4"))
    )
    w = Window.orderBy(F.desc("score_r4"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("doc_id", "score_r4", "rank")
    )
