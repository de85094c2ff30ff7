"""Text-analysis operators for training-data curation (build-brief
extension; the reference has no document processing).

- ``language_id``     n-gram/marker-word heuristic language guess
- ``quality_score``   length / punctuation / stopword-ratio scoring
- ``token_counts``    whitespace + BPE-ish regex token counting
- ``fingerprints``    min-k rolling document fingerprint (winnowing-style)

Everything is Catalyst column expressions over the scan — per-document,
embarrassingly parallel, no shuffle at all (these are map-only jobs at
any scale).  Floats appear only in ``quality_score`` and are rounded to
4 dp with the identical expression order on the oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from userbehavioranalysis_spark.functions import text as T

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


def language_id(documents: DataFrame) -> DataFrame:
    """Heuristic language guess from marker-word hit counts.

    Scores each candidate language by how many tokens are in its marker
    set; argmax with deterministic tie-break on language code; 'und'
    when nothing matches.  Returns (doc_id, lang_guess, marker_hits).
    """
    df = documents.withColumn("tokens", F.expr(T.TOKENS_SPARK))
    score_struct = ", ".join(
        f"struct({_marker_count(lang)} as hits, '{lang}' as lang)"
        for lang in sorted(LANG_MARKERS)
    )
    best = (
        f"array_max(array({score_struct}))"  # max by (hits, lang), lang desc ties
    )
    return df.select(
        "doc_id",
        F.expr(f"if(({best}).hits = 0, 'und', ({best}).lang)").alias("lang_guess"),
        F.expr(f"cast(({best}).hits as int)").alias("marker_hits"),
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
        F.expr(
            f"round(least(cast(size(tokens) as double) / 100, 1.0) * 0.5"
            f" + (1.0 - cast({stop} as double) / size(tokens)) * 0.5, 4)"
        ).alias("score_r4"),
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
