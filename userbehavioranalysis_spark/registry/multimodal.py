"""Multimodal (real WAV/BMP/AVI round-trip) queries."""
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
    "media_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio'
                           ELSE 'video' END AS detected_kind,
           CAST(CASE doc_id % 3 WHEN 0 THEN 8 + (n_chars % 32)
                                WHEN 1 THEN 0
                                ELSE 8 + (n_chars % 16) END AS INTEGER) AS width,
           CAST(CASE doc_id % 3 WHEN 0 THEN 8 + (doc_id % 32)
                                WHEN 1 THEN 0
                                ELSE 8 + (doc_id % 16) END AS INTEGER) AS height,
           CAST(CASE doc_id % 3 WHEN 0 THEN 1
                                WHEN 1 THEN 800 + (n_chars % 800)
                                ELSE 2 + (doc_id % 6) END AS BIGINT) AS n_frames,
           CAST(CASE doc_id % 3 WHEN 0 THEN doc_id % 256
                                WHEN 1 THEN 1000 + (doc_id % 20000)
                                ELSE doc_id % 256 END AS BIGINT) AS intensity
    FROM documents
    """,
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic media pipeline, now hash-checkable end-to-end: a
    mixed-format table of REAL payloads (24-bit BMP / PCM WAV / RIFF
    AVI by ``doc_id % 3``) flows through ``media_features``, which
    sniffs magic bytes and dispatches to the matching real decoder —
    the ``_decode_stub`` lane only catches formats no codec claims
    (``detected_kind='unknown'``), which never occurs here.  Every
    feature is integer-derivable from (doc_id, n_chars), so the oracle
    reproves all three encode→decode round-trips in one query."""
    from userbehavioranalysis_spark.operators.multimodal import (
        media_features,
        synthetic_mixed_media,
    )

    return media_features(synthetic_mixed_media(_tables(spark, sf_dir)["documents"]))


@query(
    "audio_features",
    oracle="""
    SELECT doc_id AS media_id,
           8000 AS sample_rate,
           1 AS n_channels,
           CAST(800 + (n_chars % 800) AS BIGINT) AS n_frames,
           CAST(1000 + (doc_id % 20000) AS INTEGER) AS peak,
           CAST(1000 + (doc_id % 20000) AS INTEGER) AS rms
    FROM documents
    """,
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal round-trip, no stub: deterministic square-wave
    PCM → RIFF/WAV bytes (stdlib ``wave``) → binary payload column →
    mapInPandas decode back to (rate, channels, frames, peak, rms).
    Every sample is ±A exactly, so peak = rms = A and the features are
    integer-derivable from (doc_id, n_chars) — which is what the oracle
    computes independently, proving the encode→decode round-trip."""
    from userbehavioranalysis_spark.operators.multimodal import (
        audio_features,
        synthetic_wav_media,
    )

    return audio_features(synthetic_wav_media(_tables(spark, sf_dir)["documents"]))


@query(
    "image_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(8 + (n_chars % 32) AS INTEGER) AS width,
           CAST(8 + (doc_id % 32) AS INTEGER) AS height,
           CAST(doc_id % 256 AS INTEGER) AS mean_intensity
    FROM documents
    """,
)
def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image round-trip: 24-bit uncompressed BMP bytes (struct-
    packed headers + padded BGR rows) → binary payload → mapInPandas
    header/pixel decode.  Solid-gray synthesis makes the decoded mean
    intensity integer-exact, so the oracle derives everything from
    (doc_id, n_chars) independently."""
    from userbehavioranalysis_spark.operators.multimodal import (
        image_features,
        synthetic_bmp_media,
    )

    return image_features(synthetic_bmp_media(_tables(spark, sf_dir)["documents"]))


@query(
    "image_resize",
    oracle="""
    WITH p AS (
        SELECT doc_id,
               8 + (n_chars % 32) AS w,
               8 + (doc_id % 32) AS h
        FROM documents
    ), s AS (
        SELECT doc_id, w, h,
               greatest(1, (greatest(w, h) + 7) // 8) AS step
        FROM p
    )
    SELECT doc_id AS media_id,
           CAST((w + step - 1) // step AS INTEGER) AS width,
           CAST((h + step - 1) // step AS INTEGER) AS height,
           CAST(doc_id % 256 AS INTEGER) AS mean_intensity
    FROM s
    """,
)
def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize round-trip: synth BMP → nearest-neighbor downscale to
    max side 8 (integer stride, re-encoded as a valid BMP) → decode
    features of the RESIZED payload.  Output dims are exact integer
    ceil-divisions the oracle mirrors; solid-gray synthesis keeps the
    mean intensity bit-exact through the resample."""
    from userbehavioranalysis_spark.operators.multimodal import (
        bmp_resize,
        image_features,
        synthetic_bmp_media,
    )

    return image_features(
        bmp_resize(synthetic_bmp_media(_tables(spark, sf_dir)["documents"]), max_side=8)
    )


@query(
    "video_features",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(f AS INTEGER) AS frame_no,
           CAST(8 + (n_chars % 16) AS INTEGER) AS width,
           CAST(8 + (doc_id % 16) AS INTEGER) AS height,
           CAST(2 + (doc_id % 6) AS INTEGER) AS n_frames,
           10 AS fps,
           CAST((doc_id + 17 * f) % 256 AS INTEGER) AS intensity
    FROM (
        SELECT doc_id, n_chars,
               unnest(range(0, 2 + (doc_id % 6), 2)) AS f
        FROM documents
    )
    """,
)
def q_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video round-trip: minimal standard RIFF/AVI bytes (struct-
    packed avih/strh/strf headers + movi list of uncompressed DIB
    frames) → binary payload → mapInPandas chunk-tree parse + per-frame
    pixel decode, sampling every 2nd frame.  Solid-gray frames make each
    sampled frame's decoded mean intensity integer-exact, so the oracle
    derives all features from (doc_id, n_chars) independently."""
    from userbehavioranalysis_spark.operators.multimodal import (
        synthetic_avi_media,
        video_frame_features,
    )

    return video_frame_features(
        synthetic_avi_media(_tables(spark, sf_dir)["documents"]), step=2
    )


@query(
    "audio_chunks",
    oracle="""
    WITH a AS (
        SELECT doc_id, 800 + (n_chars % 800) AS n,
               1000 + (doc_id % 20000) AS amp
        FROM documents
    ),
    c AS (
        SELECT doc_id, amp, n,
               unnest(generate_series(0, (n + 255) // 256 - 1)) AS i
        FROM a
    )
    SELECT doc_id AS media_id, CAST(i AS INTEGER) AS chunk_no,
           CAST(least(256, n - 256 * i) AS BIGINT) AS n_frames,
           CAST(amp AS INTEGER) AS peak, CAST(amp AS INTEGER) AS rms
    FROM c
    """,
)
def q_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-length audio chunking with per-chunk stats over REAL WAV
    decode — the audio-side 1→N fan-out; every expected row derived
    analytically by the oracle."""
    from userbehavioranalysis_spark.operators.multimodal import (
        audio_chunks,
        synthetic_wav_media,
    )

    return audio_chunks(synthetic_wav_media(_tables(spark, sf_dir)["documents"]))


@query(
    "image_phash_dedup",
    oracle="""
    WITH imgs AS (
        SELECT doc_id, 8 + (n_chars % 32) AS w,
               (doc_id % 4) * 60 + 10 AS g0,
               ((doc_id // 4) % 4) * 60 + 40 AS g1
        FROM documents
    ),
    sig AS (
        SELECT doc_id,
               string_agg(
                   lower(lpad(to_hex(CASE WHEN ((g.i % 8) * w) // 8
                                          < (w + 1) // 2
                                     THEN g0 ELSE g1 END), 2, '0')),
                   '' ORDER BY g.i) AS sig_hex
        FROM imgs CROSS JOIN generate_series(0, 63) g(i)
        GROUP BY doc_id
    )
    SELECT sig_hex, CAST(count(*) AS BIGINT) AS n_images,
           min(doc_id) AS keep_id
    FROM sig GROUP BY 1
    """,
)
def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: REAL BMP decode → 8x8 nearest-neighbor
    thumbnail signature → cluster.  Two-tone synthetic payloads make
    visually-identical images exist at byte-level-different resolutions;
    the oracle derives every expected signature analytically."""
    from userbehavioranalysis_spark.operators.multimodal import (
        phash_dedup_clusters,
        synthetic_two_tone_bmp,
    )

    return phash_dedup_clusters(
        synthetic_two_tone_bmp(_tables(spark, sf_dir)["documents"])
    )


@query(
    "video_frame_sample",
    oracle="""
    WITH v AS (
        SELECT doc_id, octet_length(encode(text)) AS bl
        FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
        SELECT doc_id, unnest(generate_series(0, (bl + 63) // 64 - 1)) AS i
        FROM v
    )
    SELECT doc_id AS media_id, CAST(i AS INTEGER) AS frame_no,
           CAST(i * 64 AS BIGINT) AS "offset"
    FROM f
    """,
)
def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out (1→N inside Arrow batches, no driver
    involvement) over the video rows of the generic media table."""
    from userbehavioranalysis_spark.operators.multimodal import (
        frame_sample,
        synthetic_media,
    )

    return frame_sample(synthetic_media(_tables(spark, sf_dir)["documents"]))
