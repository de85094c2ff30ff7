"""Multimodal (image/audio/video) column plumbing (build-brief
extension).

Media ride through the engine as opaque ``binary`` payload columns plus
typed metadata; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched pandas functions over ``mapInPandas`` — the Spark
idiom for per-row Python that still streams batch-wise (no collect, no
per-row pickling, bounded memory via batch iteration).

Compressed-codec libraries (PIL/librosa/ffmpeg) are NOT available in
this container, so the generic ``extract_features``/``resize`` kernels
are clearly-marked deterministic stubs.  Three formats need no codec
library and get REAL encode→decode round-trips below: WAV audio
(stdlib ``wave``), 24-bit uncompressed BMP images (``struct`` +
numpy), and RIFF/AVI video with uncompressed DIB frames (``struct``
chunk tree).  Swapping a stub body for a compressed codec is a
one-function change; the Spark-side plumbing — schemas, batch
iteration, output shapes, partition behavior — is identical either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def synthetic_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic fake media table from the documents table
    (payload = utf8 text bytes) so the pipeline is testable without
    binary fixtures."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("byte_len"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, float]:
    """STUB decode: real implementation would call PIL/ffmpeg here.

    Deterministic fake: derives (width, height, mean_intensity) from the
    byte content so tests have stable expectations.  Raises for empty
    payloads the way a real decoder would raise for corrupt media.
    """
    if not payload:
        raise NotImplementedError("empty payload: real decoder required")
    w = 16 + (len(payload) % 64)
    h = 16 + (payload[0] % 64)
    mean = float(sum(payload[:64])) / min(len(payload), 64) / 255.0
    return w, h, round(mean, 6)


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode + feature-extract media payloads via ``mapInPandas``.

    Streams Arrow batches; per batch the payloads decode in-process and
    only the (tiny) feature rows flow on.  At scale this is the pattern
    for any CPU-bound media op: map-only, no shuffle, output far
    smaller than input so downstream stages are cheap.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["byte_len"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "mean_intensity": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


def resize(media: DataFrame, max_bytes: int = 256) -> DataFrame:
    """'Resize' stub: payload → smaller payload (real impl: PIL
    thumbnail / ffmpeg scale).  The binary-in → binary-out mapInPandas
    shape matters at scale: the transform streams Arrow batches through
    Python once, emits MEDIA_SCHEMA again, and composes with
    ``extract_features``/``frame_sample`` without extra shuffles.

    Deterministic fake: truncate to ``max_bytes`` (a real resize also
    shrinks payloads content-dependently).
    """

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            small = [bytes(p[:max_bytes]) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": small,
                    "byte_len": [len(p) for p in small],
                }
            )

    return media.mapInPandas(shrink, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stub: emit one row per sampled offset of each
    video payload (real impl: ffmpeg keyframe extraction).  Demonstrates
    the 1→N mapInPandas fan-out shape (row explosion inside Arrow
    batches, no driver involvement)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("offset", LongType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_no": [], "offset": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["offset"].append(off)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(sample, schema=schema)


# -- REAL audio path (stdlib `wave`, no external codecs needed) ------------

def synthetic_wav_media(documents: DataFrame) -> DataFrame:
    """Derive REAL WAV audio payloads from the documents table.

    Unlike the image/video stubs (whose codecs aren't in this
    container), WAV needs only the stdlib ``wave`` module — so this path
    is a genuine binary round-trip: synthesize → RIFF-encode → decode.
    Deterministic parameterization (all derivable from (doc_id,
    n_chars), which is what makes the decode oracle-checkable):

    - mono, 16-bit PCM, 8 kHz
    - ``n_frames  = 800 + (n_chars % 800)``
    - square wave of amplitude ``1000 + (doc_id % 20000)`` flipping
      sign every 4 frames — every sample is ±A exactly, so peak = A
      and RMS = A with no float wobble.
    """
    import io
    import wave

    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                amp = 1000 + int(doc_id) % 20000
                n = 800 + int(n_chars) % 800
                signs = 1 - 2 * ((np.arange(n) // 4) % 2)
                pcm = (amp * signs).astype("<i2")
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(pcm.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "audio",
                    "payload": payloads,
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        synth, schema=MEDIA_SCHEMA
    )


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("peak", IntegerType()),
        StructField("rms", IntegerType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """REAL audio decode via ``mapInPandas``: parse the RIFF/WAV header
    with the stdlib ``wave`` module, decode PCM via numpy, emit
    (sample_rate, channels, frames, peak, rms).  Same batched map-only
    shape as ``extract_features`` — payloads stream through Python once,
    only tiny feature rows continue."""
    import io
    import wave

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(payload), "rb") as w:
                    rate, ch, n = w.getframerate(), w.getnchannels(), w.getnframes()
                    pcm = np.frombuffer(w.readframes(n), dtype="<i2").astype("float64")
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(ch)
                out["n_frames"].append(n)
                out["peak"].append(int(np.max(np.abs(pcm))) if n else 0)
                out["rms"].append(int(round(float(np.sqrt(np.mean(pcm**2))))) if n else 0)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        decode, schema=AUDIO_FEATURE_SCHEMA
    )


# -- REAL image path (uncompressed BMP: struct + numpy, no codec libs) -----

def synthetic_bmp_media(documents: DataFrame) -> DataFrame:
    """Derive REAL BMP image payloads from the documents table.

    24-bit uncompressed BMP is pure struct-packing (BITMAPFILEHEADER +
    BITMAPINFOHEADER + BGR rows padded to 4 bytes) — like the WAV path,
    a genuine binary format with no codec dependency.  Deterministic:
    ``width = 8 + (n_chars % 32)``, ``height = 8 + (doc_id % 32)``,
    solid gray level ``doc_id % 256`` — so decoded mean intensity equals
    the gray level exactly and the whole round-trip is SQL-derivable.
    """
    import struct

    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 8 + int(n_chars) % 32
                h = 8 + int(doc_id) % 32
                gray = int(doc_id) % 256
                row = np.full(w * 3, gray, dtype=np.uint8).tobytes()
                pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
                pixels = (row + pad) * h
                info = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
                )
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
                )
                payloads.append(header + info + pixels)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        synth, schema=MEDIA_SCHEMA
    )


def bmp_resize(media: DataFrame, max_side: int = 8) -> DataFrame:
    """REAL image resize: BMP → smaller BMP via nearest-neighbor.

    Parses each 24-bit BMP, subsamples pixels with integer stride
    ``step = ceil(max(w,h) / max_side)`` (new dims ``ceil(w/step)`` ×
    ``ceil(h/step)`` — all integer math, so the oracle can derive the
    output dimensions exactly), and re-encodes a valid BMP.  The
    binary-in → binary-out mapInPandas shape composes with
    ``image_features`` downstream; payload bytes shrink ~step², which
    is the point of resizing before shuffling media at scale.
    """
    import struct

    import numpy as np

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                magic, _, _, _, offset = struct.unpack("<2sIHHI", b[:14])
                assert magic == b"BM", "not a BMP payload"
                _, w, h, _, bpp = struct.unpack("<IiiHH", b[14:30])
                assert bpp == 24, "only 24-bit BMP supported"
                stride = (w * 3 + 3) // 4 * 4
                px = np.frombuffer(
                    b[offset : offset + stride * abs(h)], dtype=np.uint8
                ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
                step = max(1, -(-max(w, abs(h)) // max_side))
                small = px[::step, ::step, :]
                nh, nw = small.shape[0], small.shape[1]
                rows = small.reshape(nh, nw * 3)
                pad = (4 - (nw * 3) % 4) % 4
                pixels = b"".join(
                    rows[r].tobytes() + b"\x00" * pad for r in range(nh)
                )
                info = struct.pack(
                    "<IiiHHIIiiII", 40, nw, nh, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
                )
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
                )
                payloads.append(header + info + pixels)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return media.mapInPandas(shrink, schema=MEDIA_SCHEMA)


# -- REAL video path (minimal RIFF/AVI, uncompressed DIB frames) -----------

def _avi_chunk(fourcc: bytes, data: bytes) -> bytes:
    import struct

    return fourcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")


def _avi_bytes(w: int, h: int, grays: list[int], fps: int = 10) -> bytes:
    """Struct-pack a minimal but *standard* RIFF/AVI file.

    ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
    '00db'×frames))`` with 24-bit uncompressed DIB frames (same padded
    BGR rows as BMP, codec 'DIB ') — a real container real players
    accept, built from ``struct`` alone."""
    import struct

    stride = (w * 3 + 3) // 4 * 4
    fsize = stride * h
    frames = [
        (bytes([g]) * (w * 3) + b"\x00" * (stride - w * 3)) * h for g in grays
    ]
    avih = struct.pack(
        "<14I", 1000000 // fps, fsize * fps, 0, 0x10, len(grays), 0, 1, fsize, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(grays),
        fsize, 0, 0, 0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 0, 0, 0, 0)
    strl = _avi_chunk(b"LIST", b"strl" + _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf))
    hdrl = _avi_chunk(b"LIST", b"hdrl" + _avi_chunk(b"avih", avih) + strl)
    movi = _avi_chunk(b"LIST", b"movi" + b"".join(_avi_chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_parse(b: bytes):
    """Walk the RIFF chunk tree; return (width, height, fps, frames)."""
    import struct

    assert b[:4] == b"RIFF" and b[8:12] == b"AVI ", "not an AVI payload"
    avih = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal avih
        off = lo
        while off + 8 <= hi:
            fourcc = b[off : off + 4]
            size = struct.unpack("<I", b[off + 4 : off + 8])[0]
            data_lo = off + 8
            if fourcc == b"LIST":
                walk(data_lo + 4, data_lo + size)  # skip the list type tag
            elif fourcc == b"avih":
                avih = struct.unpack("<14I", b[data_lo : data_lo + 56])
            elif fourcc == b"00db":
                frames.append(b[data_lo : data_lo + size])
            off = data_lo + size + (size % 2)

    walk(12, len(b))
    assert avih is not None, "missing avih header"
    usec, _, _, _, n_frames, _, _, _, w, h = avih[:10]
    assert n_frames == len(frames), "frame count mismatch"
    return w, h, round(1000000 / usec), frames


def synthetic_avi_media(documents: DataFrame) -> DataFrame:
    """Derive REAL AVI video payloads from the documents table.

    Deterministic parameterization (SQL-derivable, like the WAV/BMP
    paths): ``width = 8 + n_chars%16``, ``height = 8 + doc_id%16``,
    ``n_frames = 2 + doc_id%6`` at 10 fps; frame ``f`` is solid gray
    ``(doc_id + 17·f) % 256`` so each decoded frame mean is exact."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 8 + int(n_chars) % 16
                h = 8 + int(doc_id) % 16
                grays = [
                    (int(doc_id) + 17 * f) % 256 for f in range(2 + int(doc_id) % 6)
                ]
                payloads.append(_avi_bytes(w, h, grays))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "video",
                    "payload": payloads,
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        synth, schema=MEDIA_SCHEMA
    )


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("intensity", IntegerType()),
    ]
)


def video_frame_features(media: DataFrame, step: int = 2) -> DataFrame:
    """REAL video decode + frame sampling via ``mapInPandas``.

    Parses the RIFF/AVI chunk tree, takes every ``step``-th DIB frame,
    and emits one row per sampled frame with its decoded mean intensity
    — the 1→N fan-out shape of keyframe extraction, with the decode
    genuinely reading container metadata and pixel bytes."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in VIDEO_FRAME_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, fps, frames = _avi_parse(bytes(payload))
                stride = (w * 3 + 3) // 4 * 4
                for f in range(0, len(frames), step):
                    px = np.frombuffer(frames[f], dtype=np.uint8).reshape(h, stride)[
                        :, : w * 3
                    ]
                    out["media_id"].append(mid)
                    out["frame_no"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(len(frames))
                    out["fps"].append(fps)
                    out["intensity"].append(int(round(float(px.mean()))))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        decode, schema=VIDEO_FRAME_SCHEMA
    )


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", IntegerType()),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """REAL image decode via ``mapInPandas``: parse the BMP headers with
    ``struct``, decode padded BGR rows with numpy, emit (width, height,
    integer mean intensity)."""
    import struct

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_FEATURE_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                magic, _, _, _, offset = struct.unpack("<2sIHHI", b[:14])
                assert magic == b"BM", "not a BMP payload"
                _, w, h, _, bpp = struct.unpack("<IiiHH", b[14:30])
                assert bpp == 24, "only 24-bit BMP supported"
                stride = (w * 3 + 3) // 4 * 4
                rows = np.frombuffer(
                    b[offset : offset + stride * abs(h)], dtype=np.uint8
                ).reshape(abs(h), stride)[:, : w * 3]
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(abs(h))
                out["mean_intensity"].append(int(round(float(rows.mean()))))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        decode, schema=IMAGE_FEATURE_SCHEMA
    )


# -- Generic media path: magic-byte dispatch to the real codecs ------------

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("detected_kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("intensity", LongType()),
    ]
)


def synthetic_mixed_media(documents: DataFrame) -> DataFrame:
    """A mixed-kind REAL media table: one payload per document, format
    chosen by ``doc_id % 3`` (0 → BMP image, 1 → WAV audio, 2 → AVI
    video), each via the genuine encoders above.  Three map-only
    branches over disjoint filters unioned back — no shuffle, the
    filters push to the parquet scan on all three branches."""
    m = F.pmod("doc_id", F.lit(3))
    return (
        synthetic_bmp_media(documents.where(m == 0))
        .unionByName(synthetic_wav_media(documents.where(m == 1)))
        .unionByName(synthetic_avi_media(documents.where(m == 2)))
    )


def media_features(media: DataFrame) -> DataFrame:
    """Generic media feature extraction: sniff each payload's MAGIC
    BYTES and dispatch to the matching real decoder — ``BM`` → BMP,
    ``RIFF…WAVE`` → stdlib ``wave``, ``RIFF…AVI `` → the AVI chunk
    walker.  Only a payload no codec claims falls through to the
    clearly-marked deterministic stub (``detected_kind='unknown'``),
    mirroring how a production pipeline routes by content-type with a
    quarantine lane for undecodable media.

    Unified feature row: (width, height) for visual media (0 for
    audio), ``n_frames`` (1 for stills, PCM frames for audio),
    ``intensity`` = mean pixel for image, RMS amplitude for audio,
    frame-0 mean for video.  All integer-exact for the synthetic
    payloads, so the full known-format set is hash-checkable against a
    SQL oracle — the stub lane never fires on it."""
    import io
    import struct
    import wave

    import numpy as np

    def _decode_one(b: bytes):
        if b[:2] == b"BM":
            _, _, _, _, offset = struct.unpack("<2sIHHI", b[:14])
            _, w, h, _, bpp = struct.unpack("<IiiHH", b[14:30])
            stride = (w * 3 + 3) // 4 * 4
            rows = np.frombuffer(
                b[offset : offset + stride * abs(h)], dtype=np.uint8
            ).reshape(abs(h), stride)[:, : w * 3]
            return "image", w, abs(h), 1, int(round(float(rows.mean())))
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            with wave.open(io.BytesIO(b), "rb") as wv:
                n = wv.getnframes()
                pcm = np.frombuffer(wv.readframes(n), dtype="<i2").astype("float64")
            rms = int(round(float(np.sqrt(np.mean(pcm**2))))) if n else 0
            return "audio", 0, 0, n, rms
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            w, h, _, frames = _avi_parse(b)
            stride = (w * 3 + 3) // 4 * 4
            px = np.frombuffer(frames[0], dtype=np.uint8).reshape(h, stride)[:, : w * 3]
            return "video", w, h, len(frames), int(round(float(px.mean())))
        sw, sh, smean = _decode_stub(b)
        return "unknown", sw, sh, 1, int(round(smean * 255))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in MEDIA_FEATURE_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, n, inten = _decode_one(bytes(payload))
                out["media_id"].append(mid)
                out["detected_kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(n)
                out["intensity"].append(inten)
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, schema=MEDIA_FEATURE_SCHEMA)


# -- Perceptual image dedup: thumbnail signature over decoded pixels -------

THUMB_SIG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sig_hex", StringType()),
    ]
)


def synthetic_two_tone_bmp(documents: DataFrame) -> DataFrame:
    """REAL two-tone BMP payloads: left half gray ``(doc_id % 4)·60 +
    10``, right half ``((doc_id div 4) % 4)·60 + 40``, dimensions
    varying per doc exactly like ``synthetic_bmp_media``.

    Two-tone (not solid) is what makes a *perceptual* signature
    meaningful: 16 color combinations recur across ~500 docs at many
    different resolutions, so visually-identical images exist with
    byte-level-different payloads — the case file-hash dedup cannot
    catch and thumbnail dedup exists for.  Left width is ``ceil(w/2)``,
    integer math end to end, so the expected signature is SQL-derivable.
    """
    import struct

    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                w = 8 + int(n_chars) % 32
                h = 8 + int(doc_id) % 32
                g0 = (int(doc_id) % 4) * 60 + 10
                g1 = ((int(doc_id) // 4) % 4) * 60 + 40
                wl = (w + 1) // 2
                row_px = np.empty(w * 3, dtype=np.uint8)
                row_px[: wl * 3] = g0
                row_px[wl * 3 :] = g1
                pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
                pixels = (row_px.tobytes() + pad) * h
                info = struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
                )
                header = struct.pack(
                    "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
                )
                payloads.append(header + info + pixels)
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                    "byte_len": [len(p) for p in payloads],
                }
            )

    return documents.select("doc_id", "n_chars").mapInPandas(
        synth, schema=MEDIA_SCHEMA
    )


def image_thumbnail_sig(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual signature: decode, grayscale, nearest-neighbor sample
    a ``grid``×``grid`` thumbnail, emit it as a lowercase hex string.

    Visually-identical content at different resolutions lands on the
    same signature (sampling positions ``(i·w) div grid`` scale with
    the image), which is the thumbnail-fingerprint near-dup technique —
    resolution- and byte-layout-invariant, cheap enough to run inline
    with decode.  Grayscale is integer ``(r+g+b) div 3``; every step is
    integer, so the signature is bit-exact and oracle-checkable.

    Scale shape: map-only mapInPandas over the media scan — payloads
    never shuffle; only (id, dims, 2·grid² hex chars) flow on to the
    (tiny) downstream group-by.
    """
    import struct

    import numpy as np

    def sig_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in THUMB_SIG_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                magic, _, _, _, offset = struct.unpack("<2sIHHI", b[:14])
                assert magic == b"BM", "not a BMP payload"
                _, w, h, _, bpp = struct.unpack("<IiiHH", b[14:30])
                assert bpp == 24, "only 24-bit BMP supported"
                stride = (w * 3 + 3) // 4 * 4
                px = np.frombuffer(
                    b[offset : offset + stride * abs(h)], dtype=np.uint8
                ).reshape(abs(h), stride)[:, : w * 3].reshape(abs(h), w, 3)
                gray = px.astype(np.int64).sum(axis=2) // 3
                xs = (np.arange(grid) * w) // grid
                ys = (np.arange(grid) * abs(h)) // grid
                thumb = gray[np.ix_(ys, xs)].astype(np.uint8)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(abs(h))
                out["sig_hex"].append(thumb.tobytes().hex())
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        sig_batches, schema=THUMB_SIG_SCHEMA
    )


def phash_dedup_clusters(media: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual-duplicate clusters: group images by thumbnail
    signature; one row per cluster with its size and the kept
    representative (min media_id) — the visual analogue of
    ``dedup.exact_duplicates``'s content-hash grouping."""
    sigs = image_thumbnail_sig(media, grid=grid)
    return sigs.groupBy("sig_hex").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.min("media_id").alias("keep_id"),
    )


# -- Audio chunking: the audio-side 1→N fan-out (frame_sample analogue) ----

AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_no", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("peak", IntegerType()),
        StructField("rms", IntegerType()),
    ]
)


def audio_chunks(media: DataFrame, chunk_frames: int = 256) -> DataFrame:
    """Fixed-length audio chunking with per-chunk stats: decode each
    WAV payload (REAL stdlib ``wave`` decode), split the PCM into
    ``chunk_frames``-frame windows (last one partial), and emit one row
    per chunk with its frame count, peak, and integer RMS — the
    speech-pipeline primitive (VAD windows, ASR segments, diarization
    frames all start from exactly this shape).

    Scale shape: 1→N row explosion INSIDE Arrow batches (the
    ``frame_sample`` pattern on decoded samples instead of byte
    offsets) — map-only, payloads never shuffle, output rows are five
    scalars each.  RMS is ``sqrt(mean(x²))`` in float64 over int
    samples; for the ±A square-wave corpus every operand is exact, so
    the emitted integer is bit-stable and fully oracle-checkable.
    """
    import io
    import wave

    import numpy as np

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in AUDIO_CHUNK_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    assert w.getsampwidth() == 2 and w.getnchannels() == 1
                    pcm = np.frombuffer(
                        w.readframes(w.getnframes()), dtype="<i2"
                    ).astype(np.int64)
                for c in range(0, len(pcm), chunk_frames):
                    seg = pcm[c : c + chunk_frames]
                    rms = float(np.sqrt(np.mean((seg.astype(np.float64)) ** 2)))
                    out["media_id"].append(mid)
                    out["chunk_no"].append(c // chunk_frames)
                    out["n_frames"].append(len(seg))
                    out["peak"].append(int(np.max(np.abs(seg))))
                    out["rms"].append(int(round(rms)))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        chunk, schema=AUDIO_CHUNK_SCHEMA
    )
