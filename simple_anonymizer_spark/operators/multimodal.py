"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each executor core processes whole record
batches.

Codecs: real stdlib-only decoders live in ``operators/codecs.py`` (PNG
and BMP decode, PNG encode, WAV PCM decode, nearest-neighbor resize) —
``decode_image`` uses them by default and any callable can be injected
for formats beyond them (JPEG/video need libraries this container does
not ship). The oracle-gated queries keep the deterministic stand-in
kernels (byte length + content hash) because DuckDB cannot decode
pixels; the real-codec path is pinned by ``tests/test_codecs.py``
end-to-end through the same mapInPandas stages.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

from ..functions.hashing import stable_hash

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("content", BinaryType(), True),
    StructField("mime_type", StringType(), True),
])

META_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType(), True),
    StructField("content_hash", LongType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def with_binary_content(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Adapter used by tests/fixtures: materialize a binary column from
    text so the media plumbing can be exercised without real media files."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("text/plain").alias("mime_type"),
    )


def decode_image(df: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Decode images to (media_id, n_bytes, width, height). The default
    ``decoder(bytes) -> (width, height)`` is the stdlib-only PNG/BMP
    header reader (``codecs.image_dims``); inject a callable (e.g.
    PIL-based) for other formats."""
    if decoder is None:
        from .codecs import image_dims as decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["content"].map(
                lambda b: decoder(b) if b is not None else (None, None)
            )
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["content"].map(lambda b: None if b is None else len(b)),
                "content_hash": pd.array([None] * len(pdf), dtype="Int64"),
                "width": dims.map(lambda d: d[0]),
                "height": dims.map(lambda d: d[1]),
            })
            yield out

    return df.mapInPandas(run, META_SCHEMA)


def extract_meta(df: DataFrame) -> DataFrame:
    """Deterministic metadata extraction (the stub 'decode'): byte length
    plus the engine's stable hash of the decoded-UTF8 content. Runs via
    mapInPandas to exercise the real multimodal batch path; values are
    reproducible by the DuckDB oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def h(b: bytes | None):
            if b is None or len(b) == 0:
                return 0
            return int.from_bytes(hashlib.md5(b).digest()[:4], "big") & 0x7FFFFFFF

        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["content"].map(lambda b: None if b is None else len(b)),
                "content_hash": pdf["content"].map(h),
                "width": pd.array([None] * len(pdf), dtype="Int32"),
                "height": pd.array([None] * len(pdf), dtype="Int32"),
            })

    return df.mapInPandas(run, META_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("content", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", IntegerType(), True),
    StructField("frame", BinaryType(), True),
])


def resize_images(
    df: DataFrame, width: int, height: int, resizer: Callable | None = None
) -> DataFrame:
    """Resize image payloads via Arrow-batched mapInPandas. The codec is
    injectable (``resizer(bytes, w, h) -> bytes``); without one, a
    deterministic stand-in truncates/pads bytes to ``w*h`` so the batch
    plumbing and schemas stay testable in this container."""

    def fake_resize(b: bytes, w: int, h: int) -> bytes:
        target = w * h
        return (b * (target // max(len(b), 1) + 1))[:target] if b else b

    impl = resizer or fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "content": pdf["content"].map(
                    lambda b: None if b is None else impl(b, width, height)
                ),
                "width": width,
                "height": height,
            })

    return df.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8,
    extractor: Callable | None = None,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    (1:N mapInPandas — the shape a real decoder needs). The stand-in slices
    the byte stream every ``every_n_bytes``; inject ``extractor(bytes) ->
    list[bytes]`` for a real codec."""

    def fake_frames(b: bytes) -> list[bytes]:
        return [
            b[i:i + every_n_bytes]
            for i in range(0, min(len(b), every_n_bytes * max_frames), every_n_bytes)
        ]

    impl = extractor or fake_frames

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                for i, frame in enumerate(impl(content)):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame": frames}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


AUDIO_META_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_channels", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("bits_per_sample", IntegerType(), True),
    StructField("n_frames", LongType(), True),
])


def extract_audio_meta(df: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Audio metadata via Arrow-batched mapInPandas. Default decoder is
    the stdlib RIFF/PCM parser (``codecs.wav_decode``); injectable for
    other containers/codecs. ``decoder(bytes) -> (channels, rate, bits,
    n_frames, frame_bytes)``."""
    if decoder is None:
        from .codecs import wav_decode as decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (None, None, None, None) if b is None else decoder(b)[:4]
                for b in pdf["content"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_channels": pd.array([r[0] for r in rows], dtype="Int32"),
                "sample_rate": pd.array([r[1] for r in rows], dtype="Int32"),
                "bits_per_sample": pd.array([r[2] for r in rows], dtype="Int32"),
                "n_frames": pd.array([r[3] for r in rows], dtype="Int64"),
            })

    return df.mapInPandas(run, AUDIO_META_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_samples", LongType(), True),
    StructField("duration_us", LongType(), True),
    StructField("peak_abs", IntegerType(), True),
    StructField("sum_sq", LongType(), True),
    StructField("zero_crossings", LongType(), True),
])


def audio_features(df: DataFrame, decoder: Callable | None = None) -> DataFrame:
    """Per-record PCM audio features over a REAL decode (stdlib RIFF/PCM
    parser by default, injectable like every codec slot): channel-0
    sample count, integer-exact duration in microseconds, peak absolute
    amplitude, sum of squared samples, and zero-crossing count (sign-bit
    change between consecutive samples).

    Every emitted value is an exact integer — RMS/loudness are one
    float op away for callers, but the stored features are
    bit-reproducible anywhere (the engine's determinism contract).
    16-bit PCM only; other widths, corrupt bytes, and NULLs quarantine
    to NULL feature rows (the phash convention) instead of failing the
    batch. ``sum_sq`` headroom: 32768^2 * n stays inside int64 up to
    ~8.6e9 samples per record (~67 h at 16 kHz mono).

    Scale (100 TB): Arrow-batched mapInPandas, one pandas stage, numpy
    vectorized per record; all downstream filtering/aggregation is
    native column algebra.
    """
    if decoder is None:
        from .codecs import wav_decode as decoder

    def one(b):
        if b is None:
            return (None, None, None, None, None)
        try:
            channels, rate, bits, n_frames, frames = decoder(b)
        except Exception:
            return (None, None, None, None, None)  # quarantine
        if bits != 16 or channels < 1 or rate <= 0:
            return (None, None, None, None, None)
        arr = np.frombuffer(frames, dtype="<i2")
        arr = arr[: (len(arr) // channels) * channels]
        ch0 = arr.reshape(-1, channels)[:, 0].astype(np.int64)
        n = int(ch0.size)
        duration_us = n * 1_000_000 // rate
        peak = int(np.abs(ch0).max()) if n else 0
        sum_sq = int((ch0 * ch0).sum()) if n else 0
        zc = int(((ch0[:-1] < 0) != (ch0[1:] < 0)).sum()) if n > 1 else 0
        return (n, duration_us, peak, sum_sq, zc)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(b) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_samples": pd.array([r[0] for r in rows], dtype="Int64"),
                "duration_us": pd.array([r[1] for r in rows], dtype="Int64"),
                "peak_abs": pd.array([r[2] for r in rows], dtype="Int32"),
                "sum_sq": pd.array([r[3] for r in rows], dtype="Int64"),
                "zero_crossings": pd.array([r[4] for r in rows],
                                           dtype="Int64"),
            })

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


VIDEO_META_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("duration_ms", LongType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_tracks", IntegerType(), True),
])


def extract_video_meta(df: DataFrame, parser: Callable | None = None) -> DataFrame:
    """Video container metadata via Arrow-batched mapInPandas: the real
    from-scratch ISO BMFF walker (``codecs.mp4_meta``) by default —
    duration, visual dimensions, track count, NO frame decode (that
    stays injection-only; there is no stdlib video codec). Corrupt or
    non-MP4 bytes quarantine to NULL rows, the phash convention.
    ``parser(bytes) -> (duration_ms, width, height, n_tracks)``. The
    default sniffs the container (``codecs.video_meta``: ISO BMFF or
    RIFF AVI)."""
    if parser is None:
        from .codecs import video_meta as parser

    def one(b):
        if b is None:
            return (None, None, None, None)
        try:
            return parser(b)
        except Exception:
            return (None, None, None, None)  # quarantine, don't fail

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(b) for b in pdf["content"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "duration_ms": pd.array([r[0] for r in rows], dtype="Int64"),
                "width": pd.array([r[1] for r in rows], dtype="Int32"),
                "height": pd.array([r[2] for r in rows], dtype="Int32"),
                "n_tracks": pd.array([r[3] for r in rows], dtype="Int32"),
            })

    return df.mapInPandas(run, VIDEO_META_SCHEMA)


VIDEO_FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", IntegerType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("channels", IntegerType(), True),
    StructField("pixel_sum", LongType(), True),
])


def decode_video_frames(
    df: DataFrame,
    decoder: Callable | None = None,
    every_n: int = 1,
    max_frames: int = 8,
) -> DataFrame:
    """REAL sampled-frame video decode (1:N mapInPandas): the default
    decoder is ``codecs.video_decode_frames`` — RIFF demux + the
    from-scratch baseline JPEG codec, so Motion-JPEG-in-AVI payloads
    decode to pixels with zero third-party code. Per sampled frame one
    output row of bounded integer stats (``frame_index, width, height,
    channels, pixel_sum``) rather than raw pixels — at 100 TB the frame
    tensors stay inside the Arrow batch and only fixed-width stats hit
    the shuffle. Undecodable payloads (corrupt bytes, inter-frame
    codecs without an injected decoder) quarantine to ONE NULL-stats
    row, the extract_video_meta convention. ``decoder(bytes, every_n,
    max_frames) -> [(idx, w, h, channels, pixels)]``."""
    if decoder is None:
        from .codecs import video_decode_frames as decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, chs, sums = [], [], [], [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                try:
                    frames = decoder(bytes(content), every_n, max_frames)
                except Exception:
                    ids.append(media_id)
                    for col in (idxs, ws, hs, chs, sums):
                        col.append(None)
                    continue
                for idx, w, h, ch, pix in frames:
                    ids.append(media_id)
                    idxs.append(idx)
                    ws.append(w)
                    hs.append(h)
                    chs.append(ch)
                    sums.append(int(np.frombuffer(pix, dtype=np.uint8)
                                    .astype(np.int64).sum()))
            yield pd.DataFrame({
                "media_id": pd.array(ids, dtype="Int64"),
                "frame_index": pd.array(idxs, dtype="Int32"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "channels": pd.array(chs, dtype="Int32"),
                "pixel_sum": pd.array(sums, dtype="Int64"),
            })

    return df.mapInPandas(run, VIDEO_FRAME_SCHEMA)


def extract_meta_native(df: DataFrame) -> DataFrame:
    """The same metadata as pure column expressions (no Python) — used when
    the 'decode' is hash/length-only; 10-100x faster than the UDF path and
    the production default for integrity sweeps."""
    content_str = F.decode(F.col("content"), "UTF-8")
    return df.select(
        F.col("media_id"),
        F.length(F.col("content")).cast("long").alias("n_bytes"),
        stable_hash(content_str).alias("content_hash"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def perceptual_hash(
    df: DataFrame,
    decoder: Callable | None = None,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """64-bit average-hash (aHash) over a REAL image decode — the
    stdlib PNG/BMP pixel decoders by default (``codecs.image_decode``),
    or an injected ``decoder(bytes) -> (w, h, channels, pixels)``.

    Per image: integer grayscale (channel sum // channels, alpha
    excluded), 8x8 block means with floor arithmetic, one global floor
    mean, bit i set when block i >= mean — every step integer-exact, so
    the hash is bit-reproducible anywhere. Images smaller than 8x8
    hash to NULL (no stable block grid). Undecodable content (corrupt
    bytes, or an unsupported container such as JPEG without an injected
    decoder) quarantines to a NULL-hash row — the repo's
    quarantine-not-exception convention (textfiles.py) — instead of
    failing the whole batch. Output: ``<id_col>, width, height,
    phash (int64, two's-complement)``.

    Scale (100 TB): Arrow-batched mapInPandas over whole binary records
    — the designed Python slot for codec work; everything downstream
    (banding, pairing) is native column algebra.
    """
    if decoder is None:
        from .codecs import image_decode as decoder

    def one(b):
        if b is None:
            return (None, None, None)
        try:
            w, h, ch, pix = decoder(b)
        except Exception:
            return (None, None, None)  # quarantine, don't fail the batch
        if w < 8 or h < 8:
            return (w, h, None)
        color_ch = 3 if ch >= 3 else 1  # ignore alpha in RGBA/LA
        gray = bytearray(w * h)
        for p in range(w * h):
            base = p * ch
            s = 0
            for c in range(color_ch):
                s += pix[base + c]
            gray[p] = s // color_ch
        blocks = []
        for by in range(8):
            y0, y1 = by * h // 8, (by + 1) * h // 8
            for bx in range(8):
                x0, x1 = bx * w // 8, (bx + 1) * w // 8
                total, cnt = 0, 0
                for y in range(y0, y1):
                    row = y * w
                    for x in range(x0, x1):
                        total += gray[row + x]
                        cnt += 1
                blocks.append(total // cnt)
        mean = sum(blocks) // 64
        bits = 0
        for i, v in enumerate(blocks):
            if v >= mean:
                bits |= 1 << i
        if bits >= 1 << 63:  # two's-complement into int64
            bits -= 1 << 64
        return (w, h, bits)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(b) for b in pdf[content_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": pd.array([r[0] for r in rows], dtype="Int32"),
                "height": pd.array([r[1] for r in rows], dtype="Int32"),
                "phash": pd.array([r[2] for r in rows], dtype="Int64"),
            })

    schema = (f"{id_col} long, width int, height int, phash long")
    return df.mapInPandas(run, schema)


def perceptual_neardup_pairs(
    hashed: DataFrame,
    max_hamming: int = 8,
    id_col: str = "media_id",
) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.

    Candidates come from 4x16-bit band buckets (pigeonhole: any pair
    within Hamming distance 3 shares at least one exact band; beyond
    that the band screen is a recall/cost trade, the standard pHash
    banding). Verification is native ``bit_count(a ^ b)``. Output:
    ``id_a, id_b (id_a < id_b), hamming (int64)``.

    Scale: band explode is 4 rows per image; the pair join is an
    equi-join on (band index, band value) — bucketed by near-identical
    regions of the hash space, never all-pairs.
    """
    h = hashed.where(F.col("phash").isNotNull()).select(
        F.col(id_col).alias("__id"), "phash"
    )
    bands = h.select(
        "__id", "phash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.expr(f"(phash >> {16 * i}) & 65535").alias("val"),
                )
                for i in range(4)
            ])
        ).alias("__b"),
    ).select("__id", "phash",
             F.col("__b.band").alias("__band"), F.col("__b.val").alias("__val"))
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__val") == F.col("b.__val"))
            & (F.col("a.__id") < F.col("b.__id")),
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.bit_count(
                F.expr("a.phash ^ b.phash")
            ).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def synthetic_video_meta(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """Driver-verifiable exercise of the REAL video metadata parser:
    inside ONE pandas stage, synthesize a deterministic minimal MP4 per
    row (ftyp + moov(mvhd v0 + trak(tkhd)) — timescale 1000, duration
    ticks = n_chars * 40, width = 160 + 16 * (doc_id % 20), height =
    90 + 9 * (doc_id % 20)) with plain struct packing, then parse it
    back through ``codecs.mp4_meta``. The output is therefore a CLOSED
    FORM of the inputs (duration_ms = n_chars * 40), which is exactly
    what makes the round trip oracle-checkable: any regression in the
    box walker breaks the value-hash match. Output: ``doc id,
    duration_ms, width, height, n_tracks``."""
    import struct as _s

    from .codecs import mp4_meta

    def _box(btype: bytes, payload: bytes) -> bytes:
        return _s.pack(">I", 8 + len(payload)) + btype + payload

    def one(doc_id: int, n_chars: int):
        w = 160 + 16 * (doc_id % 20)
        h = 90 + 9 * (doc_id % 20)
        mvhd = (bytes(4) + b"\x00" * 8
                + _s.pack(">II", 1000, n_chars * 40) + b"\x00" * 80)
        tkhd = (bytes(4) + b"\x00" * 72
                + _s.pack(">II", w << 16, h << 16))
        data = (_box(b"ftyp", b"isom\x00\x00\x02\x00isom")
                + _box(b"moov", _box(b"mvhd", mvhd)
                       + _box(b"trak", _box(b"tkhd", tkhd))))
        return mp4_meta(data)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(int(i), int(n))
                    for i, n in zip(pdf[id_col], pdf[len_col])]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "duration_ms": pd.array([r[0] for r in rows], dtype="Int64"),
                "width": pd.array([r[1] for r in rows], dtype="Int32"),
                "height": pd.array([r[2] for r in rows], dtype="Int32"),
                "n_tracks": pd.array([r[3] for r in rows], dtype="Int32"),
            })

    return df.select(id_col, len_col).mapInPandas(
        run, f"{id_col} long, duration_ms long, width int, height int, "
             f"n_tracks int")


def synthetic_audio_features(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """Driver-verifiable exercise of the REAL WAV decode + feature
    kernel: one pandas stage synthesizes a deterministic PCM file per
    row (mono 8 kHz, n_chars samples alternating +amp/-amp with
    amp = 100 + doc_id % 900) via plain struct packing, then runs it
    through codecs.wav_decode + the audio_features math. Every output
    is a CLOSED FORM of the inputs — n_samples = n_chars, peak = amp,
    sum_sq = n_chars * amp^2, zero_crossings = n_chars - 1,
    duration_us = n_chars * 1_000_000 // 8000 — so the oracle hash
    gates the decoder, not a stub. Output: ``doc id, n_samples,
    duration_us, peak_abs, sum_sq, zero_crossings``."""
    import struct as _s

    from .codecs import wav_decode

    def one(doc_id: int, n: int):
        amp = 100 + doc_id % 900
        samples = [amp if i % 2 == 0 else -amp for i in range(n)]
        frames = _s.pack(f"<{n}h", *samples)
        hdr = (b"RIFF" + _s.pack("<I", 36 + len(frames)) + b"WAVE"
               + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 1, 8000,
                                   16000, 2, 16)
               + b"data" + _s.pack("<I", len(frames)))
        ch, rate, bits, n_frames, fr = wav_decode(hdr + frames)
        arr = np.frombuffer(fr, dtype="<i2").astype(np.int64)
        zc = int(((arr[:-1] < 0) != (arr[1:] < 0)).sum()) if n > 1 else 0
        return (n_frames, n_frames * 1_000_000 // rate,
                int(np.abs(arr).max()) if n else 0,
                int((arr * arr).sum()), zc)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(int(i), int(n))
                    for i, n in zip(pdf[id_col], pdf[len_col])]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_samples": pd.array([r[0] for r in rows], dtype="Int64"),
                "duration_us": pd.array([r[1] for r in rows], dtype="Int64"),
                "peak_abs": pd.array([r[2] for r in rows], dtype="Int32"),
                "sum_sq": pd.array([r[3] for r in rows], dtype="Int64"),
                "zero_crossings": pd.array([r[4] for r in rows],
                                           dtype="Int64"),
            })

    return df.select(id_col, len_col).mapInPandas(
        run, f"{id_col} long, n_samples long, duration_us long, "
             f"peak_abs int, sum_sq long, zero_crossings long")


def synthetic_image_meta(
    df: DataFrame, id_col: str = "doc_id", len_col: str = "n_chars"
) -> DataFrame:
    """Driver-verifiable exercise of the REAL PNG codec (the image twin
    of the audio/video synthesis queries): one pandas stage encodes a
    flat grayscale PNG per row (w = 8 + doc_id % 16, h = 8 + n_chars %
    16, level = doc_id % 256) with ``codecs.png_encode``, decodes it
    back with ``codecs.png_decode``, and emits dimensions plus the
    decoded pixel sum — all closed forms of the inputs (pixel_sum =
    w * h * level), so the driver hash gates the zlib/filter round trip
    end-to-end. Output: ``doc id, width, height, n_pixels, pixel_sum,
    png_bytes`` (the encoded size is NOT oracle-pinned — it may vary
    with zlib — so it is excluded; see query projection)."""
    from .codecs import png_decode, png_encode

    def one(doc_id: int, n_chars: int):
        w = 8 + doc_id % 16
        h = 8 + n_chars % 16
        level = doc_id % 256
        png = png_encode(w, h, 1, bytes([level]) * (w * h))
        dw, dh, ch, pix = png_decode(png)
        return (dw, dh, dw * dh, sum(pix))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(int(i), int(n))
                    for i, n in zip(pdf[id_col], pdf[len_col])]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": pd.array([r[0] for r in rows], dtype="Int32"),
                "height": pd.array([r[1] for r in rows], dtype="Int32"),
                "n_pixels": pd.array([r[2] for r in rows], dtype="Int64"),
                "pixel_sum": pd.array([r[3] for r in rows], dtype="Int64"),
            })

    return df.select(id_col, len_col).mapInPandas(
        run, f"{id_col} long, width int, height int, n_pixels long, "
             f"pixel_sum long")


def synthetic_jpeg_roundtrip(
    df: DataFrame, id_col: str = "doc_id", sample_mod: int = 10
) -> DataFrame:
    """Driver-verifiable exercise of the REAL baseline JPEG codec: per
    sampled row (``doc_id % sample_mod == 0`` — JPEG decode is pure
    Python, so the registry query bounds its own row count), encode one
    flat 8x8 grayscale block (level = doc_id % 256) at quality 100 and
    decode it back. Flat content at quality 100 is EXACT (all-ones
    quant tables, DC-only — the pinned ``test_flat_color_q100``
    property), so width, height, and the decoded pixel sum are closed
    forms: ``8, 8, 64 * level``. A regression anywhere in marker
    parsing, Huffman, dequant, or IDCT breaks the driver's value hash.
    Output: ``doc id, width, height, pixel_sum``."""
    from .jpeg import jpeg_decode, jpeg_encode

    def one(doc_id: int):
        level = doc_id % 256
        enc = jpeg_encode(8, 8, 1, bytes([level]) * 64, quality=100)
        w, h, ch, pix = jpeg_decode(enc)
        return (w, h, sum(pix))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(int(i)) for i in pdf[id_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": pd.array([r[0] for r in rows], dtype="Int32"),
                "height": pd.array([r[1] for r in rows], dtype="Int32"),
                "pixel_sum": pd.array([r[2] for r in rows], dtype="Int64"),
            })

    return (
        df.select(id_col)
        .where(F.col(id_col) % sample_mod == 0)
        .mapInPandas(run, f"{id_col} long, width int, height int, "
                          f"pixel_sum long")
    )


def synthetic_mjpeg_frames(
    df: DataFrame, id_col: str = "doc_id", sample_mod: int = 10
) -> DataFrame:
    """Driver-verifiable exercise of the REAL video frame-decode path
    (the moving-picture completion of the synthesis family): per
    sampled row (``doc_id % sample_mod == 0`` — JPEG decode is pure
    Python, so the query bounds its own row count), encode ``1 +
    doc_id % 3`` flat 8x8 grayscale frames (frame ``i`` at level
    ``(doc_id + 37 * i) % 256``, quality 100 — exact, the pinned flat-
    block property), mux them into a Motion-JPEG AVI with
    ``codecs.avi_mjpeg_encode``, then run the whole REAL read side —
    RIFF demux + per-frame JPEG decode via
    ``codecs.video_decode_frames`` — and emit one row per frame. Every
    output is a closed form of the inputs (``pixel_sum = 64 *
    ((doc_id + 37 * frame_idx) % 256)``), so the driver's value hash
    gates muxer, demuxer, and codec end-to-end. Output: ``doc id,
    frame_idx, width, height, pixel_sum``."""
    from .codecs import avi_mjpeg_encode, video_decode_frames
    from .jpeg import jpeg_encode

    def one(doc_id: int):
        n = 1 + doc_id % 3
        frames = [
            jpeg_encode(8, 8, 1,
                        bytes([(doc_id + 37 * i) % 256]) * 64, quality=100)
            for i in range(n)
        ]
        avi = avi_mjpeg_encode(frames, 8, 8, fps=25)
        return [
            (idx, w, h, sum(pix))
            for idx, w, h, _ch, pix in video_decode_frames(avi)
        ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, sums = [], [], [], [], []
            for doc_id in pdf[id_col]:
                for idx, w, h, s in one(int(doc_id)):
                    ids.append(doc_id)
                    idxs.append(idx)
                    ws.append(w)
                    hs.append(h)
                    sums.append(s)
            yield pd.DataFrame({
                id_col: pd.array(ids, dtype="Int64"),
                "frame_idx": pd.array(idxs, dtype="Int64"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "pixel_sum": pd.array(sums, dtype="Int64"),
            })

    return (
        df.select(id_col)
        .where(F.col(id_col) % sample_mod == 0)
        .mapInPandas(run, f"{id_col} long, frame_idx long, width int, "
                          f"height int, pixel_sum long")
    )
