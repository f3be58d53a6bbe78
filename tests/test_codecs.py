"""Real stdlib codecs (operators/codecs.py) and their ride through the
multimodal mapInPandas stages: PNG/BMP/WAV fixtures are constructed by
INDEPENDENT paths (hand-packed structs, manually filtered scanlines, the
stdlib ``wave`` writer) so decoder bugs cannot cancel encoder bugs."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest
from pyspark.sql import Row

from simple_anonymizer_spark.operators import codecs, multimodal

# A 2x2 RGB image used throughout: R G / B W
PIXELS_2X2 = bytes((255, 0, 0, 0, 255, 0,
                    0, 0, 255, 255, 255, 255))


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)


def png_bytes_manual(width, height, channels, pixels, filters):
    """Build a PNG by hand with the GIVEN per-row filter types — an
    independent construction path exercising the decoder's unfiltering."""
    color = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    rows = []
    prev = bytes(stride)
    for y, ftype in zip(range(height), filters):
        line = pixels[y * stride:(y + 1) * stride]
        if ftype == 0:
            enc = line
        elif ftype == 1:  # Sub: raw = cur - left
            enc = bytes((line[i] - (line[i - channels] if i >= channels else 0)) & 0xFF
                        for i in range(stride))
        elif ftype == 2:  # Up: raw = cur - up
            enc = bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ftype == 3:  # Average
            enc = bytes((line[i] - (((line[i - channels] if i >= channels else 0)
                                     + prev[i]) >> 1)) & 0xFF
                        for i in range(stride))
        elif ftype == 4:  # Paeth
            enc = bytes((line[i] - codecs._paeth(
                line[i - channels] if i >= channels else 0,
                prev[i],
                prev[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride))
        rows.append(bytes([ftype]) + enc)
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (codecs.PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + _chunk(b"IEND", b""))


def bmp_bytes_manual(width, height, rgb_topdown):
    """24-bit bottom-up BMP with 4-byte row padding, packed by hand."""
    row_bytes = (width * 3 + 3) & ~3
    pad = bytes(row_bytes - width * 3)
    body = b""
    for y in reversed(range(height)):  # bottom-up storage
        row = b""
        for x in range(width):
            r, g, b = rgb_topdown[(y * width + x) * 3:(y * width + x) * 3 + 3]
            row += bytes((b, g, r))  # BGR on disk
        body += row + pad
    offset = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
              + struct.pack("<iiiHHIIiiII", 40, width, height, 1, 24, 0,
                            len(body), 2835, 2835, 0, 0))
    return header + body


def wav_bytes_stdlib(channels=2, rate=8000, n_frames=64):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{n_frames * channels}h",
                                  *range(n_frames * channels)))
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Kernel-level pins
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filters", [(0, 0), (1, 2), (3, 4), (4, 1)])
def test_png_decode_all_filter_types(filters):
    data = png_bytes_manual(2, 2, 3, PIXELS_2X2, filters)
    assert codecs.png_decode(data) == (2, 2, 3, PIXELS_2X2)
    assert codecs.png_header(data)[:2] == (2, 2)


def test_png_encode_decode_roundtrip_all_channel_counts():
    for channels in (1, 3, 4):
        pixels = bytes(range(2 * 3 * channels))
        data = codecs.png_encode(2, 3, channels, pixels)
        assert codecs.png_decode(data) == (2, 3, channels, pixels)
        assert codecs.image_dims(data) == (2, 3)


def test_png_rejects_malformed():
    with pytest.raises(ValueError, match="not a PNG"):
        codecs.png_header(b"JFIF....")
    interlaced = (codecs.PNG_SIGNATURE
                  + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)))
    with pytest.raises(ValueError, match="interlaced"):
        codecs.png_header(interlaced)


def test_bmp_decode_undoes_bgr_bottomup_padding():
    data = bmp_bytes_manual(2, 2, PIXELS_2X2)
    assert codecs.bmp_decode(data) == (2, 2, 3, PIXELS_2X2)
    assert codecs.bmp_header(data) == (2, 2)
    assert codecs.image_dims(data) == (2, 2)


def test_wav_decode_matches_stdlib_writer():
    data = wav_bytes_stdlib(channels=2, rate=8000, n_frames=64)
    channels, rate, bits, n_frames, frames = codecs.wav_decode(data)
    assert (channels, rate, bits, n_frames) == (2, 8000, 16, 64)
    assert struct.unpack("<4h", frames[:8]) == (0, 1, 2, 3)


def test_resize_nearest_pinned():
    # 4x4 grayscale ramp -> 2x2 picks rows/cols 0 and 2
    pixels = bytes(range(16))
    out = codecs.resize_nearest(4, 4, 1, pixels, 2, 2)
    assert out == bytes((0, 2, 8, 10))
    up = codecs.resize_nearest(2, 2, 1, bytes((0, 1, 2, 3)), 4, 4)
    assert up == bytes((0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3))


def test_png_resizer_end_to_end_kernel():
    data = png_bytes_manual(2, 2, 3, PIXELS_2X2, (0, 0))
    resized = codecs.png_resizer(data, 4, 4)
    w, h, channels, pixels = codecs.png_decode(resized)
    assert (w, h, channels) == (4, 4, 3)
    # top-left quadrant is the red pixel
    assert pixels[0:3] == bytes((255, 0, 0))
    assert pixels[(4 * 3 + 3) * 3:(4 * 3 + 3) * 3 + 3] == bytes((255, 255, 255))


# ---------------------------------------------------------------------------
# Through the Spark mapInPandas stages (the real multimodal plumbing)
# ---------------------------------------------------------------------------


@pytest.fixture()
def media_df(spark):
    rows = [
        Row(media_id=1, content=png_bytes_manual(2, 2, 3, PIXELS_2X2, (0, 2)),
            mime_type="image/png"),
        Row(media_id=2, content=bmp_bytes_manual(2, 2, PIXELS_2X2),
            mime_type="image/bmp"),
        Row(media_id=3, content=None, mime_type=None),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_decode_image_default_decoder_real_formats(spark, media_df):
    got = {r.media_id: r for r in multimodal.decode_image(media_df).collect()}
    assert (got[1].width, got[1].height) == (2, 2)
    assert (got[2].width, got[2].height) == (2, 2)
    assert got[3].width is None and got[3].n_bytes is None


def test_resize_images_with_real_codec(spark, media_df):
    out = multimodal.resize_images(
        media_df.where("content IS NOT NULL"), 4, 2,
        resizer=codecs.png_resizer,
    ).collect()
    assert len(out) == 2
    for r in out:
        w, h, channels, pixels = codecs.png_decode(bytes(r.content))
        assert (w, h, channels) == (4, 2, 3)
        assert pixels[0:3] == bytes((255, 0, 0))  # red survives the resample


def test_extract_audio_meta_through_map_in_pandas(spark):
    rows = [
        Row(media_id=1, content=wav_bytes_stdlib(1, 16000, 100),
            mime_type="audio/wav"),
        Row(media_id=2, content=wav_bytes_stdlib(2, 44100, 5),
            mime_type="audio/wav"),
        Row(media_id=3, content=None, mime_type=None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.extract_audio_meta(df).collect()}
    assert (got[1].n_channels, got[1].sample_rate, got[1].n_frames) == (1, 16000, 100)
    assert (got[2].n_channels, got[2].sample_rate, got[2].bits_per_sample,
            got[2].n_frames) == (2, 44100, 16, 5)
    assert got[3].n_channels is None


# ---------------------------------------------------------------------------
# Perceptual hash over the REAL stdlib PNG decode
# ---------------------------------------------------------------------------


def _png_image(w, h, painter):
    from simple_anonymizer_spark.operators.codecs import png_encode

    pix = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            r, g, b = painter(x, y)
            base = (y * w + x) * 3
            pix[base:base + 3] = bytes((r, g, b))
    return png_encode(w, h, 3, bytes(pix))


def _hash_df(spark, images):
    from simple_anonymizer_spark.operators.multimodal import perceptual_hash

    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in images],
        "media_id long, content binary",
    )
    return perceptual_hash(df)


def test_phash_near_identical_images_close_distinct_far(spark):
    from simple_anonymizer_spark.operators.multimodal import (
        perceptual_neardup_pairs,
    )

    # half-black/half-white 32x32; a copy with one corner pixel flipped;
    # and its inverse (structurally opposite).
    base = _png_image(32, 32, lambda x, y: (255, 255, 255) if x >= 16 else (0, 0, 0))
    tweaked = _png_image(
        32, 32,
        lambda x, y: (200, 200, 200) if (x, y) == (0, 0)
        else ((255, 255, 255) if x >= 16 else (0, 0, 0)),
    )
    inverse = _png_image(32, 32, lambda x, y: (0, 0, 0) if x >= 16 else (255, 255, 255))
    hashed = _hash_df(spark, [(1, base), (2, tweaked), (3, inverse)])
    rows = {r.media_id: r for r in hashed.collect()}
    assert rows[1].width == 32 and rows[1].phash is not None
    assert rows[1].phash == rows[2].phash  # one pixel can't flip a block
    assert rows[1].phash != rows[3].phash
    pairs = perceptual_neardup_pairs(hashed, max_hamming=3).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    assert all(p.hamming == 0 for p in pairs)


def test_phash_deterministic_and_small_image_null(spark):
    img = _png_image(16, 16, lambda x, y: ((x * 16) % 256, (y * 16) % 256, 128))
    tiny = _png_image(4, 4, lambda x, y: (255, 0, 0))
    h1 = {r.media_id: r.phash for r in _hash_df(spark, [(1, img), (2, tiny)]).collect()}
    h2 = {r.media_id: r.phash for r in _hash_df(spark, [(1, img), (2, tiny)]).collect()}
    assert h1 == h2
    assert h1[2] is None           # below the 8x8 grid
    assert h1[1] is not None


def test_phash_roundtrip_through_encode_decode(spark):
    # encode -> decode -> re-encode: identical bytes, identical hash.
    from simple_anonymizer_spark.operators.codecs import png_decode, png_encode

    img = _png_image(24, 24, lambda x, y: ((x * 7) % 256, (y * 11) % 256, (x + y) % 256))
    w, h, ch, pix = png_decode(img)
    again = png_encode(w, h, ch, pix)
    ha = _hash_df(spark, [(1, img), (2, again)]).collect()
    assert ha[0].phash == ha[1].phash


def test_phash_quarantines_undecodable_content(spark):
    # Corrupt/unsupported bytes must yield a NULL row (quarantine
    # convention), not raise inside the mapInPandas batch — one bad image
    # in a 100 TB corpus must not fail the job.
    good = _png_image(16, 16, lambda x, y: (x * 10 % 256, 0, 0))
    rows = {r.media_id: r for r in _hash_df(spark, [
        (1, good),
        (2, b"\xff\xd8\xff\xe0 not actually decodable jpeg"),
        (3, b"\x89PNG\r\n\x1a\n truncated"),
    ]).collect()}
    assert rows[1].phash is not None
    assert rows[2].width is None and rows[2].phash is None
    assert rows[3].width is None and rows[3].phash is None


# ---------------------------------------------------------------------------
# Audio features (integer-exact PCM stats through mapInPandas)
# ---------------------------------------------------------------------------


def _wav_from_samples(samples, channels=1, rate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_audio_features_hand_computed(spark):
    """Square wave with a known period pins zero crossings, peak, and
    sum of squares exactly; stereo uses channel 0 only; silence is all
    zeros; corrupt bytes and NULLs quarantine."""
    square = [1000 if (i // 4) % 2 == 0 else -1000 for i in range(64)]
    stereo = []
    for i in range(32):
        stereo += [500 if i % 2 == 0 else -500, 30000]  # ch1 is loud junk
    rows = [
        Row(media_id=1, content=_wav_from_samples(square, 1, 16000),
            mime_type="audio/wav"),
        Row(media_id=2, content=_wav_from_samples(stereo, 2, 8000),
            mime_type="audio/wav"),
        Row(media_id=3, content=_wav_from_samples([0] * 10),
            mime_type="audio/wav"),
        Row(media_id=4, content=b"RIFFgarbage", mime_type="audio/wav"),
        Row(media_id=5, content=None, mime_type=None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.audio_features(df).collect()}

    r1 = got[1]
    assert (r1.n_samples, r1.peak_abs) == (64, 1000)
    assert r1.duration_us == 64 * 1_000_000 // 16000
    assert r1.sum_sq == 64 * 1000 * 1000
    assert r1.zero_crossings == 15          # sign flips every 4 samples
    r2 = got[2]
    assert (r2.n_samples, r2.peak_abs) == (32, 500)   # ch0 only
    assert r2.zero_crossings == 31
    r3 = got[3]
    assert (r3.sum_sq, r3.zero_crossings, r3.peak_abs) == (0, 0, 0)
    assert got[4].n_samples is None and got[5].n_samples is None


def test_audio_features_plan_has_one_pandas_stage(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, content=_wav_from_samples([1, -1]),
             mime_type="audio/wav")],
        multimodal.MEDIA_SCHEMA)
    plan = (multimodal.audio_features(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF container metadata (hand-built boxes, spec constants)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4_bytes(timescale=1000, duration=5000, w=640, h=360,
               audio_track=True, mvhd_version=0, large_moov=False):
    if mvhd_version == 1:
        mvhd = bytes([1, 0, 0, 0]) + b"\x00" * 16 + struct.pack(
            ">IQ", timescale, duration) + b"\x00" * 80
    else:
        mvhd = bytes(4) + b"\x00" * 8 + struct.pack(
            ">II", timescale, duration) + b"\x00" * 80
    def tkhd(width, height):
        return bytes(4) + b"\x00" * 72 + struct.pack(
            ">II", width << 16, height << 16)
    traks = _box(b"trak", _box(b"tkhd", tkhd(w, h)))
    if audio_track:
        traks += _box(b"trak", _box(b"tkhd", tkhd(0, 0)))
    moov_payload = _box(b"mvhd", mvhd) + traks
    if large_moov:
        moov = (struct.pack(">I", 1) + b"moov"
                + struct.pack(">Q", 16 + len(moov_payload)) + moov_payload)
    else:
        moov = _box(b"moov", moov_payload)
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov


def test_mp4_meta_hand_built_boxes():
    assert codecs.mp4_meta(_mp4_bytes()) == (5000, 640, 360, 2)
    # version-1 mvhd (64-bit duration) and largesize moov both parse
    assert codecs.mp4_meta(_mp4_bytes(mvhd_version=1)) == (5000, 640, 360, 2)
    assert codecs.mp4_meta(_mp4_bytes(large_moov=True)) == (5000, 640, 360, 2)
    # timescale converts: 90 kHz clock, 450000 ticks -> 5000 ms
    assert codecs.mp4_meta(_mp4_bytes(90000, 450000))[0] == 5000
    # audio-only: no visual size
    d, w, h, n = codecs.mp4_meta(_mp4_bytes(w=0, h=0, audio_track=False))
    assert (w, h, n) == (None, None, 1)


def test_mp4_meta_malformed_raises_valueerror():
    good = _mp4_bytes()
    for bad in (b"", b"shrt", b"\x00" * 40, good[:20],
                good.replace(b"mvhd", b"xxxx")):
        with pytest.raises(ValueError):
            codecs.mp4_meta(bad)
    # zero timescale and zero-progress box sizes must not hang
    with pytest.raises(ValueError):
        codecs.mp4_meta(_mp4_bytes(timescale=0))
    import numpy as _np
    rng = _np.random.RandomState(3)
    for trial in range(200):
        buf = bytearray(good)
        if trial % 3 == 0:
            buf = buf[: rng.randint(2, len(buf))]
        else:
            for _ in range(rng.randint(1, 4)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            codecs.mp4_meta(bytes(buf))
        except ValueError:
            pass  # the one allowed failure mode


def test_extract_video_meta_through_map_in_pandas(spark):
    rows = [
        Row(media_id=1, content=_mp4_bytes(), mime_type="video/mp4"),
        Row(media_id=2, content=b"not a video", mime_type="video/mp4"),
        Row(media_id=3, content=None, mime_type=None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.extract_video_meta(df).collect()}
    assert (got[1].duration_ms, got[1].width, got[1].height,
            got[1].n_tracks) == (5000, 640, 360, 2)
    assert got[2].duration_ms is None and got[3].duration_ms is None
    plan = (multimodal.extract_video_meta(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("MapInPandas") == 1 and "BatchEvalPython" not in plan


def _avi_bytes(us_per_frame=40000, frames=250, w=320, h=240, streams=2):
    avih = (struct.pack("<I", us_per_frame) + b"\x00" * 12
            + struct.pack("<I", frames) + b"\x00" * 4
            + struct.pack("<I", streams) + b"\x00" * 4
            + struct.pack("<II", w, h) + b"\x00" * 16)
    avih_chunk = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih_chunk)) + b"hdrl" + avih_chunk
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl


def test_avi_meta_and_dispatch():
    # 250 frames at 40 ms/frame (25 fps) -> 10 s
    assert codecs.avi_meta(_avi_bytes()) == (10000, 320, 240, 2)
    # the sniffing front door routes both containers
    assert codecs.video_meta(_avi_bytes())[0] == 10000
    assert codecs.video_meta(_mp4_bytes())[0] == 5000
    for bad in (b"RIFFxxxxWAVE", b"", b"\x00" * 64, _avi_bytes()[:20]):
        with pytest.raises(ValueError):
            codecs.video_meta(bad)


def test_extract_video_meta_sniffs_avi(spark):
    rows = [Row(media_id=1, content=_avi_bytes(), mime_type="video/avi"),
            Row(media_id=2, content=_mp4_bytes(), mime_type="video/mp4")]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in multimodal.extract_video_meta(df).collect()}
    assert (got[1].duration_ms, got[1].width, got[1].n_tracks) == (10000, 320, 2)
    assert got[2].duration_ms == 5000


# -- Motion-JPEG AVI: real frame-level video decode --------------------------


def _mjpeg_avi(levels=(0, 37, 254), w=8, h=8, fps=25):
    from simple_anonymizer_spark.operators.jpeg import jpeg_encode

    frames = [jpeg_encode(w, h, 1, bytes([lv]) * (w * h), quality=100)
              for lv in levels]
    return codecs.avi_mjpeg_encode(frames, w, h, fps=fps), frames


def test_mjpeg_avi_mux_demux_roundtrip():
    avi, frames = _mjpeg_avi()
    # demux returns the exact JPEG byte streams (word-alignment padding
    # is stripped — jpeg_encode output is frequently odd-length, which
    # exercises it)
    assert any(len(f) % 2 for f in frames)
    assert codecs.avi_mjpeg_frames(avi) == frames
    # the mux is a real AVI: the metadata walker reads it
    assert codecs.avi_meta(avi) == (120, 8, 8, 1)  # 3 frames at 40 ms
    assert codecs.video_meta(avi)[0] == 120


def test_mjpeg_video_decode_frames_exact_pixels():
    avi, _ = _mjpeg_avi(levels=(0, 37, 254))
    # flat 8x8 at quality 100 decodes exactly (pinned flat-block prop)
    got = [(i, w, h, ch, sum(p))
           for i, w, h, ch, p in codecs.video_decode_frames(avi)]
    assert got == [(0, 8, 8, 1, 0), (1, 8, 8, 1, 64 * 37),
                   (2, 8, 8, 1, 64 * 254)]
    # frame sampling: stride + cap
    assert [i for i, *_ in codecs.video_decode_frames(avi, every_n=2)] == [0, 2]
    assert len(codecs.video_decode_frames(avi, max_frames=1)) == 1
    with pytest.raises(ValueError):
        codecs.video_decode_frames(avi, every_n=0)


def test_mjpeg_decode_rejects_non_mjpeg_and_malformed():
    avi, frames = _mjpeg_avi()
    # MP4 payloads stay injection-only
    with pytest.raises(ValueError):
        codecs.video_decode_frames(_mp4_bytes())
    # a declared non-MJPG handler refuses frame decode
    with pytest.raises(ValueError):
        codecs.avi_mjpeg_frames(avi.replace(b"vidsMJPG", b"vidsH264"))
    # a metadata-only AVI (no stream header, no frames) refuses too
    with pytest.raises(ValueError):
        codecs.avi_mjpeg_frames(_avi_bytes())
    # frame chunk without a JPEG SOI
    soi_at = avi.index(frames[0][:4])
    broken = avi[:soi_at] + b"\x00\x00" + avi[soi_at + 2:]
    with pytest.raises(ValueError):
        codecs.avi_mjpeg_frames(broken)
    # fuzz: truncations and byte flips either parse or raise ValueError
    import numpy as _np
    rng = _np.random.RandomState(7)
    for trial in range(200):
        buf = bytearray(avi)
        if trial % 3 == 0:
            buf = buf[: rng.randint(2, len(buf))]
        else:
            for _ in range(rng.randint(1, 4)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        try:
            codecs.video_decode_frames(bytes(buf))
        except ValueError:
            pass  # the one allowed failure mode


def test_decode_video_frames_operator(spark):
    avi, _ = _mjpeg_avi(levels=(10, 20))
    rows = [Row(media_id=1, content=avi, mime_type="video/avi"),
            Row(media_id=2, content=b"not a video", mime_type=None),
            Row(media_id=3, content=None, mime_type=None)]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.decode_video_frames(df)
    got = sorted((r.media_id, r.frame_index, r.width, r.height,
                  r.channels, r.pixel_sum) for r in out.collect())
    # media 1 decodes 2 real frames; media 2 quarantines to one NULL
    # row; media 3 (NULL content) is dropped
    assert got == [
        (1, 0, 8, 8, 1, 64 * 10),
        (1, 1, 8, 8, 1, 64 * 20),
        (2, None, None, None, None, None),
    ]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1 and "BatchEvalPython" not in plan
