"""Real media codecs built ONLY on the Python standard library (+ numpy
for pixel resampling): PNG and BMP image decode, PNG encode, WAV audio
decode, nearest-neighbor resize.

These exist because the container ships no PIL/ffmpeg, yet "the decode
step is stubbed" was the remaining multimodal gap: the ``mapInPandas``
plumbing in ``operators/multimodal.py`` was proven on stand-in byte
arithmetic only. The formats below have fully public, stdlib-decodable
encodings — PNG is zlib (RFC 1950/1951) + per-scanline filters (RFC
2083), BMP is plain little-endian structs, WAV is RIFF PCM — so a real
decode → transform → re-encode path can run and be pinned in tests
without any third-party install.

Scope: PNG 8-bit greyscale/RGB/RGBA, non-interlaced (the overwhelmingly
common case); BMP 24-bit uncompressed; WAV PCM; baseline sequential
JPEG (grayscale + YCbCr 4:4:4/4:2:2/4:2:0, restart markers — see
jpeg.py, pure Python + numpy per the public ITU T.81 spec). Anything
else raises ``ValueError`` — callers fall back to injection, same
contract as before. Video container METADATA is real for both families:
``mp4_meta`` walks ISO BMFF boxes (ISO/IEC 14496-12) and ``avi_meta``
walks RIFF. Video FRAME decode is real for Motion-JPEG-in-AVI
(``avi_mjpeg_frames`` demuxes the RIFF chunks, ``jpeg.jpeg_decode``
decodes each frame — MJPEG is intra-only, so the still codec IS the
video codec); inter-frame codecs (H.264 etc.) stay injection-only.

These are per-record kernels meant to run INSIDE the Arrow-batched
``mapInPandas`` stages (``multimodal.decode_image(df,
decoder=codecs.image_dims)`` etc.) — the distribution story is the
existing multimodal plumbing, unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        yield ctype, payload
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            return


def png_header(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG")
    for ctype, payload in _png_chunks(data):
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if comp != 0 or filt != 0:
                raise ValueError("unsupported PNG compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            return w, h, depth, color
    raise ValueError("PNG missing IHDR")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Full decode -> (width, height, channels, raw pixels row-major,
    top-down). 8-bit depth, color types 0/2/4/6, non-interlaced."""
    w, h, depth, color = png_header(data)
    if depth != 8 or color not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG depth/color ({depth}/{color})")
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(
        b"".join(p for t, p in _png_chunks(data) if t == b"IDAT")
    )
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        row_start = y * (stride + 1)
        filter_type = raw[row_start]
        line = bytearray(raw[row_start + 1:row_start + 1 + stride])
        if filter_type == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif filter_type == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif filter_type == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filter_type == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                up_left = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif filter_type != 0:
            raise ValueError(f"unknown PNG filter {filter_type}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return w, h, channels, bytes(out)


def png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal non-interlaced 8-bit encoder (filter 0 rows). Inverse of
    :func:`png_decode` for the supported color types."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match dimensions")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height)
    )
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


# -- BMP ---------------------------------------------------------------------


def bmp_header(data: bytes) -> tuple[int, int]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack("<ii", data[18:26])
    return w, abs(h)


def bmp_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """24-bit uncompressed BMP -> (width, height, 3, RGB pixels top-down).
    BMP stores BGR bottom-up with 4-byte row padding; both are undone."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    w, h_signed = struct.unpack("<ii", data[18:26])
    (bpp,) = struct.unpack("<H", data[28:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP ({bpp}bpp, compression {compression})")
    h = abs(h_signed)
    bottom_up = h_signed > 0
    row_bytes = (w * 3 + 3) & ~3
    out = bytearray(w * h * 3)
    for y in range(h):
        src_y = (h - 1 - y) if bottom_up else y
        row = data[offset + src_y * row_bytes: offset + src_y * row_bytes + w * 3]
        for x in range(w):
            b, g, r = row[3 * x:3 * x + 3]
            out[(y * w + x) * 3:(y * w + x) * 3 + 3] = bytes((r, g, b))
    return w, h, 3, bytes(out)


# -- WAV ---------------------------------------------------------------------


def wav_decode(data: bytes) -> tuple[int, int, int, int, bytes]:
    """RIFF PCM WAV -> (n_channels, sample_rate, bits_per_sample, n_frames,
    frame bytes). Parsed with structs directly (not the ``wave`` module) so
    tests can build fixtures WITH ``wave`` and decode independently."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, frames = 12, None, None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + length]
        if ctype == b"fmt ":
            audio_format, channels, rate = struct.unpack("<HHI", payload[:8])
            (bits,) = struct.unpack("<H", payload[14:16])
            if audio_format != 1:
                raise ValueError(f"unsupported WAV format {audio_format}")
            fmt = (channels, rate, bits)
        elif ctype == b"data":
            frames = payload
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    channels, rate, bits = fmt
    frame_size = channels * (bits // 8)
    return channels, rate, bits, len(frames) // frame_size, frames


# -- MP4 / ISO BMFF (video container metadata) -------------------------------


def _mp4_boxes(data: bytes, start: int, end: int):
    """Iterate ``(type, payload_start, payload_end)`` over an ISO BMFF
    box range. Malformed sizes raise ValueError — including the
    zero/negative-progress shapes that would otherwise loop forever on
    crafted input."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            header = 16
        elif size == 0:  # box extends to end of enclosing range
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError("malformed box size")
        yield btype, pos + header, pos + size
        pos += size


def mp4_meta(data: bytes) -> tuple[int, int | None, int | None, int]:
    """ISO BMFF (MP4/MOV family, public ISO/IEC 14496-12) container
    metadata WITHOUT any frame decode: ``(duration_ms, width, height,
    n_tracks)``. Duration comes from ``mvhd`` (versions 0 and 1);
    width/height from the first ``tkhd`` with a non-zero visual size
    (16.16 fixed point, the last 8 payload bytes in both versions);
    ``n_tracks`` counts ``trak`` boxes. Frame DECODE stays
    injection-only (no stdlib video codec exists) — this closes the
    metadata half of the video story with the same untrusted-bytes
    contract as the other codecs: any malformed input raises
    ValueError, never a stray struct/Index error or a hang."""
    try:
        return _mp4_meta_inner(data)
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"malformed MP4: {type(exc).__name__}") from exc


def _mp4_meta_inner(data: bytes):
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF file (missing ftyp)")
    moov = None
    for btype, s, e in _mp4_boxes(data, 0, len(data)):
        if btype == b"moov":
            moov = (s, e)
            break
    if moov is None:
        raise ValueError("no moov box")
    duration_ms = width = height = None
    n_tracks = 0
    for btype, s, e in _mp4_boxes(data, *moov):
        if btype == b"mvhd":
            version = data[s]
            if version == 1:
                timescale, duration = struct.unpack(">IQ", data[s + 20:s + 32])
            else:
                timescale, duration = struct.unpack(">II", data[s + 12:s + 20])
            if timescale == 0:
                raise ValueError("mvhd timescale is zero")
            duration_ms = duration * 1000 // timescale
        elif btype == b"trak":
            n_tracks += 1
            for ctype, cs, ce in _mp4_boxes(data, s, e):
                if ctype == b"tkhd":
                    if ce - cs < 8:
                        raise ValueError("tkhd too short")
                    w_fp, h_fp = struct.unpack(">II", data[ce - 8:ce])
                    w, h = w_fp >> 16, h_fp >> 16
                    if w and h and width is None:
                        width, height = w, h
    if duration_ms is None:
        raise ValueError("no mvhd box")
    return duration_ms, width, height, n_tracks


def avi_meta(data: bytes) -> tuple[int, int | None, int | None, int]:
    """RIFF AVI container metadata (public OpenDML/VfW layout — the
    WAV sibling): ``(duration_ms, width, height, n_streams)`` from the
    ``avih`` main header (microseconds per frame, total frames, dims).
    Same ValueError contract as ``mp4_meta``."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    try:
        pos = 12
        while pos + 8 <= len(data):
            ctype = data[pos:pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
            if ctype == b"LIST" and data[pos + 8:pos + 12] == b"hdrl":
                inner = pos + 12
                end = pos + 8 + length
                while inner + 8 <= min(end, len(data)):
                    itype = data[inner:inner + 4]
                    (ilen,) = struct.unpack("<I", data[inner + 4:inner + 8])
                    if itype == b"avih":
                        p = data[inner + 8:inner + 8 + ilen]
                        (us_per_frame,) = struct.unpack("<I", p[0:4])
                        (total_frames,) = struct.unpack("<I", p[16:20])
                        (n_streams,) = struct.unpack("<I", p[24:28])
                        w, h = struct.unpack("<II", p[32:40])
                        duration_ms = total_frames * us_per_frame // 1000
                        return (duration_ms, w or None, h or None,
                                n_streams)
                    inner += 8 + ilen + (ilen & 1)
            pos += 8 + length + (length & 1)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed AVI: {type(exc).__name__}") from exc
    raise ValueError("AVI missing avih header")


def video_meta(data: bytes) -> tuple[int, int | None, int | None, int]:
    """Container-sniffing video metadata — the default ``parser`` for
    ``multimodal.extract_video_meta``: ISO BMFF (ftyp at offset 4) or
    RIFF AVI; anything else raises ValueError (quarantine upstream)."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return mp4_meta(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return avi_meta(data)
    raise ValueError("unrecognized video container")


# -- Motion-JPEG AVI: real frame-level video decode --------------------------


def avi_mjpeg_encode(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Minimal RIFF AVI muxer for Motion-JPEG (public VfW/OpenDML
    layout): ``hdrl(avih + strl(strh 'vids'/'MJPG' + strf
    BITMAPINFOHEADER)) + movi('00dc' chunks, word-aligned) + idx1``.
    Each element of ``frames`` must be a complete baseline JPEG byte
    stream (``jpeg.jpeg_encode`` output). The product round-trips
    through ``avi_meta`` (duration/dims/stream count) and
    ``avi_mjpeg_frames`` (frame extraction)."""
    if not frames:
        raise ValueError("MJPEG AVI needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("frame is not a JPEG byte stream (no SOI)")

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return b"LIST" + struct.pack("<I", 4 + len(payload)) + ltype + payload

    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I", us_per_frame, max_bytes * fps, 0, 0x10,  # HASINDEX
        len(frames), 0, 1, max_bytes, width, height
    ) + bytes(16)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHH8I", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max_bytes, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    # idx1 offsets are relative to the 'movi' fourcc (the common
    # convention); each frame is a keyframe (AVIIF_KEYFRAME = 0x10).
    idx, off = [], 4
    for f in frames:
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    body = hdrl + lst(b"movi", movi_body) + chunk(b"idx1", b"".join(idx))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def avi_mjpeg_frames(data: bytes) -> list[bytes]:
    """Demux the Motion-JPEG frame byte streams out of a RIFF AVI:
    recursive chunk walk, collecting ``##dc``/``##db`` stream-data
    payloads (each a standalone JPEG — MJPEG has no inter-frame state).
    Raises ``ValueError`` when the container is malformed, the video
    stream's declared handler is not MJPG, a frame chunk lacks a JPEG
    SOI, or no frame chunks exist — the untrusted-bytes contract shared
    with ``jpeg_decode``."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    handler: bytes | None = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal handler
        while pos + 8 <= end:
            ctype = data[pos:pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body = pos + 8
            if body + length > end:
                raise ValueError("chunk overruns its container")
            if ctype == b"LIST":
                walk(body + 4, body + length)
            elif ctype == b"strh":
                if data[body:body + 4] == b"vids" and handler is None:
                    handler = data[body + 4:body + 8]
            elif ctype[2:4] in (b"dc", b"db"):
                frames.append(bytes(data[body:body + length]))
            pos = body + length + (length & 1)

    try:
        walk(12, len(data))
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed AVI: {type(exc).__name__}") from exc
    if handler is None:
        raise ValueError("AVI has no video stream header")
    if handler.upper() not in (b"MJPG", b"MJPA", b"JPEG"):
        raise ValueError(
            f"AVI video codec {handler!r} is not Motion-JPEG "
            "(inter-frame codecs need an injected decoder)"
        )
    if not frames:
        raise ValueError("AVI has no video frame chunks")
    for f in frames:
        if f[:2] != b"\xff\xd8":
            raise ValueError("MJPEG frame chunk lacks a JPEG SOI marker")
    return frames


def video_decode_frames(
    data: bytes, every_n: int = 1, max_frames: int | None = None
) -> list[tuple[int, int, int, int, bytes]]:
    """REAL sampled-frame pixel decode for Motion-JPEG-in-AVI: RIFF
    demux (``avi_mjpeg_frames``) + the from-scratch baseline JPEG codec
    per sampled frame. Returns ``[(frame_index, width, height,
    channels, pixels)]`` for frames ``0, every_n, 2*every_n, ...``
    capped at ``max_frames``. ISO BMFF (MP4) payloads carry inter-frame
    codecs with no stdlib implementation, so they raise ``ValueError``
    (injection-only) — the narrowed remainder of the video-decode gap."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from .jpeg import jpeg_decode

        frames = avi_mjpeg_frames(data)
        out = []
        for idx in range(0, len(frames), every_n):
            if max_frames is not None and len(out) >= max_frames:
                break
            w, h, ch, pix = jpeg_decode(frames[idx])
            out.append((idx, w, h, ch, pix))
        return out
    if len(data) >= 12 and data[4:8] == b"ftyp":
        raise ValueError(
            "MP4 frame decode needs an injected codec "
            "(MJPEG-in-AVI decodes natively)"
        )
    raise ValueError("unrecognized video container")


# -- dispatch + transforms ---------------------------------------------------


def image_dims(data: bytes) -> tuple[int, int]:
    """(width, height) by magic-byte sniff — the default ``decoder`` for
    ``multimodal.decode_image``. Header-only: no pixel inflate."""
    if data[:8] == PNG_SIGNATURE:
        w, h, _, _ = png_header(data)
        return w, h
    if data[:2] == b"BM":
        return bmp_header(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import jpeg_header
        return jpeg_header(data)
    raise ValueError("unrecognized image format (PNG/BMP/JPEG supported)")


def image_decode(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:8] == PNG_SIGNATURE:
        return png_decode(data)
    if data[:2] == b"BM":
        return bmp_decode(data)
    if data[:2] == b"\xff\xd8":
        from .jpeg import jpeg_decode
        return jpeg_decode(data)
    raise ValueError("unrecognized image format (PNG/BMP/JPEG supported)")


def resize_nearest(width: int, height: int, channels: int, pixels: bytes,
                   new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample (numpy fancy indexing — vectorized, no
    Python pixel loop)."""
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return arr[ys][:, xs].tobytes()


def png_resizer(data: bytes, new_w: int, new_h: int) -> bytes:
    """Real ``resizer`` kernel for ``multimodal.resize_images``: decode
    (PNG or BMP), nearest-neighbor resample, re-encode as PNG."""
    w, h, channels, pixels = image_decode(data)
    return png_encode(new_w, new_h, channels,
                      resize_nearest(w, h, channels, pixels, new_w, new_h))
