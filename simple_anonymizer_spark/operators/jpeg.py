"""Baseline JPEG codec in pure Python + numpy — no PIL, no libjpeg.

Implements the baseline sequential DCT process of the PUBLIC ITU-T T.81
spec (the JPEG standard): marker parsing, canonical Huffman entropy
coding, dequantization, 8x8 inverse DCT, chroma upsampling for 4:4:4 /
4:2:2 / 4:2:0 sampling, JFIF YCbCr<->RGB, and restart-marker handling.
The encoder exists so the decoder can be exercised against
independently-constructed streams (and to give ``multimodal`` a real
JPEG write path); it emits standards-compliant baseline JPEGs using the
T.81 Annex K example quantization + Huffman tables.

Scope (same contract as codecs.py: out-of-scope raises ValueError and
callers quarantine): baseline sequential (SOF0), 8-bit precision, 1 or
3 components, sampling factors 1-2. Progressive (SOF2), arithmetic
coding, 12-bit, and hierarchical modes are rejected.

These are per-record kernels for the Arrow-batched ``mapInPandas``
stages in operators/multimodal.py — the distribution story is the
existing plumbing, unchanged. Reference parity target:
src/main/scala has no codec layer (the reference anonymizer never
decodes media); this module serves SURVEY.md's multimodal pipeline
mandate instead.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# T.81 Annex K.1 example quantization tables (public spec constants).
# ---------------------------------------------------------------------------

K1_LUMA_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

K1_CHROMA_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
_ZZ = np.array(sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1],
                    rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
))
ZIGZAG_ROWS = _ZZ[:, 0]
ZIGZAG_COLS = _ZZ[:, 1]

# T.81 Annex K.3 typical Huffman tables: (bits[1..16] counts, values).
K3_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
K3_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT-II basis matrix C: dct = C @ block @ C.T ; idct = C.T @ coef @ C
_DCT_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_DCT_C *= 0.5
_DCT_C[0, :] *= 1.0 / np.sqrt(2.0)


def _idct2(coef: np.ndarray) -> np.ndarray:
    """Inverse 8x8 DCT for a stack of blocks, shape (..., 8, 8)."""
    return _DCT_C.T @ coef @ _DCT_C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_C @ block @ _DCT_C.T


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex-K tables scaled by the conventional quality knob (the IJG
    formula, itself public): 50 = the spec tables, 100 = all-ones."""
    q = min(100, max(1, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def s(tbl):
        out = (tbl * scale + 50) // 100
        return np.clip(out, 1, 255).astype(np.int32)
    return s(K1_LUMA_Q), s(K1_CHROMA_Q)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

def _canonical_codes(bits: list[int], values: list[int]):
    """(code, length) per symbol in canonical order (T.81 Annex C)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical-code decoder: (length -> {code: symbol}) lookup."""

    def __init__(self, bits: list[int], values: list[int]):
        self.by_len: list[dict[int, int]] = [dict() for _ in range(17)]
        for sym, (code, length) in _canonical_codes(bits, values).items():
            self.by_len[length][code] = sym


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (leaves it unconsumed)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                return False  # a real marker: caller handles it
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            # past the last marker: T.81 pads with 1-bits
            return 1
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, huff: _HuffDecoder) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = huff.by_len[length].get(code)
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0

    def at_marker(self) -> int | None:
        """The marker byte after 0xFF at the current byte position, or
        None. Only meaningful when bit-aligned."""
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map the t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

JPEG_SOI = b"\xff\xd8"


def jpeg_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the frame header — no entropy decode.
    Malformed input raises ValueError (same contract as jpeg_decode)."""
    try:
        return _jpeg_header_inner(data)
    except ValueError:
        raise
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed JPEG: {type(exc).__name__}") from exc


def _jpeg_header_inner(data: bytes) -> tuple[int, int]:
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return w, h
        pos += 2 + seglen
    raise ValueError("no frame header found")


class _Component:
    __slots__ = ("cid", "h", "v", "tq", "dc", "ac", "pred", "blocks")


def jpeg_decode(data: bytes,
                max_pixels: int = 64_000_000,
                pixels_per_byte: int = 512) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG -> (width, height, channels, pixels)
    with channels 1 (grayscale) or 3 (RGB), row-major interleaved.

    Contract for untrusted corpus bytes: ANY malformed input raises
    ValueError (never a stray struct/Index/Key error, never a hang).
    Frames claiming more than ``max_pixels`` are rejected before
    allocation — the decompression-bomb guard a 100 TB media pipeline
    needs (a 200-byte stream can claim a 65535x65535 frame) — and,
    because decode is pure Python, frames larger than
    ``max(65536, len(data) * pixels_per_byte)`` are rejected too, so CPU
    and memory stay bounded RELATIVE to input size (a few-KB stream with
    degenerate 1-bit Huffman tables can otherwise encode ~1M empty MCUs
    under the absolute cap)."""
    try:
        return _jpeg_decode_inner(data, max_pixels, pixels_per_byte)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError) as exc:
        raise ValueError(f"malformed JPEG: {type(exc).__name__}") from exc


def _jpeg_decode_inner(data: bytes, max_pixels: int, pixels_per_byte: int):
    if data[:2] != JPEG_SOI:
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    comps: list[_Component] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    scan_start = None

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        seg = data[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i:i + 64], dtype=np.uint8)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i:i + 128], dtype=">u2")
                    i += 128
                z = np.zeros((8, 8), dtype=np.int32)
                z[ZIGZAG_ROWS, ZIGZAG_COLS] = tbl.astype(np.int32)
                qt[tq] = z
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                values = list(seg[i + 17:i + 17 + n])
                dec = _HuffDecoder(bits, values)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline / extended seq.
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError("only 1 or 3 components supported")
            comps = []
            for c in range(ncomp):
                base = 6 + 3 * c
                comp = _Component()
                comp.cid = seg[base]
                comp.h = seg[base + 1] >> 4
                comp.v = seg[base + 1] & 0x0F
                comp.tq = seg[base + 2]
                if comp.h not in (1, 2) or comp.v not in (1, 2):
                    raise ValueError("sampling factors 1-2 supported")
                comps.append(comp)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG mode not supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            by_id = {c.cid: c for c in comps}
            for c in range(ns):
                cid, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = by_id[cid]
                comp.dc = huff_dc[tables >> 4]
                comp.ac = huff_ac[tables & 0x0F]
            # A scan listing fewer components than the frame (or the same
            # component twice) leaves some comp.dc/ac slots unset — the
            # decode loop would then raise AttributeError, outside the
            # ValueError contract. Baseline here means one interleaved
            # scan covering every frame component.
            for comp in comps:
                if not hasattr(comp, "dc") or not hasattr(comp, "ac"):
                    raise ValueError(
                        "scan does not assign tables to every frame component"
                    )
            scan_start = pos + 2 + seglen
            break
        pos += 2 + seglen

    if scan_start is None or not comps or not width:
        raise ValueError("truncated JPEG: no scan")
    if width * height > max_pixels:
        raise ValueError(f"frame {width}x{height} exceeds max_pixels")
    # Amplification guard: pure-Python per-bit decode means work (and the
    # float64 block planes) must stay proportional to the INPUT size, not
    # just under an absolute cap — a few-KB stream with degenerate 1-bit
    # Huffman tables can otherwise claim ~1M empty MCUs and burn minutes.
    # 512 output pixels per input byte is far beyond any real baseline
    # JPEG's ratio; the 64 KiB floor keeps tiny legitimate files safe.
    if width * height > max(65536, len(data) * pixels_per_byte):
        raise ValueError(
            f"frame {width}x{height} implausible for a {len(data)}-byte "
            f"stream (amplification guard)"
        )
    for c in comps:
        if c.tq not in qt:
            raise ValueError("SOS references undefined quant table")

    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c.pred = 0
        c.blocks = np.zeros((mcuy * c.v, mcux * c.h, 8, 8), dtype=np.float64)

    reader = _BitReader(data, scan_start)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.align()
                m = reader.at_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    reader.pos += 2
                for c in comps:
                    c.pred = 0
            mcu_index += 1
            for c in comps:
                q = qt[c.tq]
                for by in range(c.v):
                    for bx in range(c.h):
                        zz = np.zeros(64, dtype=np.int64)
                        t = reader.decode_symbol(c.dc)
                        if t > 15:
                            raise ValueError("DC category > 15")
                        diff = _extend(reader.read_bits(t), t)
                        c.pred += diff
                        zz[0] = c.pred
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(c.ac)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        coef = np.zeros((8, 8), dtype=np.int64)
                        coef[ZIGZAG_ROWS, ZIGZAG_COLS] = zz
                        c.blocks[my * c.v + by, mx * c.h + bx] = coef * q

    planes = []
    for c in comps:
        by, bx = c.blocks.shape[:2]
        spatial = _idct2(c.blocks) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution by sample replication
        ry, rx = vmax // c.v, hmax // c.h
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()

    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, length = dc_codes[t]
    w.write(code, length)
    if t:
        w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _block_grid(plane: np.ndarray) -> np.ndarray:
    """Pad (edge-replicate) to multiples of 8 and split into a
    (by, bx, 8, 8) stack."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def jpeg_encode(width: int, height: int, channels: int, pixels: bytes,
                quality: int = 90, subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """Encode raw pixels as a baseline JFIF JPEG. ``channels`` 1 or 3
    (RGB). ``subsampling``: "444" or "420" (3-channel only).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (the stream-resync feature real-world encoders use)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be 444 or 420")
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels).astype(np.float64)

    lq, cq = quality_tables(quality)
    if channels == 1:
        planes = [arr[:, :, 0]]
        samp = [(1, 1)]
        qsel = [0]
    else:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            ph, pw = (-height) % 2, (-width) % 2
            if ph or pw:
                cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
                cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    qtabs = [lq, cq]
    # quantized zigzag blocks per component
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    comp_blocks = []
    for plane, (h, v), qi in zip(planes, samp, qsel):
        grid = _block_grid(plane)
        coef = _dct2(grid - 128.0)
        q = qtabs[qi][None, None]
        zzq = np.round(coef / q).astype(np.int32)
        comp_blocks.append(zzq[:, :, ZIGZAG_ROWS, ZIGZAG_COLS])

    # MCU geometry
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    # pad block grids to the MCU lattice (edge blocks replicate)
    padded = []
    for blocks, (h, v) in zip(comp_blocks, samp):
        by, bx = blocks.shape[:2]
        want_y, want_x = mcuy * v, mcux * h
        if by < want_y:
            blocks = np.concatenate(
                [blocks, np.repeat(blocks[-1:], want_y - by, axis=0)], axis=0)
        if bx < want_x:
            blocks = np.concatenate(
                [blocks, np.repeat(blocks[:, -1:], want_x - bx, axis=1)],
                axis=1)
        padded.append(blocks)

    if channels == 1:
        tables = [(K3_DC_LUMA, K3_AC_LUMA)]
    else:
        tables = [(K3_DC_LUMA, K3_AC_LUMA), (K3_DC_CHROMA, K3_AC_CHROMA),
                  (K3_DC_CHROMA, K3_AC_CHROMA)]
    dc_codes = [_canonical_codes(*t[0]) for t in tables]
    ac_codes = [_canonical_codes(*t[1]) for t in tables]

    w = _BitWriter()
    preds = [0] * channels
    mcu_index = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index \
                    and mcu_index % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * channels
            mcu_index += 1
            for ci, (h, v) in enumerate(samp):
                for by in range(v):
                    for bx in range(h):
                        zz = padded[ci][my * v + by, mx * h + bx]
                        preds[ci] = _encode_block(
                            w, zz, preds[ci], dc_codes[ci], ac_codes[ci])
    w.flush()

    out = bytearray(JPEG_SOI)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, tbl in enumerate(qtabs[:1 if channels == 1 else 2]):
        out += _seg(0xDB, bytes([ti]) +
                    bytes(int(x) for x in tbl[ZIGZAG_ROWS, ZIGZAG_COLS]))
    sof = bytearray([8]) + struct.pack(">HH", height, width) + bytes([channels])
    for ci, (h, v) in enumerate(samp):
        sof += bytes([ci + 1, (h << 4) | v, qsel[ci]])
    out += _seg(0xC0, bytes(sof))
    for tid in range(1 if channels == 1 else 2):
        dc_bits, dc_vals = tables[tid][0]
        out += _seg(0xC4, bytes([0x00 | tid]) + bytes(dc_bits)
                    + bytes(dc_vals))
        ac_bits, ac_vals = tables[tid][1]
        out += _seg(0xC4, bytes([0x10 | tid]) + bytes(ac_bits)
                    + bytes(ac_vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([channels])
    for ci in range(channels):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    out += w.out
    out += b"\xff\xd9"
    return bytes(out)
