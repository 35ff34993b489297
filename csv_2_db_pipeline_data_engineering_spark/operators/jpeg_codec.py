"""From-spec baseline JPEG codec (pure stdlib) — the same honest-codec
seam as :mod:`media_codecs` (PNG/WAV), extended to the crawl-dominant
image format. Implements ITU-T T.81 baseline sequential DCT, 8-bit:

- **encoder**: level shift, 2-D DCT, quantization, zigzag, DC-diff +
  AC run-length Huffman coding (standard Annex K tables), byte-stuffed
  entropy stream, DQT/SOF0/DHT/SOS/EOI marker segments;
- **decoder**: full marker parse (rejects non-baseline frames with
  ``ValueError``), canonical Huffman table reconstruction, byte
  unstuffing, MCU entropy decode, dequantization, de-zigzag, 2-D IDCT,
  level shift + clamp.

Supported subset (the honest capability line, every limit a
``ValueError``): baseline sequential only (no progressive SOF2, no
arithmetic coding, no restart intervals), 8-bit samples, grayscale
(1 component) or 4:4:4 color (3 components, no subsampling).

Correctness strategy: JPEG is lossy, so round-trip bit-equality cannot
be the general contract. Two value-checked regimes instead:
- with an all-ones quantization table and images CONSTANT within each
  8x8 block, the DCT has only an integer DC coefficient and the round
  trip is EXACT (DC = 8c survives round(8c/1); IDCT of a DC-only block
  is 0.25*0.5*8c = c in exact IEEE arithmetic) — the closed form the
  registered oracle query uses;
- for arbitrary images the quantization error bound is checked by
  pytest (max |err| small at qtable=1, PSNR-style bound at standard
  quality) — exercising the AC/zigzag/run-length paths the constant
  blocks cannot.

Like the PNG decoder, ANY malformed or truncated payload must raise
``ValueError`` (never struct/IndexError) so corrupt crawl payloads
dead-letter into rows instead of killing tasks.
"""

from __future__ import annotations

import functools
import math
import re
import struct

# --- constant tables (ITU-T T.81 / Annex K, public spec) ---------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3: standard Huffman table specs as (BITS[1..16], HUFFVAL).
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHR_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

FLAT_QTABLE = [1] * 64  # the exact-round-trip table for constant blocks

# Separable DCT basis: COS[u][x] = C(u)/2 * cos((2x+1)u*pi/16).
_COS = [
    [
        ((1.0 / math.sqrt(2.0)) if u == 0 else 1.0) / 2.0
        * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for x in range(8)
    ]
    for u in range(8)
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the T.81 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


@functools.lru_cache(maxsize=8)  # ~4 MB/table; real streams carry <= 4-8
def _peek_table(bits: tuple[int, ...], vals: tuple[int, ...]) -> list[tuple[int, int]]:
    """16-bit peek table: index by the NEXT 16 bits of the stream, get
    (symbol, code length) in one lookup — the classic fast Huffman
    decode (every ≤16-bit canonical code owns the 2^(16-len) slots it
    prefixes).  Cached per table spec: the Annex-K tables shared by
    every frame build the 65536-entry list once per process, not once
    per image.  Uncovered slots hold length 0 → invalid code.
    """
    tbl: list[tuple[int, int]] = [(0, 0)] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            k += 1
            start = code << (16 - length)
            tbl[start : start + (1 << (16 - length))] = [(sym, length)] * (
                1 << (16 - length)
            )
            code += 1
        code <<= 1
    return tbl


def _decode_table(bits: list[int], vals: list[int]) -> list[tuple[int, int]]:
    """Decoder-side table for a DHT segment: the cached 16-bit peek
    table (see ``_peek_table``); consumed via ``_read_huff_symbol``."""
    return _peek_table(tuple(bits), tuple(vals))


def _read_huff_symbol(br: "_BitReader", tab: list[tuple[int, int]]) -> int:
    """One Huffman symbol via a single peek-table lookup + bit skip."""
    sym, ln = tab[br.peek16()]
    if ln == 0:
        raise ValueError("invalid JPEG Huffman code")
    br.skip(ln)
    return sym


try:  # numpy matmul runs the 8x8 basis products ~20x faster than the
    # pure-Python nested sums; the stdlib loops below remain the
    # documented fallback (and the readable spec form).
    import numpy as _np

    _COS_M = _np.array(_COS)  # _COS_M[u, x]
except ImportError:  # pragma: no cover - numpy is baked into the env
    _np = None


def _fdct(block: list[float]) -> list[float]:
    """8x8 forward DCT, separable (rows then columns)."""
    if _np is not None:
        b = _np.asarray(block, dtype=_np.float64).reshape(8, 8)
        return (_COS_M @ b @ _COS_M.T).reshape(64).tolist()
    tmp = [0.0] * 64
    for y in range(8):
        for u in range(8):
            tmp[y * 8 + u] = sum(block[y * 8 + x] * _COS[u][x] for x in range(8))
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            out[v * 8 + u] = sum(tmp[y * 8 + u] * _COS[v][y] for y in range(8))
    return out


def _idct(coef: list[float]) -> list[float]:
    """8x8 inverse DCT, separable (columns then rows)."""
    if _np is not None:
        c = _np.asarray(coef, dtype=_np.float64).reshape(8, 8)
        return (_COS_M.T @ c @ _COS_M).reshape(64).tolist()
    tmp = [0.0] * 64
    for v in range(8):
        for x in range(8):
            tmp[v * 8 + x] = sum(coef[v * 8 + u] * _COS[u][x] for u in range(8))
    out = [0.0] * 64
    for y in range(8):
        for x in range(8):
            out[y * 8 + x] = sum(tmp[v * 8 + x] * _COS[v][y] for v in range(8))
    return out


def _category(v: int) -> int:
    """Magnitude category: smallest s with |v| < 2**s."""
    return 0 if v == 0 else abs(v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1s per spec


_ENTROPY_END_RE = re.compile(rb"\xff[^\x00]", re.DOTALL)


class _BitReader:
    """Entropy-stream bit reader over one scan's segment.

    Fast path without changing the spec semantics: the segment is
    located ONCE (first ``FF xx`` with xx != 00 terminates it — restart
    markers are rejected upstream) and unstuffed ONCE with C-level
    ``bytes.replace``; bits then come out of a small integer
    accumulator instead of a per-bit byte-loading loop, and
    ``peek16``/``skip`` let the Huffman decoder resolve a whole symbol
    from one table lookup (``_peek_table``).  ``pos`` keeps the
    original contract — the SOURCE offset just past the last consumed
    byte (stuffed zeros counted as consumed with their FF) — because
    both decoders resume marker parsing there.
    """

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self._start = pos
        m = _ENTROPY_END_RE.search(data, pos)
        self._end = m.start() if m else len(data)
        seg = data[pos : self._end]
        # unstuffed indices whose source byte was FF + stuffed 00
        stuffed = []
        j = seg.find(b"\xff\x00")
        k = 0
        while j != -1:
            stuffed.append(j - k)  # each prior pair removed one byte
            k += 1
            j = seg.find(b"\xff\x00", j + 2)
        self._stuffed = stuffed
        self._buf = seg.replace(b"\xff\x00", b"\xff")
        self._bytepos = 0  # next unstuffed byte to load
        self._acc = 0
        self._accn = 0  # bits currently in the accumulator

    def _out_of_data(self) -> ValueError:
        if self._end >= len(self.data):
            return ValueError("truncated JPEG entropy stream")
        return ValueError("unexpected marker inside entropy stream")

    def _fill(self, k: int) -> None:
        buf = self._buf
        while self._accn < k:
            i = self._bytepos
            if i >= len(buf):
                raise self._out_of_data()
            self._acc = (self._acc << 8) | buf[i]
            self._bytepos = i + 1
            self._accn += 8

    def peek16(self) -> int:
        """The next 16 bits, zero-padded past the segment end (a code
        needing padded bits fails in ``skip``'s budget check)."""
        buf = self._buf
        while self._accn < 16 and self._bytepos < len(buf):
            self._acc = (self._acc << 8) | buf[self._bytepos]
            self._bytepos += 1
            self._accn += 8
        if self._accn >= 16:
            return (self._acc >> (self._accn - 16)) & 0xFFFF
        return (self._acc << (16 - self._accn)) & 0xFFFF

    def skip(self, k: int) -> None:
        if self._accn < k:
            raise self._out_of_data()
        self._accn -= k
        self._acc &= (1 << self._accn) - 1

    def read_bit(self) -> int:
        if self._accn == 0:
            self._fill(1)
        self._accn -= 1
        return (self._acc >> self._accn) & 1

    def receive(self, length: int) -> int:
        if length == 0:
            return 0
        if self._accn < length:
            self._fill(length)
        self._accn -= length
        v = (self._acc >> self._accn) & ((1 << length) - 1)
        self._acc &= (1 << self._accn) - 1
        return v

    @property
    def pos(self) -> int:
        """Source offset just past the last consumed byte."""
        consumed_bits = self._bytepos * 8 - self._accn
        consumed = (consumed_bits + 7) // 8
        extra = sum(1 for i in self._stuffed if i < consumed)
        return self._start + consumed + extra


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s-bit received value to its signed range."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _encode_block(
    samples: list[int],
    qtable: list[int],
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    pred_dc: int,
    bw: _BitWriter,
) -> int:
    coef = _fdct([s - 128.0 for s in samples])
    q = [
        int(round(coef[ZIGZAG[i]] / qtable[i]))
        for i in range(64)
    ]
    diff = q[0] - pred_dc
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max((i for i in range(1, 64) if q[i]), default=0)
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(q[i])
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(q[i] if q[i] >= 0 else q[i] + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return q[0]


def _decode_block(
    br: _BitReader,
    qtable: list[int],
    dc_tab: list[tuple[int, int]],
    ac_tab: list[tuple[int, int]],
    pred_dc: int,
) -> tuple[list[int], int]:
    def read_symbol(tab: list[tuple[int, int]]) -> int:
        return _read_huff_symbol(br, tab)

    zz = [0] * 64
    s = read_symbol(dc_tab)
    dc = pred_dc + _extend(br.receive(s), s)
    zz[0] = dc
    i = 1
    while i < 64:
        rs = read_symbol(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += run
        if i > 63:
            raise ValueError("JPEG AC run past end of block")
        zz[i] = _extend(br.receive(size), size)
        i += 1
    coef = [0.0] * 64
    for i in range(64):
        coef[ZIGZAG[i]] = zz[i] * qtable[i]
    px = _idct(coef)
    out = [min(255, max(0, int(round(p + 128.0)))) for p in px]
    return out, dc


def _rgb_to_ycbcr(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    clamp = lambda v: min(255, max(0, int(round(v))))  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    clamp = lambda v: min(255, max(0, int(round(v))))  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    qtable: list[int] | None = None,
) -> bytes:
    """Encode row-major 8-bit pixels as a baseline sequential JPEG.

    ``channels`` 1 (grayscale) or 3 (RGB, stored 4:4:4 YCbCr). The
    default ``qtable`` is FLAT_QTABLE (all ones): block-constant images
    then survive the round trip EXACTLY (see module docstring), which
    is what the registered oracle query relies on.
    """
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size does not match dimensions")
    qt = list(qtable) if qtable is not None else FLAT_QTABLE
    if len(qt) != 64 or any(not 1 <= q <= 255 for q in qt):
        raise ValueError("qtable must be 64 entries in 1..255")

    # Split into planes (YCbCr for color), pad each to 8x8 multiples by
    # edge replication.
    if channels == 1:
        planes = [[pixels[y * width + x] for y in range(height) for x in range(width)]]
    else:
        ys, cbs, crs = [], [], []
        for i in range(width * height):
            y_, cb, cr = _rgb_to_ycbcr(
                pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            )
            ys.append(y_)
            cbs.append(cb)
            crs.append(cr)
        planes = [ys, cbs, crs]
    bw_, bh_ = (width + 7) // 8, (height + 7) // 8

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ac_chr = _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)

    bw = _BitWriter()
    preds = [0] * channels
    for by in range(bh_):
        for bx in range(bw_):
            for c in range(channels):
                plane = planes[c]
                block = [
                    plane[
                        min(height - 1, by * 8 + yy) * width
                        + min(width - 1, bx * 8 + xx)
                    ]
                    for yy in range(8)
                    for xx in range(8)
                ]
                dc_c, ac_c = (dc_lum, ac_lum) if c == 0 else (dc_chr, ac_chr)
                preds[c] = _encode_block(block, qt, dc_c, ac_c, preds[c], bw)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFDB, bytes([0x00]) + bytes(qt))  # DQT, table 0, 8-bit
    comp_spec = b"".join(
        struct.pack("BBB", c + 1, 0x11, 0) for c in range(channels)  # 4:4:4
    )
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, channels) + comp_spec
    )  # SOF0
    tables = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if channels == 3:
        tables += [(0x01, DC_CHR_BITS, DC_CHR_VALS), (0x11, AC_CHR_BITS, AC_CHR_VALS)]
    for tc, bits, vals in tables:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))  # DHT
    sos_comp = b"".join(
        struct.pack("BB", c + 1, 0x00 if c == 0 else 0x11) for c in range(channels)
    )
    out += seg(0xFFDA, bytes([channels]) + sos_comp + bytes([0, 63, 0]))  # SOS
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_sof_marker(payload: bytes) -> int:
    """The frame-type (SOFn) marker byte of a JPEG, by walking marker
    segments — NOT a payload-wide substring scan, which would
    false-positive on real-world files whose APPn/EXIF/comment bodies
    (or entropy data under a different byte-stuffing discipline)
    happen to contain ``FF C2``.

    Returns the marker byte (0xC0 baseline, 0xC2 progressive, ...);
    raises ``ValueError`` on malformed streams or when SOS/EOI arrives
    before any SOF.
    """
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers carry no length
        if marker in (0xD9, 0xDA):  # EOI / SOS before any frame header
            raise ValueError("JPEG missing SOF frame header")
        if pos + 2 > len(payload):
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        if seg_len < 2 or pos + seg_len > len(payload):
            raise ValueError("bad JPEG segment length")
        # SOF0-SOF15 are 0xC0-0xCF minus DHT (0xC4), JPG (0xC8), DAC (0xCC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return marker
        pos += seg_len
    raise ValueError("truncated JPEG segment")


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to (width, height, channels, pixels).

    Full marker parse + entropy decode; every malformed/truncated input
    and every unsupported capability (progressive, 12-bit, subsampled
    chroma, restart intervals, arithmetic coding) raises ``ValueError``.
    """
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_tabs: dict[int, dict[tuple[int, int], int]] = {}
    ac_tabs: dict[int, dict[tuple[int, int], int]] = {}
    width = height = None
    comps: list[tuple[int, int]] = []  # (component id, qtable id)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc tab, ac tab)

    def need(n: int) -> None:
        if pos + n > len(payload):
            raise ValueError("truncated JPEG segment")

    while True:
        need(2)
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before any scan
            raise ValueError("JPEG missing SOS scan")
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        need(2)
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        if seg_len < 2:
            raise ValueError("bad JPEG segment length")
        need(seg_len)
        body = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quantization tables supported")
                if o + 65 > len(body):
                    raise ValueError("truncated JPEG segment")
                qtables[tq] = list(body[o + 1 : o + 65])
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0x0F
                if o + 17 > len(body):
                    raise ValueError("truncated JPEG segment")
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                if o + 17 + n > len(body):
                    raise ValueError("truncated JPEG segment")
                vals = list(body[o + 17 : o + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
                o += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                raise ValueError("truncated JPEG segment")
            precision, height, width, nc = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            if nc not in (1, 3):
                raise ValueError("only 1- or 3-component JPEG supported")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated JPEG segment")
            for c in range(nc):
                cid, sampling, tq = struct.unpack_from("BBB", body, 6 + 3 * c)
                if sampling != 0x11:
                    raise ValueError("only 4:4:4 (no subsampling) supported")
                comps.append((cid, tq))
        elif marker == 0xC2:  # SOF2: progressive frame -> sibling decoder
            from .jpeg_progressive import decode_jpeg_progressive

            return decode_jpeg_progressive(payload)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            if width is None:
                raise ValueError("JPEG SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("truncated JPEG segment")
            ns = body[0]
            if ns != len(comps):
                raise ValueError("JPEG scan must cover all components")
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    (i for i, (xid, _q) in enumerate(comps) if xid == cid), None
                )
                if idx is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            break
        # other APPn/COM segments: skipped

    br = _BitReader(payload, pos)
    bw_, bh_ = (width + 7) // 8, (height + 7) // 8
    nc = len(comps)
    planes = [[0] * (bw_ * 8 * bh_ * 8) for _ in range(nc)]
    preds = [0] * nc
    try:
        for by in range(bh_):
            for bx in range(bw_):
                for idx, dt, at in scan:
                    _cid, tq = comps[idx]
                    if tq not in qtables or dt not in dc_tabs or at not in ac_tabs:
                        raise ValueError("JPEG scan references missing table")
                    block, preds[idx] = _decode_block(
                        br, qtables[tq], dc_tabs[dt], ac_tabs[at], preds[idx]
                    )
                    p = planes[idx]
                    for yy in range(8):
                        row = (by * 8 + yy) * bw_ * 8 + bx * 8
                        p[row : row + 8] = block[yy * 8 : yy * 8 + 8]
    except KeyError as exc:  # pragma: no cover - defensive
        raise ValueError(f"malformed JPEG entropy data: {exc}") from exc

    # the scan must terminate in an EOI marker — a file cut just before
    # (or inside) EOI is truncated, same contract as the PNG decoder
    if b"\xff\xd9" not in payload[br.pos :]:
        raise ValueError("truncated JPEG: missing EOI")

    out = bytearray()
    stride = bw_ * 8
    if nc == 1:
        for y in range(height):
            out += bytes(planes[0][y * stride : y * stride + width])
    else:
        for y in range(height):
            for x in range(width):
                out += bytes(
                    _ycbcr_to_rgb(
                        planes[0][y * stride + x],
                        planes[1][y * stride + x],
                        planes[2][y * stride + x],
                    )
                )
    return width, height, nc, bytes(out)
