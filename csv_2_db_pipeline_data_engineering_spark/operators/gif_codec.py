"""From-spec GIF89a codec (pure stdlib): LZW, frames, grayscale palette.

Implements the subset of GIF (CompuServe GIF89a specification, public)
that a training-data pipeline's image/animation featurizer needs:

- **LZW** with variable code width (3..12 bits), CLEAR/END codes,
  dictionary growth, the KwKwK edge case, and full-table resets — the
  real compression algorithm, not a stored-literal shortcut. The
  encoder emits a genuinely compressed stream (greedy longest-match),
  so an encode→decode round trip exercises dictionary growth on both
  sides.
- **Container**: header + logical screen descriptor, one global
  256-entry grayscale palette (index == luma), N full-frame image
  descriptors (GIF89a animation without disposal logic), trailer.
  Interlacing, local palettes, and transparency extensions are outside
  the honest capability line and raise ``ValueError``.

Corrupt payloads raise ``ValueError`` (the dead-letter contract shared
with ``media_codecs.decode_png``): bad signature, bad block markers,
truncated sub-blocks, out-of-range LZW codes, missing trailer.
"""

from __future__ import annotations

import struct

GIF_SIG = b"GIF89a"
_MAX_CODE = 4096  # 12-bit LZW ceiling (GIF spec)


class _BitWriter:
    """LSB-first bit packer (GIF LZW bit order)."""

    def __init__(self) -> None:
        self._acc = 0
        self._n = 0
        self.out = bytearray()

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._n
        self._n += width
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc, self._n = 0, 0
        return bytes(self.out)


class _BitReader:
    """LSB-first bit reader; raises ``ValueError`` past end of data.

    The whole stream is lifted into one big int once — each read is a
    shift+mask instead of a per-bit loop (the decode hot spot; streams
    here are KB-scale, so the big-int shifts stay cheap)."""

    def __init__(self, data: bytes) -> None:
        self._val = int.from_bytes(data, "little")
        self._nbits = len(data) * 8
        self._pos = 0

    def read(self, width: int) -> int:
        end = self._pos + width
        if end > self._nbits:
            raise ValueError("truncated LZW stream")
        out = (self._val >> self._pos) & ((1 << width) - 1)
        self._pos = end
        return out


# literal-table templates, copied per reset instead of rebuilt
_ENC_LITERALS = {bytes([i]): i for i in range(256)}
_DEC_LITERALS = [bytes([i]) for i in range(256)]


def _lzw_encode(data: bytes, mcs: int) -> bytes:
    """GIF-flavoured LZW: greedy longest-match with width growth lagged
    one entry behind the decoder's table (the spec's +1 offset)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()

    def reset() -> tuple[dict[bytes, int], int, int]:
        table = (
            dict(_ENC_LITERALS)
            if clear == 256
            else {bytes([i]): i for i in range(clear)}
        )
        return table, end + 1, mcs + 1

    table, next_code, size = reset()
    bw.write(clear, size)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], size)
        if next_code < _MAX_CODE:
            table[wc] = next_code
            next_code += 1
            # encoder is one entry AHEAD of the decoder at this point,
            # so its width bump fires at 2^size + 1, not 2^size
            if next_code == (1 << size) + 1 and size < 12:
                size += 1
        else:
            bw.write(clear, size)
            table, next_code, size = reset()
        w = bytes([byte])
    if w:
        bw.write(table[w], size)
    bw.write(end, size)
    return bw.flush()


def _lzw_decode(data: bytes, mcs: int, max_pixels: int) -> bytes:
    """Inverse of :func:`_lzw_encode`; validates every code."""
    if not 2 <= mcs <= 8:
        raise ValueError("invalid LZW minimum code size")
    clear, end = 1 << mcs, (1 << mcs) + 1
    br = _BitReader(data)
    out = bytearray()

    def reset() -> tuple[list[bytes], int, int]:
        return _DEC_LITERALS[:clear] + [b"", b""], end + 1, mcs + 1

    table, next_code, size = reset()
    prev: bytes | None = None
    while True:
        code = br.read(size)
        if code == clear:
            table, next_code, size = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("first LZW code after clear not a literal")
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code and next_code < _MAX_CODE:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("LZW code out of range")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds frame size")
        if prev is not None and next_code < _MAX_CODE:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << size) and size < 12:
                size += 1
        prev = entry
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Chunk ``data`` into <=255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, frames: list[bytes]) -> bytes:
    """Encode full-frame grayscale index planes as an animated GIF89a."""
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size does not match dimensions")
    out = bytearray(GIF_SIG)
    # logical screen: global color table flag, 8-bit color, 256 entries
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):  # grayscale palette: index == luma
        out += bytes((i, i, i))
    for f in frames:
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(8)  # LZW minimum code size for 8-bit indices
        out += _sub_blocks(_lzw_encode(f, 8))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a GIF89a (this module's subset) to (w, h, index frames).

    Real container walk + LZW inflate; raises ``ValueError`` for
    anything malformed or outside the declared subset.
    """
    if len(payload) < 13 or payload[:6] not in (GIF_SIG, b"GIF87a"):
        raise ValueError("not a GIF stream")
    width, height, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    if width <= 0 or height <= 0:
        raise ValueError("invalid GIF dimensions")
    frames: list[bytes] = []
    fsize = width * height
    while True:
        if pos >= len(payload):
            raise ValueError("missing GIF trailer")
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks, skipped
            pos += 1
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension")
                n = payload[pos]
                pos += 1 + n
                if n == 0:
                    break
        elif marker == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if (left, top, w, h) != (0, 0, width, height):
                raise ValueError("partial-frame GIF not supported")
            if ipacked & 0xC0:
                raise ValueError("local palette / interlaced GIF not supported")
            if pos >= len(payload):
                raise ValueError("truncated GIF frame")
            mcs = payload[pos]
            pos += 1
            lzw = bytearray()
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF sub-block")
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                if pos + n > len(payload):
                    raise ValueError("truncated GIF sub-block")
                lzw += payload[pos:pos + n]
                pos += n
            pixels = _lzw_decode(bytes(lzw), mcs, fsize)
            if len(pixels) != fsize:
                raise ValueError("GIF frame pixel count mismatch")
            frames.append(pixels)
        else:
            raise ValueError("unknown GIF block marker")
    return width, height, frames
