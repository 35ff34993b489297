"""Real (pure-stdlib) media codecs for the multimodal operators.

The container has no PIL/ffmpeg, but two honest decode paths need no
third-party code at all:

- **PNG**: implemented from the public spec (RFC 2083) with ``zlib`` +
  ``struct`` — signature check, chunk walk with CRC verification, IHDR
  parse, IDAT inflate, and full scanline unfiltering (filter types
  0-4). 8-bit depth, non-interlaced, gray/RGB/RGBA.
- **WAV**: RIFF/PCM via the stdlib ``wave`` module — header parse plus
  16-bit sample extraction.
- **Y4M**: YUV4MPEG2 uncompressed video (mjpegtools stream format) —
  header parse, FRAME segmentation, mono plane extraction.

Both come with matching encoders so queries can synthesize payloads
deterministically from ``doc_id`` executor-side, decode them with the
REAL decoder, and value-check the decoded features against a DuckDB
oracle that computes the same numbers from the closed-form pixel /
sample formulas — i.e. the encode→deflate→inflate→unfilter round trip
itself is what the correctness gate verifies. Generic image formats and
COMPRESSED video still require PIL/ffmpeg and remain stubbed in
``multimodal.py``; baseline JPEG lives in ``jpeg_codec.py``.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE_FOR_CHANNELS = {1: 0, 3: 2, 4: 6}
_CHANNELS_FOR_COLOR_TYPE = {0: 1, 2: 3, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode raw row-major 8-bit pixels as a spec-valid PNG.

    Rows cycle through filter types None/Sub/Up (y % 3) so a decoder
    must actually unfilter to recover the pixels — a round trip through
    ``decode_png`` exercises real codec work, not byte identity.
    """
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size does not match dimensions")
    color_type = _COLOR_TYPE_FOR_CHANNELS[channels]
    stride = width * channels
    rows = []
    prior = bytes(stride)
    for y in range(height):
        raw = pixels[y * stride:(y + 1) * stride]
        ftype = y % 3
        if ftype == 0:
            filt = raw
        elif ftype == 1:  # Sub: delta vs the pixel to the left
            filt = bytes(
                (raw[i] - (raw[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        else:  # Up: delta vs the row above
            filt = bytes((raw[i] - prior[i]) & 0xFF for i in range(stride))
        rows.append(bytes([ftype]) + filt)
        prior = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(rows))
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to (width, height, channels, raw row-major pixels).

    Verifies the signature and every chunk CRC, inflates IDAT, and
    reverses all five spec filter types. Raises ``ValueError`` on
    malformed input and on honest capability limits (bit depth != 8,
    interlacing, palette images).
    """
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    saw_iend = False
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 8 + length + 4 > len(payload):
            raise ValueError("truncated PNG chunk")
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
            channels = _CHANNELS_FOR_COLOR_TYPE.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if not saw_iend:
        raise ValueError("truncated PNG chunk")
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = bytearray()
    prior = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prior[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prior[i]
                c = prior[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out += line
        prior = bytes(line)
    return width, height, channels, bytes(out)


def encode_wav(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Encode 16-bit mono PCM samples as a RIFF/WAV byte string."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a WAV to (sample_rate, n_channels, n_frames, samples).

    Real RIFF parse via the stdlib ``wave`` reader; 16-bit PCM only
    (the honest capability line — other widths raise ``ValueError``).
    """
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        sr = w.getframerate()
        ch = w.getnchannels()
        n = w.getnframes()
        raw = w.readframes(n)
    samples = list(struct.unpack(f"<{n * ch}h", raw))
    return sr, ch, n, samples


# --- YUV4MPEG2 (uncompressed video stream) ---------------------------------

Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    width: int, height: int, frames: list[bytes], fps: tuple[int, int] = (25, 1)
) -> bytes:
    """Encode mono (Cmono) luma frames as a YUV4MPEG2 stream.

    Y4M is a real, public video container (mjpegtools): a text stream
    header, then ``FRAME\\n`` + raw planes per frame — the one video
    format honestly decodable with zero third-party code, which is what
    retires the "video decode needs ffmpeg" stub for the uncompressed
    case. Compressed codecs (H.26x/VP9/AV1) still need ffmpeg and stay
    behind the labeled stub in ``multimodal.py``.
    """
    for f in frames:
        if len(f) != width * height:
            raise ValueError("frame size does not match dimensions")
    header = b"%s W%d H%d F%d:%d Ip A1:1 Cmono\n" % (
        Y4M_MAGIC, width, height, fps[0], fps[1],
    )
    return header + b"".join(b"FRAME\n" + f for f in frames)


def decode_y4m(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a Cmono YUV4MPEG2 stream to (width, height, frames).

    Raises ``ValueError`` on a bad magic, malformed header, unsupported
    colourspace, malformed frame marker, or truncated frame payload —
    the dead-letter contract shared with ``decode_png``.
    """
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(Y4M_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = -1
    for tok in payload[len(Y4M_MAGIC) + 1:nl].split(b" "):
        if tok.startswith(b"W"):
            width = int(tok[1:])
        elif tok.startswith(b"H"):
            height = int(tok[1:])
        elif tok.startswith(b"C") and tok != b"Cmono":
            raise ValueError("only Cmono Y4M supported")
    if width <= 0 or height <= 0:
        raise ValueError("missing or invalid Y4M dimensions")
    fsize = width * height
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("malformed Y4M frame marker")
        start = fnl + 1
        if start + fsize > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(payload[start:start + fsize])
        pos = start + fsize
    return width, height, frames
