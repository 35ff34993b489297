"""From-spec AVI / Motion-JPEG codec (pure stdlib) — COMPRESSED video
for the multimodal pipeline, built on the repo's own JPEG entropy
codecs (:mod:`jpeg_codec` baseline + :mod:`jpeg_progressive`).

Motion JPEG in an AVI RIFF container is a real, public, still-common
crawl format (capture devices, legacy webcams, DV workflows): each
frame is an independent JPEG, so the repo's from-spec JPEG decoders
make the whole video decodable without ffmpeg. This narrows the honest
video gap to INTER-frame codecs (H.264-class motion compensation),
which stay stubbed.

Container subset (every violation a ``ValueError``, the codec family's
dead-letter contract):
- RIFF 'AVI ' with LIST 'hdrl' (avih + one 'vids' strl) and LIST
  'movi' whose '00dc'/'00db' chunks carry one JPEG payload each
  (word-aligned, per the RIFF rules);
- frame count must match avih dwTotalFrames, and every decoded frame's
  dimensions must match the avih dwWidth/dwHeight — container/stream
  disagreement is corruption, not tolerated silence.

No reference parity: the reference (pandas CSV->Postgres ETL,
``main.py:41-136``) has no media surface; this is part of the
driver-mandated multimodal extension (SURVEY.md §2.11).
"""

from __future__ import annotations

import struct

from .jpeg_codec import decode_jpeg

_FOURCC_RIFF = b"RIFF"
_FOURCC_AVI = b"AVI "
_FOURCC_LIST = b"LIST"


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(_FOURCC_LIST, fourcc + body)


def encode_avi_mjpeg(
    width: int,
    height: int,
    jpeg_frames: list[bytes],
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Wrap independently-encoded JPEG frame payloads as an AVI/MJPG
    file (classic single-stream layout with an idx1 index)."""
    if not jpeg_frames:
        raise ValueError("AVI needs at least one frame")
    n = len(jpeg_frames)
    usec_per_frame = (1_000_000 * fps[1]) // fps[0]
    max_bytes = max(len(f) for f in jpeg_frames)

    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps[0], 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, fps[1], fps[0], 0, n, max_bytes,
                      0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_items, idx, off = [], [], 4  # offsets relative to 'movi' fourcc
    for f in jpeg_frames:
        ck = _chunk(b"00dc", f)
        movi_items.append(ck)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(ck)
    movi = _list(b"movi", b"".join(movi_items))
    idx1 = _chunk(b"idx1", b"".join(idx))
    body = _FOURCC_AVI + hdrl + movi + idx1
    return _FOURCC_RIFF + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse an AVI/MJPG payload to (width, height, [jpeg payloads]).

    The frames are returned still JPEG-encoded — callers pick the pixel
    decode (``decode_jpeg`` handles baseline and progressive) so frame
    sampling can skip entropy work for unsampled frames, the same
    economy a production frame-sampler relies on at scale.
    """
    if len(payload) < 12 or payload[:4] != _FOURCC_RIFF:
        raise ValueError("not an AVI: bad RIFF header")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated AVI: RIFF size past end of payload")
    if payload[8:12] != _FOURCC_AVI:
        raise ValueError("not an AVI: RIFF form is not 'AVI '")

    width = height = total = None
    frames: list[bytes] = []

    def walk(start: int, end: int, depth: int) -> None:
        nonlocal width, height, total
        pos = start
        if depth > 8:
            raise ValueError("malformed AVI: LIST nesting too deep")
        while pos < end:
            if pos + 8 > end:
                raise ValueError("truncated AVI chunk header")
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise ValueError("truncated AVI chunk body")
            if fourcc == _FOURCC_LIST:
                if size < 4:
                    raise ValueError("malformed AVI LIST")
                kind = payload[body_start : body_start + 4]
                if kind in (b"hdrl", b"movi", b"strl"):
                    walk(body_start + 4, body_end, depth + 1)
            elif fourcc == b"avih":
                if size < 40:
                    raise ValueError("truncated AVI avih header")
                vals = struct.unpack_from("<10I", payload, body_start)
                total, width, height = vals[4], vals[8], vals[9]
            elif fourcc in (b"00dc", b"00db"):
                frames.append(payload[body_start:body_end])
            pos = body_end + (size % 2)  # word alignment

    walk(12, riff_size + 8, 0)
    if width is None or total is None:
        raise ValueError("AVI missing avih header")
    if not frames:
        raise ValueError("AVI missing movi frames")
    if len(frames) != total:
        raise ValueError(
            f"AVI frame count mismatch: avih says {total}, movi has {len(frames)}"
        )
    # Validate container/stream agreement on the FIRST frame eagerly
    # (cheap); callers decoding more frames re-validate per frame.
    fw, fh, _c, _px = decode_jpeg(frames[0])
    if (fw, fh) != (width, height):
        raise ValueError("AVI frame dimensions disagree with avih header")
    return width, height, frames
