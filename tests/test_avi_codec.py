"""AVI/Motion-JPEG codec: container round trip, frame-order and
dual-entropy-path fidelity, container/stream disagreement detection,
and the malformed-input ValueError contract."""

from __future__ import annotations

import random
import struct

import pytest

from csv_2_db_pipeline_data_engineering_spark.operators.avi_codec import (
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from csv_2_db_pipeline_data_engineering_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from csv_2_db_pipeline_data_engineering_spark.operators.jpeg_progressive import (
    encode_jpeg_progressive,
)


def _const_frame(w: int, h: int, v: int) -> bytes:
    return bytes([v]) * (w * h)


def test_round_trip_preserves_frames_in_order():
    w = h = 16
    payloads = [
        encode_jpeg(w, h, _const_frame(w, h, 40 * (k + 1)), channels=1)
        for k in range(4)
    ]
    dw, dh, frames = decode_avi_mjpeg(encode_avi_mjpeg(w, h, payloads))
    assert (dw, dh) == (w, h)
    assert frames == payloads  # byte-identical pass-through, in order
    for k, f in enumerate(frames):
        _w, _h, _c, px = decode_jpeg(f)
        assert set(px) == {40 * (k + 1)}  # flat-qtable constant: lossless


def test_mixed_baseline_and_progressive_frames_decode():
    w = h = 16
    px0 = _const_frame(w, h, 10)
    px1 = bytes(((x // 8) * 50 + (y // 8) * 100) % 256
                for y in range(h) for x in range(w))
    payloads = [
        encode_jpeg(w, h, px0, channels=1),
        encode_jpeg_progressive(w, h, px1, channels=1),
    ]
    _w, _h, frames = decode_avi_mjpeg(encode_avi_mjpeg(w, h, payloads))
    assert decode_jpeg(frames[0])[3] == px0
    assert decode_jpeg(frames[1])[3] == px1
    assert b"\xff\xc2" not in frames[0] and b"\xff\xc2" in frames[1]


def test_frame_count_mismatch_rejected():
    w = h = 8
    payloads = [encode_jpeg(w, h, _const_frame(w, h, 7), channels=1)] * 2
    avi = bytearray(encode_avi_mjpeg(w, h, payloads))
    i = avi.find(b"avih") + 8  # body start
    # dwTotalFrames is the 5th dword of avih
    struct.pack_into("<I", avi, i + 16, 5)
    with pytest.raises(ValueError, match="frame count mismatch"):
        decode_avi_mjpeg(bytes(avi))


def test_header_frame_dims_disagreement_rejected():
    w = h = 8
    payloads = [encode_jpeg(w, h, _const_frame(w, h, 7), channels=1)]
    avi = bytearray(encode_avi_mjpeg(w, h, payloads))
    i = avi.find(b"avih") + 8
    struct.pack_into("<I", avi, i + 32, 24)  # dwWidth lies
    with pytest.raises(ValueError, match="dimensions disagree"):
        decode_avi_mjpeg(bytes(avi))


def test_malformed_avi_raises_valueerror_only():
    w = h = 8
    payloads = [
        encode_jpeg(w, h, _const_frame(w, h, v), channels=1) for v in (1, 2, 3)
    ]
    avi = encode_avi_mjpeg(w, h, payloads)
    for cut in range(1, len(avi), 5):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(avi[:cut])
    rnd = random.Random(0)
    for _ in range(800):
        b = bytearray(avi)
        b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        try:
            decode_avi_mjpeg(bytes(b))
        except ValueError:
            pass  # the only permitted failure mode
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_mjpeg(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError):
        encode_avi_mjpeg(8, 8, [])
