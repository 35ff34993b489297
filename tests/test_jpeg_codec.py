"""Round-trip, error-bound, and dead-letter tests for the from-spec
baseline JPEG codec (``operators/jpeg_codec.py``)."""

from __future__ import annotations

import random

import pytest

from csv_2_db_pipeline_data_engineering_spark.operators.jpeg_codec import (
    FLAT_QTABLE,
    decode_jpeg,
    encode_jpeg,
)


def _block_constant(w: int, h: int, seed: int) -> bytes:
    return bytes(
        (seed * 17 + (y // 8) * 7 + (x // 8) * 13) % 256
        for y in range(h)
        for x in range(w)
    )


def test_block_constant_flat_qtable_round_trip_is_exact():
    # the lossless regime the registered oracle query relies on
    for seed, (w, h) in [(5, (24, 16)), (111, (8, 8)), (42, (16, 16))]:
        px = _block_constant(w, h, seed)
        dw, dh, dc, dpx = decode_jpeg(encode_jpeg(w, h, px, channels=1))
        assert (dw, dh, dc) == (w, h, 1)
        assert dpx == px


def test_arbitrary_gray_flat_qtable_error_is_dct_rounding_only():
    # AC coefficients + zigzag + run-length all engaged; with qtable=1
    # the only loss is coefficient rounding -> max error a few counts
    random.seed(7)
    w, h = 24, 16
    px = bytes(random.randrange(256) for _ in range(w * h))
    dw, dh, dc, dpx = decode_jpeg(encode_jpeg(w, h, px, channels=1))
    assert (dw, dh, dc) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(px, dpx)) <= 2


def test_odd_dimensions_pad_and_crop():
    px = bytes((i * 37) % 256 for i in range(13 * 11))
    dw, dh, dc, dpx = decode_jpeg(encode_jpeg(13, 11, px, channels=1))
    assert (dw, dh, dc) == (13, 11, 1)
    assert len(dpx) == 13 * 11
    assert max(abs(a - b) for a, b in zip(px, dpx)) <= 2


def test_color_444_round_trip_within_colorspace_rounding():
    random.seed(11)
    w, h = 16, 8
    px = bytes(random.randrange(256) for _ in range(w * h * 3))
    dw, dh, dc, dpx = decode_jpeg(encode_jpeg(w, h, px, channels=3))
    assert (dw, dh, dc) == (w, h, 3)
    # RGB->YCbCr->RGB adds +-2 of rounding on top of DCT rounding
    assert max(abs(a - b) for a, b in zip(px, dpx)) <= 4


def test_coarse_qtable_is_lossy_but_bounded():
    random.seed(3)
    w, h = 16, 16
    px = bytes(random.randrange(256) for _ in range(w * h))
    qt = [16] * 64
    _, _, _, dpx = decode_jpeg(encode_jpeg(w, h, px, channels=1, qtable=qt))
    # quantization error per coefficient <= q/2; spatial error stays
    # within the qtable scale (here: one quant step)
    assert max(abs(a - b) for a, b in zip(px, dpx)) <= 16


def test_every_truncation_point_raises_value_error():
    # dead-letter contract, same as decode_png: ANY prefix -> ValueError
    good = encode_jpeg(24, 16, _block_constant(24, 16, 5), channels=1)
    for cut in range(len(good)):
        with pytest.raises(ValueError):
            decode_jpeg(good[:cut])


def test_byte_flips_never_escape_value_error():
    good = encode_jpeg(16, 8, _block_constant(16, 8, 9), channels=1)
    for i in range(len(good)):
        b = bytearray(good)
        b[i] ^= 0xFF
        try:
            decode_jpeg(bytes(b))  # may decode to different pixels — fine
        except ValueError:
            pass  # the only exception type allowed out


def test_rejects_unsupported_capabilities():
    good = bytearray(encode_jpeg(8, 8, bytes(64), channels=1))
    sof = good.find(b"\xff\xc0")
    assert sof > 0
    # SOF2 now dispatches to the progressive decoder (which then rejects
    # this baseline-coded scan as malformed rather than unsupported);
    # a genuinely unsupported frame kind still names the capability.
    lossless = bytearray(good)
    lossless[sof + 1] = 0xC3  # SOF3: lossless sequential
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(lossless))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"JUNK" + bytes(good[2:]))
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, bytes(64), channels=2)
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, bytes(64), channels=1, qtable=[0] * 64)
