"""From-spec GIF89a codec: LZW round trips, dead-letter contract."""

from __future__ import annotations

import random

import pytest

from csv_2_db_pipeline_data_engineering_spark.operators.gif_codec import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_lzw_round_trips_cover_growth_reset_and_kwkwk():
    for trial in range(60):
        rng = random.Random(trial)
        n = rng.choice([0, 1, 2, 5, 100, 1000, 6000])
        kind = trial % 3
        if kind == 0:  # repetitive -> deep dictionary + width growth
            data = bytes(rng.randrange(4) for _ in range(n))
        elif kind == 1:  # incompressible -> fast growth to 12-bit reset
            data = bytes(rng.randrange(256) for _ in range(n))
        else:  # long runs -> KwKwK-heavy
            data = bytes([rng.randrange(8)]) * n
        assert _lzw_decode(_lzw_encode(data, 8), 8, max(n, 1)) == data


def test_lzw_actually_compresses_repetitive_data():
    rep = bytes([1, 2, 3, 4] * 2500)
    assert len(_lzw_encode(rep, 8)) < len(rep) // 10


def test_gif_multi_frame_round_trip_exact():
    rng = random.Random(42)
    frames = [bytes(rng.randrange(256) for _ in range(9 * 7)) for _ in range(3)]
    w, h, dec = decode_gif(encode_gif(9, 7, frames))
    assert (w, h) == (9, 7)
    assert dec == frames


def test_gif_skips_extension_blocks():
    payload = bytearray(encode_gif(2, 2, [bytes(4)]))
    # splice a graphics-control extension after the header+palette
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    insert_at = 13 + 768  # header + screen descriptor + global palette
    spliced = bytes(payload[:insert_at]) + ext + bytes(payload[insert_at:])
    w, h, dec = decode_gif(spliced)
    assert (w, h, len(dec)) == (2, 2, 1)


def test_gif_every_truncation_point_raises_valueerror():
    payload = encode_gif(5, 4, [bytes(range(20)), bytes(20)])
    for cut in range(len(payload)):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])


def test_gif_rejects_bad_magic_marker_and_oversized_lzw():
    with pytest.raises(ValueError):
        decode_gif(b"PNG9a junk that is long enough to parse")
    payload = bytearray(encode_gif(2, 2, [bytes(4)]))
    payload[13 + 768] = 0x55  # corrupt the first block marker
    with pytest.raises(ValueError):
        decode_gif(bytes(payload))
    # LZW stream longer than the declared frame must be rejected
    with pytest.raises(ValueError):
        _lzw_decode(_lzw_encode(bytes(100), 8), 8, max_pixels=50)
