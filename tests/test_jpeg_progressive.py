"""Progressive (SOF2) JPEG codec: baseline-equivalence, exact
constant-block round trip, successive-approximation internals, and the
malformed-input ValueError contract."""

from __future__ import annotations

import random

import pytest

from csv_2_db_pipeline_data_engineering_spark.operators.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
)
from csv_2_db_pipeline_data_engineering_spark.operators.jpeg_progressive import (
    decode_jpeg_progressive,
    encode_jpeg_progressive,
)


def _random_pixels(w: int, h: int, ch: int, seed: int) -> bytes:
    rnd = random.Random(seed)
    return bytes(rnd.randrange(256) for _ in range(w * h * ch))


@pytest.mark.parametrize(
    "w,h,ch",
    [(8, 8, 1), (16, 8, 1), (13, 11, 1), (8, 8, 3), (20, 14, 3), (1, 1, 1),
     (9, 17, 3), (32, 24, 3)],
)
def test_progressive_decodes_identically_to_baseline(w, h, ch):
    """Progression reorders the same quantized coefficients — the
    decoded pixels must be bit-identical to the baseline path, for flat
    and non-trivial quantization tables."""
    for seed, qt in ((1, None), (2, [4 + (i % 7) for i in range(64)])):
        px = _random_pixels(w, h, ch, seed * 100 + w + h + ch)
        base = decode_jpeg(encode_jpeg(w, h, px, channels=ch, qtable=qt))
        prog = decode_jpeg(
            encode_jpeg_progressive(w, h, px, channels=ch, qtable=qt)
        )
        assert prog == base


def test_constant_blocks_round_trip_exactly():
    """Flat qtable + 8x8-constant blocks: the DC-only regime where JPEG
    is lossless — progressive scans must reproduce every byte."""
    w = h = 24
    px = bytes(
        ((x // 8) * 37 + (y // 8) * 91 + 5) % 256
        for y in range(h)
        for x in range(w)
    )
    dw, dh, dc, out = decode_jpeg_progressive(encode_jpeg_progressive(w, h, px))
    assert (dw, dh, dc) == (w, h, 1)
    assert out == px


def test_sof2_dispatches_through_baseline_entrypoint():
    px = _random_pixels(8, 8, 1, 3)
    payload = encode_jpeg_progressive(8, 8, px)
    assert decode_jpeg(payload) == decode_jpeg_progressive(payload)


def test_progressive_payload_is_multi_scan_sof2():
    """The payload really is progressive: SOF2 frame marker and more
    than one SOS scan (DC first + AC bands + refinements)."""
    px = _random_pixels(16, 16, 1, 4)
    payload = encode_jpeg_progressive(16, 16, px)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    assert payload.count(b"\xff\xda") >= 4


def test_refinement_scans_change_the_outcome():
    """Dropping the final refinement scans must decode (progressive
    streams are prefix-decodable in scan units) to a coarser image —
    proving the refinement bits are actually consumed, not skipped."""
    px = _random_pixels(16, 16, 1, 5)
    payload = encode_jpeg_progressive(16, 16, px, qtable=[2] * 64)
    # cut after the 3rd scan (DC first + both AC bands), re-terminate
    scans = []
    i = 0
    while True:
        j = payload.find(b"\xff\xda", i)
        if j < 0:
            break
        scans.append(j)
        i = j + 2
    assert len(scans) >= 4
    truncated = payload[: scans[3]] + b"\xff\xd9"
    full = decode_jpeg(payload)[3]
    coarse = decode_jpeg(truncated)[3]
    assert coarse != full  # refinement scans carry real precision
    # but the coarse pass is already close (successive approximation)
    max_err = max(abs(a - b) for a, b in zip(full, coarse))
    assert max_err <= 16


def test_malformed_progressive_raises_valueerror_only():
    px = _random_pixels(16, 16, 1, 6)
    payload = encode_jpeg_progressive(16, 16, px)
    rnd = random.Random(0)
    for cut in range(1, len(payload), 3):
        with pytest.raises(ValueError):
            decode_jpeg_progressive(payload[:cut])
    for _ in range(500):
        b = bytearray(payload)
        b[rnd.randrange(len(b))] ^= 1 << rnd.randrange(8)
        try:
            decode_jpeg_progressive(bytes(b))
        except ValueError:
            pass  # the only permitted failure mode


def test_unsupported_features_rejected():
    px = _random_pixels(8, 8, 1, 7)
    payload = bytearray(encode_jpeg_progressive(8, 8, px))
    # patch SOF2 into a lost-frame kind the codec family rejects
    i = payload.find(b"\xff\xc2")
    payload[i + 1] = 0xC9  # arithmetic coding frame
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
