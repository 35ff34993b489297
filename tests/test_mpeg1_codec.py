"""From-spec MPEG-1 inter-frame codec: lossless round trip, motion
compensation, skipped-macroblock propagation, subset error contracts."""

from __future__ import annotations

import pytest

from csv_2_db_pipeline_data_engineering_spark.operators.mpeg1_codec import (
    decode_mpeg1,
    encode_mpeg1,
)

W, H, COLS, N_MB = 48, 32, 3, 6


def _frame(bg: int, sp: int, pos: int) -> list[int]:
    f = [bg] * (W * H)
    my, mx = divmod(pos, COLS)
    for yy in range(16):
        row = (my * 16 + yy) * W + mx * 16
        f[row : row + 16] = [sp] * 16
    return f


def _video(doc: int, n: int):
    bg = (doc * 31) % 200 + 20
    sp = (bg + 101) % 256
    frames = [_frame(bg, sp, (doc + k) % N_MB) for k in range(n)]
    moves = [None] + [
        ((doc + k) % N_MB, (doc + k - 1) % N_MB) for k in range(1, n)
    ]
    return frames, moves


def test_round_trip_is_lossless_across_motion_and_row_wrap():
    # doc=2 walks the sprite 2->3 (row wrap: intra) ->4 (MC) ->5 (last
    # MB: intra refresh covers it), exercising every coding decision
    frames, moves = _video(2, 4)
    dec = decode_mpeg1(encode_mpeg1(W, H, frames, moves))
    assert (dec["width"], dec["height"]) == (W, H)
    assert [list(f) for f in dec["frames"]] == frames
    assert dec["n_i"] == 1 and dec["n_p"] == 3
    assert dec["n_mc_mb"] >= 1  # real motion-compensated copies happened


def test_inter_coding_actually_compresses():
    frames, moves = _video(0, 4)
    stream = encode_mpeg1(W, H, frames, moves)
    raw = W * H * len(frames)
    assert len(stream) * 10 < raw  # temporal compression is the point


def test_skipped_macroblocks_propagate_reference_pixels():
    # encode two frames where NOTHING moves: every P macroblock except
    # the forced first/last intra refresh is skipped, and the decoder
    # must copy the reference
    bg = 99
    frames = [[bg] * (W * H), [bg] * (W * H)]
    dec = decode_mpeg1(encode_mpeg1(W, H, frames, None))
    assert [list(f) for f in dec["frames"]] == frames
    assert dec["n_skipped_mb"] == N_MB - 2  # all but MB 0 and MB 5
    assert dec["n_mc_mb"] == 0


def test_macroblock_tallies_match_closed_form():
    for doc in range(12):
        n = 2 + doc % 3
        frames, moves = _video(doc, n)
        dec = decode_mpeg1(encode_mpeg1(W, H, frames, moves))
        exp_mc = sum(1 for k in range(1, n) if (doc + k) % N_MB in (1, 2, 4))
        assert dec["n_mc_mb"] == exp_mc, doc
        exp_skip = sum(
            N_MB - len({0, N_MB - 1, (doc + k - 1) % N_MB, (doc + k) % N_MB})
            for k in range(1, n)
        )
        assert dec["n_skipped_mb"] == exp_skip, doc


def test_decoder_rejects_out_of_subset_and_corrupt_streams():
    frames, moves = _video(1, 3)
    stream = encode_mpeg1(W, H, frames, moves)
    with pytest.raises(ValueError):
        decode_mpeg1(stream[: len(stream) // 2])  # truncated
    with pytest.raises(ValueError):
        decode_mpeg1(b"\x00\x00\x01\xb3" + stream[4:8])  # header cut short
    with pytest.raises(ValueError):
        decode_mpeg1(b"RIFFnot-an-mpeg-stream")
    # non-16-aligned dims refused on both sides
    with pytest.raises(ValueError):
        encode_mpeg1(40, 32, [[0] * (40 * 32)], None)
    # non-constant macroblock content is outside the lossless subset
    bad = [0] * (W * H)
    bad[0] = 1
    with pytest.raises(ValueError):
        encode_mpeg1(W, H, [bad], None)


def test_decoder_enforces_subset_macroblock_types():
    # hand-corrupt the picture_coding_type of the first picture to B (3)
    frames, moves = _video(1, 2)
    stream = bytearray(encode_mpeg1(W, H, frames, moves))
    # find picture start code 00 00 01 00 and flip its type bits
    i = stream.find(b"\x00\x00\x01\x00")
    assert i >= 0
    # byte layout after code: temporal_ref(10) type(3) -> type sits in
    # bits 10..12 of the 2nd byte after the code start
    # byte i+5 = [tr bit1][tr bit0][type:3][vbv...] -> type is bits 5..3
    b = stream[i + 5]
    stream[i + 5] = (b & 0b11000111) | (0b011 << 3)  # type=3 (B)
    with pytest.raises(ValueError):
        decode_mpeg1(bytes(stream))
