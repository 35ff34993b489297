"""Round-trip and error-path tests for the stdlib PNG/WAV codecs."""

from __future__ import annotations

import struct
import zlib

import pytest

from csv_2_db_pipeline_data_engineering_spark.operators.media_codecs import (
    PNG_SIG,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def _pixels(n: int, seed: int = 1) -> bytes:
    # LCG byte stream: cheap, deterministic, full 0-255 range.
    out, x = bytearray(), seed
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_round_trip_preserves_pixels(channels):
    w, h = 13, 9  # h > 3 rows -> the None/Sub/Up filter cycle is exercised
    px = _pixels(w * h * channels)
    dw, dh, dc, dpx = decode_png(encode_png(w, h, px, channels=channels))
    assert (dw, dh, dc) == (w, h, channels)
    assert dpx == px


def test_png_decoder_handles_all_filter_types():
    # Hand-build a 2-wide grayscale PNG using Average and Paeth rows
    # (the encoder only emits 0-2, so cover 3-4 directly).
    w, h, stride = 2, 4, 2
    raw_rows = [bytes([10, 20]), bytes([30, 40]), bytes([50, 60]), bytes([70, 80])]
    filtered = bytearray()
    prior = bytes(stride)
    for y, raw in enumerate(raw_rows):
        ftype = 3 if y % 2 == 0 else 4
        line = bytearray()
        for i in range(stride):
            left = raw[i - 1] if i >= 1 else 0
            up = prior[i]
            diag = prior[i - 1] if i >= 1 else 0
            if ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - diag
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - diag)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else diag)
            line.append((raw[i] - pred) & 0xFF)
        filtered += bytes([ftype]) + bytes(line)
        prior = raw

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    payload = (
        PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(filtered)))
        + chunk(b"IEND", b"")
    )
    dw, dh, dc, dpx = decode_png(payload)
    assert (dw, dh, dc) == (w, h, 1)
    assert dpx == b"".join(raw_rows)


def test_png_rejects_bad_signature_and_bad_crc():
    good = encode_png(4, 4, _pixels(4 * 4 * 3))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    corrupt = bytearray(good)
    corrupt[-5] ^= 0xFF  # flip a bit inside the IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))


def test_png_rejects_unsupported_color_type():
    good = encode_png(4, 4, _pixels(4 * 4 * 3))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    palette_ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 3, 0, 0, 0)  # type 3 = palette
    bad = PNG_SIG + chunk(b"IHDR", palette_ihdr) + good[8 + 25:]
    with pytest.raises(ValueError, match="color type"):
        decode_png(bad)


def test_wav_round_trip_preserves_samples_and_header():
    samples = [((i * 3) % 2048) - 1024 for i in range(300)]
    sr, ch, nf, decoded = decode_wav(encode_wav(samples, 8000))
    assert (sr, ch, nf) == (8000, 1, 300)
    assert decoded == samples


def test_wav_rejects_non_16bit():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(bytes(100))
    with pytest.raises(ValueError, match="16-bit"):
        decode_wav(buf.getvalue())


def test_png_every_truncation_point_raises_value_error():
    # The dead-letter contract: ANY prefix of a valid PNG must raise
    # ValueError (never struct.error / IndexError), so corrupt payloads
    # become error rows, not task failures (round-6 advice finding).
    good = encode_png(6, 5, _pixels(6 * 5 * 3))
    for cut in range(len(good)):
        with pytest.raises(ValueError):
            decode_png(good[:cut])


def test_png_missing_iend_raises_value_error():
    good = encode_png(4, 4, _pixels(4 * 4 * 3))
    no_iend = good[:-12]  # strip the whole IEND chunk
    with pytest.raises(ValueError, match="truncated"):
        decode_png(no_iend)


# --- Y4M ---------------------------------------------------------------


def test_y4m_round_trip_exact():
    from csv_2_db_pipeline_data_engineering_spark.operators.media_codecs import (
        decode_y4m,
        encode_y4m,
    )

    frames = [bytes([(7 * k + i) % 256 for i in range(6 * 4)]) for k in range(3)]
    w, h, dec = decode_y4m(encode_y4m(6, 4, frames))
    assert (w, h) == (6, 4)
    assert dec == frames  # bit-exact planes through the container


def test_y4m_every_truncation_point_raises_valueerror():
    import pytest

    from csv_2_db_pipeline_data_engineering_spark.operators.media_codecs import (
        decode_y4m,
        encode_y4m,
    )

    payload = encode_y4m(4, 3, [bytes(12), bytes(range(12))])
    header_end = payload.find(b"\n") + 1
    fsize = 4 * 3 + len(b"FRAME\n")
    # Y4M has no frame count in the header, so a cut landing exactly on
    # a frame boundary is BY SPEC a valid, shorter stream; every other
    # cut must raise.
    boundaries = {header_end, header_end + fsize, header_end + 2 * fsize}
    for cut in range(len(payload)):
        if cut in boundaries:
            _, _, dec = decode_y4m(payload[:cut])
            assert len(dec) == (cut - header_end) // fsize
        else:
            with pytest.raises(ValueError):
                decode_y4m(payload[:cut])


def test_y4m_rejects_bad_magic_and_colourspace():
    import pytest

    from csv_2_db_pipeline_data_engineering_spark.operators.media_codecs import (
        decode_y4m,
    )

    with pytest.raises(ValueError):
        decode_y4m(b"RIFF not a video")
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W4 H3 F25:1 C420\nFRAME\n" + bytes(18))
    with pytest.raises(ValueError):  # frame marker corrupted
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 Cmono\nFRAMX\n" + bytes(4))
