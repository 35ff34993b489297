"""Progressive JPEG (ITU-T T.81 SOF2) extension of the from-spec
baseline codec in :mod:`jpeg_codec` — closing the round-8 honest decode
gap: a real crawl's JPEGs are dominantly progressive (libjpeg's default
``-progressive`` scan script), and the baseline decoder rejected them.

Implements the full progressive DCT mode for the codec's supported
frame subset (8-bit, 1 or 3 components, 4:4:4, no restart intervals):

- **spectral selection**: any per-scan ``[Ss..Se]`` coefficient band;
- **successive approximation**: DC first/refine (``Ah``/``Al`` bit
  planes), AC first with EOB-run coding, and AC refinement with
  correction bits (the G.1.2.3 algorithm — the part naive decoders
  skip);
- multi-scan marker parse with between-scan DHT/DQT redefinition.

The encoder emits libjpeg's default successive-approximation scan
script (DC Al=1 → coarse AC → AC refine → DC refine → AC refine) using
the standard Annex K Huffman tables; because Annex K defines no EOBRUN
symbols beyond plain EOB, the encoder flushes its EOB run after every
block (EOBRUN=1, always expressible) while the DECODER accepts general
EOB runs up to the spec maximum — so it decodes real-world streams the
encoder itself would not produce.

Correctness contract (the baseline codec's two regimes carry over):
a progressive encode decodes to EXACTLY the same pixels as the baseline
encode of the same image at the same quantization table — progression
reorders the same quantized coefficients, it does not change them —so
every baseline value-check (flat-qtable constant blocks round-trip
exactly; bounded error elsewhere) extends verbatim. Malformed input
raises ``ValueError``, never struct/IndexError (the dead-letter
contract shared by every codec in the repo).

No reference parity: the reference (pandas CSV->Postgres ETL,
``main.py:41-136``) has no media surface; this is part of the
driver-mandated multimodal extension (SURVEY.md §2.11).
"""

from __future__ import annotations

import struct

from .jpeg_codec import (
    AC_CHR_BITS,
    AC_CHR_VALS,
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_CHR_BITS,
    DC_CHR_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    FLAT_QTABLE,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _category,
    _decode_table,
    _read_huff_symbol,
    _extend,
    _fdct,
    _idct,
    _rgb_to_ycbcr,
    _ycbcr_to_rgb,
)

# --- encoder -----------------------------------------------------------------


def _quantized_blocks(
    plane: list[int], width: int, height: int, qt: list[int]
) -> list[list[int]]:
    """All 8x8 blocks of a plane as zigzag-ordered quantized coefficient
    lists (edge-replicated padding), raster block order."""
    bw_, bh_ = (width + 7) // 8, (height + 7) // 8
    blocks = []
    for by in range(bh_):
        for bx in range(bw_):
            samples = [
                plane[
                    min(height - 1, by * 8 + yy) * width
                    + min(width - 1, bx * 8 + xx)
                ]
                for yy in range(8)
                for xx in range(8)
            ]
            coef = _fdct([s - 128.0 for s in samples])
            blocks.append(
                [int(round(coef[ZIGZAG[i]] / qt[i])) for i in range(64)]
            )
    return blocks


class _ProgressiveWriter:
    """One scan's entropy coder: wraps _BitWriter with the AC-refinement
    buffered-correction-bit machinery (emit_eobrun of G.1.2.3)."""

    def __init__(self) -> None:
        self.bw = _BitWriter()
        self.eobrun = 0
        self.br_bits: list[int] = []

    def emit_eobrun(self, ac_codes: dict[int, tuple[int, int]]) -> None:
        if self.eobrun > 0:
            # Annex K tables define only the plain EOB symbol (run 1),
            # and the encoder flushes per block, so eobrun is always 1.
            code, length = ac_codes[0x00]
            self.bw.write(code, length)
            for b in self.br_bits:
                self.bw.write(b, 1)
            self.eobrun = 0
            self.br_bits = []


def _encode_dc_scan(
    bw: _BitWriter,
    comp_blocks: list[list[list[int]]],
    dc_codes: list[dict[int, tuple[int, int]]],
    al: int,
) -> None:
    """Interleaved DC first scan: diff coding of the point-transformed
    DC coefficients (predictors run over the shifted values)."""
    preds = [0] * len(comp_blocks)
    for m in range(len(comp_blocks[0])):
        for c, blocks in enumerate(comp_blocks):
            v = blocks[m][0] >> al
            diff = v - preds[c]
            preds[c] = v
            s = _category(diff)
            code, length = dc_codes[c][s]
            bw.write(code, length)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _encode_dc_refine_scan(
    bw: _BitWriter, comp_blocks: list[list[list[int]]], al: int
) -> None:
    for m in range(len(comp_blocks[0])):
        for blocks in comp_blocks:
            bw.write((blocks[m][0] >> al) & 1, 1)


def _encode_ac_first_scan(
    w: _ProgressiveWriter,
    blocks: list[list[int]],
    ac_codes: dict[int, tuple[int, int]],
    ss: int,
    se: int,
    al: int,
) -> None:
    for block in blocks:
        run = 0
        for k in range(ss, se + 1):
            t = abs(block[k]) >> al
            if t == 0:
                run += 1
                continue
            w.emit_eobrun(ac_codes)
            while run > 15:
                code, length = ac_codes[0xF0]
                w.bw.write(code, length)
                run -= 16
            s = t.bit_length()
            code, length = ac_codes[(run << 4) | s]
            w.bw.write(code, length)
            v = t if block[k] >= 0 else -t
            w.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if run > 0:
            w.eobrun += 1
            w.emit_eobrun(ac_codes)  # flush per block (Annex K tables)
    w.emit_eobrun(ac_codes)


def _encode_ac_refine_scan(
    w: _ProgressiveWriter,
    blocks: list[list[int]],
    ac_codes: dict[int, tuple[int, int]],
    ss: int,
    se: int,
    al: int,
) -> None:
    """G.1.2.3 AC refinement: newly-nonzero coefficients are coded as
    (run, 1) + sign; already-nonzero history coefficients contribute
    one buffered correction bit each, emitted after the next symbol."""
    for block in blocks:
        absv = {k: abs(block[k]) >> al for k in range(ss, se + 1)}
        eob = 0
        for k in range(ss, se + 1):
            if absv[k] == 1:
                eob = k
        run = 0
        pending: list[int] = []
        for k in range(ss, se + 1):
            t = absv[k]
            if t == 0:
                run += 1
                continue
            while run > 15 and k <= eob:
                w.emit_eobrun(ac_codes)
                code, length = ac_codes[0xF0]
                w.bw.write(code, length)
                run -= 16
                for b in pending:
                    w.bw.write(b, 1)
                pending = []
            if t > 1:  # history coefficient: correction bit rides along
                pending.append(t & 1)
                continue
            w.emit_eobrun(ac_codes)
            code, length = ac_codes[(run << 4) | 1]
            w.bw.write(code, length)
            w.bw.write(0 if block[k] < 0 else 1, 1)
            for b in pending:
                w.bw.write(b, 1)
            pending = []
            run = 0
        if run > 0 or pending:
            w.eobrun += 1
            w.br_bits.extend(pending)
            w.emit_eobrun(ac_codes)  # flush per block (Annex K tables)
    w.emit_eobrun(ac_codes)


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    qtable: list[int] | None = None,
) -> bytes:
    """Encode row-major 8-bit pixels as a progressive (SOF2) JPEG with
    libjpeg's default successive-approximation scan script. Decodes
    (by :func:`decode_jpeg_progressive` or any conformant decoder) to
    exactly the pixels :func:`jpeg_codec.encode_jpeg` would yield."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size does not match dimensions")
    qt = list(qtable) if qtable is not None else FLAT_QTABLE
    if len(qt) != 64 or any(not 1 <= q <= 255 for q in qt):
        raise ValueError("qtable must be 64 entries in 1..255")

    if channels == 1:
        planes = [list(pixels)]
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
    comp_blocks = [_quantized_blocks(p, width, height, qt) for p in planes]

    dc_codes = [_canonical_codes(DC_LUM_BITS, DC_LUM_VALS)] + [
        _canonical_codes(DC_CHR_BITS, DC_CHR_VALS)
    ] * (channels - 1)
    ac_codes = [_canonical_codes(AC_LUM_BITS, AC_LUM_VALS)] + [
        _canonical_codes(AC_CHR_BITS, AC_CHR_VALS)
    ] * (channels - 1)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xFFDB, bytes([0x00]) + bytes(qt))
    comp_spec = b"".join(
        struct.pack("BBB", c + 1, 0x11, 0) for c in range(channels)
    )
    out += seg(
        0xFFC2, struct.pack(">BHHB", 8, height, width, channels) + comp_spec
    )  # SOF2
    tables = [(0x00, DC_LUM_BITS, DC_LUM_VALS), (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if channels == 3:
        tables += [(0x01, DC_CHR_BITS, DC_CHR_VALS), (0x11, AC_CHR_BITS, AC_CHR_VALS)]
    for tc, bits, vals in tables:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int,
            body: bytes) -> bytes:
        spec = b"".join(
            struct.pack(
                "BB",
                cid + 1,
                ((0 if cid == 0 else 1) << 4) | (0 if cid == 0 else 1),
            )
            for cid in comp_ids
        )
        head = bytes([len(comp_ids)]) + spec + bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, head) + body

    all_comps = list(range(channels))

    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    _encode_dc_scan(bw, comp_blocks, dc_codes, 1)
    bw.flush()
    out += sos(all_comps, 0, 0, 0, 1, bytes(bw.buf))
    # per component: coarse AC band scans (Al=1)
    for c in all_comps:
        for ss, se in ((1, 5), (6, 63)):
            w = _ProgressiveWriter()
            _encode_ac_first_scan(w, comp_blocks[c], ac_codes[c], ss, se, 1)
            w.bw.flush()
            out += sos([c], ss, se, 0, 1, bytes(w.bw.buf))
    # per component: AC refinement to full precision (Ah=1, Al=0)
    for c in all_comps:
        w = _ProgressiveWriter()
        _encode_ac_refine_scan(w, comp_blocks[c], ac_codes[c], 1, 63, 0)
        w.bw.flush()
        out += sos([c], 1, 63, 1, 0, bytes(w.bw.buf))
    # DC refinement (Ah=1, Al=0), interleaved
    bw = _BitWriter()
    _encode_dc_refine_scan(bw, comp_blocks, 0)
    bw.flush()
    out += sos(all_comps, 0, 0, 1, 0, bytes(bw.buf))

    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def _read_symbol(br: _BitReader, tab: list[tuple[int, int]]) -> int:
    """One symbol via the cached 16-bit peek table (``_peek_table``)."""
    return _read_huff_symbol(br, tab)


def decode_jpeg_progressive(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a progressive (SOF2) JPEG to (width, height, channels,
    pixels) — full spectral-selection + successive-approximation scan
    accumulation. Same supported frame subset and ``ValueError``
    contract as :func:`jpeg_codec.decode_jpeg` (which delegates here on
    seeing SOF2)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    dc_tabs: dict[int, list[tuple[int, int]]] = {}
    ac_tabs: dict[int, list[tuple[int, int]]] = {}
    width = height = None
    comps: list[tuple[int, int]] = []  # (component id, qtable id)
    coefs: list[list[list[int]]] = []  # per comp, per block, zigzag coefs
    nblocks = 0
    saw_scan = False

    def need(n: int) -> None:
        if pos + n > len(payload):
            raise ValueError("truncated JPEG segment")

    while True:
        need(2)
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if not saw_scan:
                raise ValueError("JPEG missing SOS scan")
            break
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        need(2)
        (seg_len,) = struct.unpack_from(">H", payload, pos)
        if seg_len < 2:
            raise ValueError("bad JPEG segment length")
        need(seg_len)
        body = payload[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quantization tables supported")
                if o + 65 > len(body):
                    raise ValueError("truncated JPEG segment")
                qtables[tq] = list(body[o + 1 : o + 65])
                o += 65
        elif marker == 0xC4:
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
        elif marker == 0xC2:  # SOF2
            if width is not None:
                raise ValueError("multiple JPEG frames not supported")
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
            nblocks = ((width + 7) // 8) * ((height + 7) // 8)
            coefs = [[[0] * 64 for _ in range(nblocks)] for _ in range(nc)]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("not a progressive JPEG frame")
        elif marker == 0xDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # one scan of several
            if width is None:
                raise ValueError("JPEG SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0] + 3:
                raise ValueError("truncated JPEG segment")
            ns = body[0]
            scan: list[tuple[int, int, int]] = []
            for c in range(ns):
                cid, tabs = body[1 + 2 * c], body[2 + 2 * c]
                idx = next(
                    (i for i, (xid, _q) in enumerate(comps) if xid == cid), None
                )
                if idx is None:
                    raise ValueError("JPEG scan references unknown component")
                scan.append((idx, tabs >> 4, tabs & 0x0F))
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not (0 <= ss <= se <= 63):
                raise ValueError("bad JPEG spectral selection")
            if ss == 0 and se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            if ss > 0 and ns != 1:
                raise ValueError("progressive AC scan must be single-component")
            br = _BitReader(payload, pos)
            _decode_scan(br, scan, ss, se, ah, al, coefs, dc_tabs, ac_tabs,
                         nblocks)
            # resync to the marker that ended the entropy stream
            pos = br.pos
            saw_scan = True
        # other APPn/COM segments: skipped

    if width is None:
        raise ValueError("JPEG missing SOF")
    bw_ = (width + 7) // 8
    nc = len(comps)
    planes = [[0] * (nblocks * 64) for _ in range(nc)]
    for c in range(nc):
        _cid, tq = comps[c]
        if tq not in qtables:
            raise ValueError("JPEG scan references missing table")
        qt = qtables[tq]
        for m in range(nblocks):
            zz = coefs[c][m]
            coef = [0.0] * 64
            for i in range(64):
                coef[ZIGZAG[i]] = zz[i] * qt[i]
            px = _idct(coef)
            by, bx = divmod(m, bw_)
            p = planes[c]
            for yy in range(8):
                row = (by * 8 + yy) * bw_ * 8 + bx * 8
                p[row : row + 8] = [
                    min(255, max(0, int(round(v + 128.0))))
                    for v in px[yy * 8 : yy * 8 + 8]
                ]

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


def _decode_scan(
    br: _BitReader,
    scan: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    coefs: list[list[list[int]]],
    dc_tabs: dict[int, list[tuple[int, int]]],
    ac_tabs: dict[int, list[tuple[int, int]]],
    nblocks: int,
) -> None:
    try:
        if ss == 0:
            if ah == 0:
                preds = [0] * len(scan)
                for m in range(nblocks):
                    for si, (idx, dt, _at) in enumerate(scan):
                        if dt not in dc_tabs:
                            raise ValueError("JPEG scan references missing table")
                        s = _read_symbol(br, dc_tabs[dt])
                        diff = _extend(br.receive(s), s)
                        preds[si] += diff
                        coefs[idx][m][0] = preds[si] << al
            else:
                p1 = 1 << al
                for m in range(nblocks):
                    for idx, _dt, _at in scan:
                        if br.read_bit():
                            coefs[idx][m][0] |= p1
            return
        idx, _dt, at = scan[0]
        if at not in ac_tabs:
            raise ValueError("JPEG scan references missing table")
        tab = ac_tabs[at]
        if ah == 0:
            eobrun = 0
            for m in range(nblocks):
                zz = coefs[idx][m]
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    sym = _read_symbol(br, tab)
                    r, s = sym >> 4, sym & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += br.receive(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("JPEG AC run past end of band")
                    zz[k] = _extend(br.receive(s), s) << al
                    k += 1
        else:
            p1, m1 = 1 << al, -1 << al
            eobrun = 0
            for m in range(nblocks):
                zz = coefs[idx][m]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = _read_symbol(br, tab)
                        r, s = sym >> 4, sym & 0x0F
                        val = 0
                        if s == 0:
                            if r < 15:
                                # INCLUSIVE convention: the current block
                                # is part of the run — its remaining
                                # history coefficients still carry
                                # correction bits, consumed by the tail
                                # below before the run is decremented.
                                eobrun = 1 << r
                                if r:
                                    eobrun += br.receive(r)
                                break
                            # r == 15: skip 16 zero-history coefficients
                        else:
                            if s != 1:
                                raise ValueError(
                                    "bad JPEG AC refinement magnitude"
                                )
                            val = p1 if br.read_bit() else m1
                        while k <= se:
                            if zz[k] != 0:
                                if br.read_bit() and (zz[k] & p1) == 0:
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            else:
                                if r == 0:
                                    if val:
                                        zz[k] = val
                                    k += 1
                                    break
                                r -= 1
                            k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k] != 0:
                            if br.read_bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    except KeyError as exc:  # pragma: no cover - defensive
        raise ValueError(f"malformed JPEG entropy data: {exc}") from exc
