"""Pure stdlib+numpy BASELINE JPEG decoder (ITU-T T.81 sequential DCT,
Huffman, 8-bit).

Why this exists: the multimodal feature/resize operators route every
format they cannot truly parse to an honest fake-decode fallback, and
JPEG was the one mainstream raster format still on that fallback — not
because anything about it is environment-blocked (the spec is
self-contained, exactly like RFC 7541's Huffman coding was for the h2c
wire), but because it needed a real decoder. This module is that
decoder: marker/segment parsing, DQT/DHT/SOF0/SOS/DRI, canonical Huffman
decode of the entropy stream (byte unstuffing + restart markers), DC
prediction, dequantize + dezigzag, exact 8x8 IDCT as a float64 matrix
product, chroma upsampling by replication, and the JFIF YCbCr→RGB
transform.

Scope, stated honestly: baseline and extended-sequential Huffman frames
(SOF0/SOF1) plus PROGRESSIVE Huffman frames (SOF2 — spectral selection
and successive approximation, T.81 Annex G: DC first/refine, AC first
with EOBn runs, AC refinement with correction bits, interleaved DC and
non-interleaved AC scan geometry, restart markers per scan; coefficients
accumulate across scans and are assembled with one vectorized
dequant+IDCT per component at EOI). 8-bit precision, grayscale or
3-component YCbCr with any sampling factors expressible in the MCU grid
(4:4:4, 4:2:2 and 4:2:0 covered by tests). Arithmetic coding, lossless,
hierarchical, and 12-bit frames raise NotImplementedError with the frame
type named — callers (operators.multimodal.decode_image) route those to
the fake fallback like any other undecodable payload.

Reference anchor: surge has no media path at all; this extends the
multimodal mapInPandas operators (SURVEY §2 extension family).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: ZIGZAG[i] = position in the 8x8 block (row*8+col) of the
# i-th coefficient in transmission order
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# 8x8 DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1) u pi / 16); the 2-D
# inverse transform is then M.T @ coeffs @ M — exact to float64, no
# fast-IDCT approximation error to reason about
_M = np.zeros((8, 8))
for _u in range(8):
    _cu = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _M[_u, _x] = _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _M.T @ block @ _M


class _HuffTable:
    """Canonical JPEG Huffman table from a DHT segment's (bits, values):
    codes of length L are assigned consecutively after left-shifting past
    every shorter code (T.81 Annex C) — same construction as every
    canonical prefix code (cf. the repo's RFC 7541 table)."""

    def __init__(self, bits: list[int], values: list[int]) -> None:
        self.decode_map: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.decode_map[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.decode_map.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map the t-bit magnitude value to its signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _unstuff_segments(data: bytes) -> tuple[list[bytes], int]:
    """Split the entropy-coded stream at restart markers, unstuffing
    FF00 -> FF in each segment. Returns (segments, bytes_consumed) where
    consumed stops at the first non-RST marker (EOI/next segment)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = 0
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = data[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker: entropy data ends here
            break
    segs.append(bytes(cur))
    return segs, i


def _dc_first(reader, dc_t, cb, pred: int, al: int) -> int:
    """T.81 G.1.2.1: first DC scan — baseline DC coding of the point-
    transformed (arithmetic-shifted) values, stored pre-shifted back.

    The size symbol is range-checked (8-bit precision allows DC
    categories 0..11, F.1.2.1.1): the coef arrays are int32, and a
    crafted stream of max-category diffs could otherwise walk pred<<al
    past 2^31 — silent wraparound on numpy 1.x, uncaught OverflowError
    on numpy 2.x, either way garbage instead of the corrupt-payload
    ValueError the fallback contract promises."""
    t = reader.read_huff(dc_t)
    if t > 11:
        raise ValueError(f"JPEG DC size category {t} out of range")
    pred += _extend(reader.read_bits(t), t) if t else 0
    if not -(1 << 15) < pred < (1 << 15):
        # a valid stream's DC never leaves ±2047 at any precision; a
        # corrupt one could accumulate max-category diffs across blocks
        # until pred<<al leaves int32 — bound it well before that
        raise ValueError("JPEG DC predictor out of range")
    cb[0] = pred << al
    return pred


def _ac_first(reader, ac_t, cb, ss: int, se: int, al: int, eobrun: int) -> int:
    """T.81 G.1.2.2: first AC scan for one block's spectral band — baseline
    run/size coding of the point-transformed values plus EOBn codes that
    declare runs of band-empty blocks (the eobrun)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_huff(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:  # EOBn: this block done, 2^r + ext - 1 more follow
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun
            k += 16  # ZRL
            continue
        if s > 10:  # 8-bit AC size categories are 1..10 (F.1.2.2.1)
            raise ValueError(f"JPEG AC size category {s} out of range")
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        cb[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _ac_refine(reader, ac_t, cb, ss: int, se: int, al: int, eobrun: int) -> int:
    """T.81 G.1.2.3: AC successive-approximation refinement. Every
    nonzero-history coefficient the scan passes over reads one correction
    bit; newly-significant coefficients arrive as (run-of-zero-history,
    size=1) symbols with a sign bit. On EOBn the CURRENT block still
    consumes correction bits to the end of the band (the r=64 walk), and
    eobrun-many subsequent blocks are correction-bits-only."""
    p1 = 1 << al
    m1 = -(1 << al)

    def correct(k: int) -> None:
        c = cb[k]
        if c != 0 and reader.read_bit() and (abs(int(c)) & p1) == 0:
            cb[k] = c + (p1 if c > 0 else m1)

    if eobrun > 0:
        for k in range(ss, se + 1):
            correct(k)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_huff(ac_t)
        r, s = rs >> 4, rs & 0x0F
        val = 0
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read_bits(r)
                r = 64  # walk out the band, correction bits only
            # r == 15 (ZRL): skip 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("JPEG AC refinement size != 1")
            val = p1 if reader.read_bit() else m1
        while k <= se:
            if cb[k] != 0:
                correct(k)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if val and k <= se:
            cb[k] = val
        k += 1
    return eobrun


def _seq_ac(reader, ac_t, cb) -> None:
    """Sequential AC coding of one block (the baseline body), written
    into a coefficient array — used by non-interleaved multi-scan
    sequential files routed through the accumulation path."""
    k = 1
    while k < 64:
        rs = reader.read_huff(ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break
        k += r
        if k > 63:
            raise ValueError("JPEG AC run past block end")
        cb[k] = _extend(reader.read_bits(s), s)
        k += 1


def _decode_progressive_scan(
    data: bytes,
    frame,
    scan_order: list[int],
    scan_tables,
    ss: int,
    se: int,
    ah: int,
    al: int,
    coef,
    huff_dc,
    huff_ac,
    restart_interval: int,
    sequential: bool = False,
) -> int:
    """Decode one progressive scan — or one NON-INTERLEAVED SEQUENTIAL
    scan of a multi-scan baseline file (``sequential=True``: full DC+AC
    per block, no spectral selection) — into the per-component
    coefficient arrays; returns the number of payload bytes consumed
    (entropy data up to the next real marker). ``scan_order`` lists
    component ids in scan order."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    samp = {cid: (hh, vv) for cid, hh, vv, _tq in comps}
    if sequential:
        if len(scan_order) != 1:
            raise NotImplementedError(
                "partial-component interleaved sequential scan unsupported"
            )
    else:
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if ss > 0 and len(scan_order) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if 1 < len(scan_order) < len(comps):
            raise NotImplementedError(
                "partial-component interleaved progressive scan unsupported"
            )
    segs, consumed = _unstuff_segments(data)
    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = {cid: 0 for cid in scan_order}
    eobrun = 0

    interleaved = len(scan_order) > 1
    if interleaved:
        total = mcus_x * mcus_y
    else:
        cid0 = scan_order[0]
        hh, vv = samp[cid0]
        # the component's own raster (T.81 A.2.2): ceil over the scaled
        # dimension, then ceil to whole blocks — NOT the MCU-padded grid
        cw = -(-(w * hh) // hmax)
        ch = -(-(h * vv) // vmax)
        bx_n = -(-cw // 8)
        by_n = -(-ch // 8)
        total = bx_n * by_n

    for unit in range(total):
        if restart_interval and unit and unit % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_idx])
            pred = {cid: 0 for cid in scan_order}
            eobrun = 0
        if interleaved:
            my, mx = divmod(unit, mcus_x)
            for cid in scan_order:
                hh, vv = samp[cid]
                for by in range(vv):
                    for bx in range(hh):
                        cb = coef[cid][my * vv + by, mx * hh + bx]
                        if ah == 0:
                            pred[cid] = _dc_first(
                                reader, huff_dc[scan_tables[cid][0]], cb,
                                pred[cid], al,
                            )
                        else:
                            cb[0] |= reader.read_bit() << al
        else:
            by, bx = divmod(unit, bx_n)
            cb = coef[cid0][by, bx]
            if sequential:
                pred[cid0] = _dc_first(
                    reader, huff_dc[scan_tables[cid0][0]], cb, pred[cid0], 0
                )
                _seq_ac(reader, huff_ac[scan_tables[cid0][1]], cb)
            elif ss == 0:
                if ah == 0:
                    pred[cid0] = _dc_first(
                        reader, huff_dc[scan_tables[cid0][0]], cb,
                        pred[cid0], al,
                    )
                else:
                    cb[0] |= reader.read_bit() << al
            elif ah == 0:
                eobrun = _ac_first(
                    reader, huff_ac[scan_tables[cid0][1]], cb, ss, se, al,
                    eobrun,
                )
            else:
                eobrun = _ac_refine(
                    reader, huff_ac[scan_tables[cid0][1]], cb, ss, se, al,
                    eobrun,
                )
    return consumed


def _assemble_progressive(frame, coef, qtables):
    """Dequantize + dezigzag + IDCT the accumulated coefficient arrays —
    one vectorized einsum per component, not a per-block Python loop."""
    h, w, comps = frame
    planes = {}
    for cid, hh, vv, tq in comps:
        q = qtables[tq].astype(np.int64)
        deq = coef[cid].astype(np.int64) * q
        blocks = np.zeros(deq.shape, np.float64)
        blocks[..., ZIGZAG] = deq
        b8 = blocks.reshape(deq.shape[0], deq.shape[1], 8, 8)
        px = np.einsum("ji,abjk,kl->abil", _M, b8, _M) + 128.0
        by, bx = deq.shape[:2]
        planes[cid] = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return planes


def _alloc_coef(frame) -> dict[int, np.ndarray]:
    """Allocate the per-component (by, bx, 64) zigzag coefficient arrays
    for the accumulation path (progressive / multi-scan sequential), with
    the sampling-factor and decompression-bomb guards."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax == 0 or vmax == 0:
        raise ValueError("JPEG sampling factor 0")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    if mcus_x * mcus_y * 64 > 268_435_456:
        raise ValueError("JPEG declares unreasonable dimensions")
    return {
        cid: np.zeros((mcus_y * vv, mcus_x * hh, 64), np.int32)
        for cid, hh, vv, _tq in comps
    }


def _parse_sos_components(seg: bytes, ns: int):
    """SOS component-spec list -> ({cid: (dc_table, ac_table)}, scan order)."""
    scan_tables = {}
    scan_order = []
    for c in range(ns):
        cs, tt = seg[1 + c * 2], seg[2 + c * 2]
        scan_tables[cs] = (tt >> 4, tt & 0x0F)
        scan_order.append(cs)
    return scan_tables, scan_order


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline or progressive JPEG to (width, height,
    HxWx3 uint8 RGB).

    Truncated/corrupt streams raise ValueError (never IndexError/
    struct.error — the r6 corrupt-PNG lesson: the feature extractor's
    fallback catches ValueError/NotImplementedError only, so any other
    exception type would poison the whole Arrow batch)."""
    try:
        return _decode_jpeg_inner(payload)
    except (IndexError, struct.error, KeyError, ZeroDivisionError, OverflowError) as e:
        # KeyError: scan references a Huffman/quant table id never
        # declared; ZeroDivisionError: sampling byte 0x00 -> hmax/vmax 0;
        # OverflowError: a crafted value escaping into an int32 coef slot
        # (numpy 2.x raises where 1.x wrapped — the range guards should
        # fire first, this is the belt to their braces). All are
        # malformed-stream shapes, not missing capabilities.
        raise ValueError(f"corrupt/truncated JPEG: {type(e).__name__}") from e


def _decode_jpeg_inner(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, components)
    progressive = False
    coef = None  # progressive: per-component (by, bx, 64) zigzag arrays
    n_scans = 0
    i = 2
    n = len(payload)
    while i < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xFF, 0x00):  # fill byte / stuffed
            i += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(bits, values)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG unsupported")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + c * 3 : 9 + c * 3]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            if progressive and ncomp == 1:
                # same T.81 A.2.2 normalization the baseline path applies
                # at SOS: every scan of a 1-component frame is
                # non-interleaved, sampling factors are ignored
                cid0, _hh, _vv, tq0 = comps[0]
                comps = [(cid0, 1, 1, tq0)]
            frame = (h, w, comps)
            if progressive:
                coef = _alloc_coef(frame)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG frame (marker 0xFF{marker:02X}: "
                "lossless/arithmetic/hierarchical) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if progressive:
                scan_tables, scan_order = _parse_sos_components(seg, ns)
                ss_, se_ = seg[1 + ns * 2], seg[2 + ns * 2]
                ahal = seg[3 + ns * 2]
                consumed = _decode_progressive_scan(
                    payload[i:], frame, scan_order, scan_tables,
                    ss_, se_, ahal >> 4, ahal & 0x0F,
                    coef, huff_dc, huff_ac, restart_interval,
                )
                n_scans += 1
                i += consumed
                continue
            if ns != len(frame[2]):
                # T.81-legal baseline file split into non-interleaved
                # scans (one component per scan): route through the same
                # coefficient-accumulation path progressive uses, with
                # full sequential DC+AC per block; assembled at EOI.
                # Partial-component INTERLEAVED scans stay rejected
                # inside the scan decoder.
                if coef is None:
                    coef = _alloc_coef(frame)
                scan_tables, scan_order = _parse_sos_components(seg, ns)
                consumed = _decode_progressive_scan(
                    payload[i:], frame, scan_order, scan_tables,
                    0, 63, 0, 0, coef, huff_dc, huff_ac, restart_interval,
                    sequential=True,
                )
                n_scans += 1
                i += consumed
                continue
            scan_tables, _ = _parse_sos_components(seg, ns)
            if len(frame[2]) == 1:
                # T.81 A.2.2: a single-component scan is NON-interleaved —
                # the MCU is one data unit in the component's own raster
                # order and the declared sampling factors are ignored.
                # Grayscale files from color encoders routinely keep
                # samp=0x22 on their only component; interleaved geometry
                # would decode them to a silently block-permuted image.
                # Normalized HERE so scan decode and upsample agree.
                cid0, _hh, _vv, tq0 = frame[2][0]
                frame = (frame[0], frame[1], [(cid0, 1, 1, tq0)])
            planes = _decode_scan(
                payload[i:], frame, scan_tables, qtables, huff_dc, huff_ac,
                restart_interval,
            )
            return _to_rgb(frame, planes)
    if coef is not None and n_scans:  # progressive OR sequential multi-scan
        return _to_rgb(frame, _assemble_progressive(frame, coef, qtables))
    raise ValueError("JPEG has no scan data")


def _decode_scan(
    data: bytes,
    frame,
    scan_tables,
    qtables,
    huff_dc,
    huff_ac,
    restart_interval: int,
):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    segs, _ = _unstuff_segments(data)
    # per-component coefficient planes at their own sampling resolution
    planes = {
        cid: np.zeros((mcus_y * vv * 8, mcus_x * hh * 8), dtype=np.float64)
        for cid, hh, vv, _tq in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    seg_idx = 0
    reader = _BitReader(segs[0])
    mcu = 0
    total = mcus_x * mcus_y
    while mcu < total:
        if restart_interval and mcu and mcu % restart_interval == 0:
            # restart: next entropy segment, DC predictors reset
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG missing restart segment")
            reader = _BitReader(segs[seg_idx])
            pred = {cid: 0 for cid in pred}
        my, mx = divmod(mcu, mcus_x)
        for cid, hh, vv, tq in comps:
            dc_t = huff_dc[scan_tables[cid][0]]
            ac_t = huff_ac[scan_tables[cid][1]]
            q = qtables[tq]
            for by in range(vv):
                for bx in range(hh):
                    zz = np.zeros(64, dtype=np.int64)
                    t = reader.read_huff(dc_t)
                    diff = _extend(reader.read_bits(t), t) if t else 0
                    pred[cid] += diff
                    zz[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.read_huff(ac_t)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[ZIGZAG] = zz * q  # dequant + dezigzag in one
                    px = _idct2(block.reshape(8, 8)) + 128.0
                    y0 = (my * vv + by) * 8
                    x0 = (mx * hh + bx) * 8
                    planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
        mcu += 1
    return planes


def _to_rgb(frame, planes) -> tuple[int, int, np.ndarray]:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    full = {}
    for cid, hh, vv, _tq in comps:
        p = planes[cid]
        # replicate-upsample to full resolution, then trim the MCU padding
        p = np.repeat(np.repeat(p, vmax // vv, axis=0), hmax // hh, axis=1)
        full[cid] = p[:h, :w]
    if len(comps) == 1:
        y = np.clip(np.round(full[comps[0][0]]), 0, 255).astype(np.uint8)
        return w, h, np.ascontiguousarray(np.stack([y, y, y], axis=-1))
    if len(comps) != 3:
        raise NotImplementedError(f"{len(comps)}-component JPEG unsupported")
    yid, cbid, crid = (c[0] for c in comps)
    y, cb, cr = full[yid], full[cbid] - 128.0, full[crid] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.ascontiguousarray(
        np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    )
