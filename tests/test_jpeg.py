"""Baseline JPEG decoder (operators/jpeg.py): constructed-bytes tests.

The tests carry their own MINIMAL baseline encoder — custom canonical
Huffman tables written into DHT (the decoder must read tables from the
file, so no Annex K constants are needed on either side), all-ones
quantization so decode error is pure FDCT/IDCT rounding, FF byte
stuffing, restart markers, and 4:2:0 subsampling for the color case.
Pins: grayscale exactness within rounding, restart-marker handling,
chroma upsample + YCbCr→RGB, arithmetic-coding rejection, and the
decode_image/extract_features dispatch. A progressive encoder (T.81
Annex G: successive-approximation ladder, cross-block EOBn runs,
buffered-correction-bit refinement, interleaved DC scans) pins the
SOF2 path against the baseline decode of identical coefficients."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from surge_spark.operators.jpeg import _M, decode_jpeg

# -- minimal encoder ----------------------------------------------------------

# canonical tables covering every symbol we might emit: DC categories
# 0..11 all at code length 4; AC run/size bytes all at length 8 (162
# run/size symbols + 14 progressive EOBn symbols fit in 256 codes)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]  # EOBn (progressive AC scans)
)
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


def _canonical_codes(bits, vals):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)

from surge_spark.operators.jpeg import ZIGZAG  # noqa: E402


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _fdct_block(pix):
    """Forward DCT of one 8x8 spatial block (0-255): F = M X M^T, the
    exact inverse pair of the decoder's M^T F M."""
    return _M @ (pix.astype(np.float64) - 128.0) @ _M.T


def _cat(v):
    return int(abs(v)).bit_length()


def _encode_block(bw, coeffs, pred):
    zz = np.round(coeffs.reshape(64)[ZIGZAG]).astype(int)
    dc = int(zz[0])
    diff = dc - pred
    t = _cat(diff)
    ln, code = _DC_CODES[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    k = 1
    run = 0
    last_nz = max([i for i in range(1, 64) if zz[i]] or [0])
    while k <= last_nz:
        v = int(zz[k])
        if v == 0:
            run += 1
            k += 1
            continue
        while run > 15:
            ln, code = _AC_CODES[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = _AC_CODES[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
        k += 1
    if last_nz < 63:
        ln, code = _AC_CODES[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht(tc, th, bits, vals):
    return _seg(0xC4, bytes([(tc << 4) | th] + bits + vals))


def _dqt_ones(tq):
    return _seg(0xDB, bytes([tq]) + bytes([1] * 64))


def _encode_gray(img, restart_interval=0):
    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0)
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _AC_BITS, _AC_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    pred = 0
    mcu = 0
    bw = _BitWriter()
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += bw.flush()
                out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                bw = _BitWriter()
                pred = 0
            pred = _encode_block(
                bw, _fdct_block(img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]),
                pred,
            )
            mcu += 1
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_420(rgb):
    """16x16 RGB -> baseline 4:2:0 YCbCr JPEG (one MCU: 4 Y + Cb + Cr).
    Returns (bytes, y_plane, cb_sub, cr_sub) so tests can compare against
    the exact planes that were encoded."""
    h, w, _ = rgb.shape
    assert (h, w) == (16, 16)
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb_s = cb.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    cr_s = cr.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0) + _dqt_ones(1)
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for th in (0, 1):
        out += _dht(0, th, _DC_BITS, _DC_VALS)
        out += _dht(1, th, _AC_BITS, _AC_VALS)
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for by in range(2):  # 4 Y blocks in raster order
        for bx in range(2):
            preds[1] = _encode_block(
                bw, _fdct_block(y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]),
                preds[1],
            )
    preds[2] = _encode_block(bw, _fdct_block(cb_s), preds[2])
    preds[3] = _encode_block(bw, _fdct_block(cr_s), preds[3])
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out), y, cb_s, cr_s


# -- progressive encoder (T.81 Annex G) ---------------------------------------


def _zz_blocks(plane):
    """Raster-order list of per-block zigzag int coefficient vectors
    (all-ones quantization, same rounding as _encode_block)."""
    h, w = plane.shape
    out = []
    for by in range(h // 8):
        for bx in range(w // 8):
            c = _fdct_block(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8])
            out.append(np.round(c.reshape(64)[ZIGZAG]).astype(int))
    return out


def _pt_ac(v, al):
    """AC point transform: sign-magnitude shift toward zero (G.1.2.2)."""
    return (v >> al) if v >= 0 else -((-v) >> al)


def _emit_dc_first(bw, zz_list, al, restart_interval=0, out=None):
    pred = 0
    for unit, zz in enumerate(zz_list):
        if restart_interval and unit and unit % restart_interval == 0:
            out += bw.flush()
            out += bytes([0xFF, 0xD0 + ((unit // restart_interval - 1) % 8)])
            bw.out, bw.acc, bw.nbits = bytearray(), 0, 0
            pred = 0
        v = int(zz[0]) >> al  # DC point transform is ARITHMETIC shift
        diff = v - pred
        pred = v
        t = _cat(diff)
        ln, code = _DC_CODES[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)


def _emit_dc_refine(bw, zz_list, al):
    for zz in zz_list:
        bw.write((int(zz[0]) >> al) & 1, 1)


def _emit_ac_first(bw, zz_list, ss, se, al):
    """First AC scan with cross-block EOBn runs (so the decoder's eobrun
    path is exercised, not just per-block EOB0)."""
    eob_count = 0

    def flush_eob():
        nonlocal eob_count
        while eob_count:
            r = min(14, eob_count.bit_length() - 1)
            take = min(eob_count, (1 << (r + 1)) - 1)
            ln, code = _AC_CODES[r << 4]
            bw.write(code, ln)
            if r:
                bw.write(take - (1 << r), r)
            eob_count -= take

    for zz in zz_list:
        vals = [_pt_ac(int(zz[k]), al) for k in range(ss, se + 1)]
        nz = [i for i, v in enumerate(vals) if v]
        if not nz:
            eob_count += 1
            continue
        flush_eob()
        run = 0
        for v in vals[: nz[-1] + 1]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = _AC_CODES[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _cat(v)
            ln, code = _AC_CODES[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if nz[-1] < len(vals) - 1:
            eob_count += 1  # block tail joins the cross-block EOB run
    flush_eob()


def _emit_ac_refine(bw, zz_list, ss, se, al):
    """AC refinement: libjpeg's buffered-correction-bit discipline —
    corrections for nonzero-history coefficients buffer up and flush
    after each emitted symbol, which is exactly the set the decoder's
    walk for that symbol consumes."""
    for zz in zz_list:
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        pending: list[int] = []
        r = 0
        for v in vals:
            cur = _pt_ac(v, al)
            prior = _pt_ac(v, al + 1)
            if cur == 0:
                r += 1
                continue
            while r > 15:
                ln, code = _AC_CODES[0xF0]
                bw.write(code, ln)
                r -= 16
                for b in pending:
                    bw.write(b, 1)
                pending = []
            if prior != 0:
                pending.append(abs(cur) & 1)  # correction bit
                continue
            # newly significant: |cur| must be 1 at this precision
            assert abs(cur) == 1
            ln, code = _AC_CODES[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if cur > 0 else 0, 1)  # sign
            for b in pending:
                bw.write(b, 1)
            pending = []
            r = 0
        if pending or r > 0:
            ln, code = _AC_CODES[0x00]  # EOB0: decoder walks out the band
            bw.write(code, ln)
            for b in pending:
                bw.write(b, 1)


def _sos_prog(cid, table, ss, se, ah, al):
    return _seg(0xDA, bytes([1, cid, table, ss, se, (ah << 4) | al]))


def _encode_progressive_gray(img, restart_interval=0, split=5):
    """Full successive-approximation ladder: DC first (Al=1), two AC
    bands first (Al=1), DC refine, two AC band refinements — six scans,
    same quantized coefficients as _encode_gray."""
    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    zz_list = _zz_blocks(img.astype(np.float64))
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0)
    out += _seg(0xC2, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _AC_BITS, _AC_VALS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    # scan 1: DC first, Al=1 (restarts exercised here if requested)
    out += _sos_prog(1, 0x00, 0, 0, 0, 1)
    bw = _BitWriter()
    _emit_dc_first(bw, zz_list, 1, restart_interval, out)
    out += bw.flush()
    if restart_interval:
        # DRI persists across scans (T.81 B.2.4.4) — disable it so the
        # AC scans below stay restart-free
        out += _seg(0xDD, struct.pack(">H", 0))
    # scans 2-3: AC first per band, Al=1
    for ss, se in ((1, split), (split + 1, 63)):
        out += _sos_prog(1, 0x00, ss, se, 0, 1)
        bw = _BitWriter()
        _emit_ac_first(bw, zz_list, ss, se, 1)
        out += bw.flush()
    # scan 4: DC refine to Al=0
    out += _sos_prog(1, 0x00, 0, 0, 1, 0)
    bw = _BitWriter()
    _emit_dc_refine(bw, zz_list, 0)
    out += bw.flush()
    # scans 5-6: AC refine per band to Al=0
    for ss, se in ((1, split), (split + 1, 63)):
        out += _sos_prog(1, 0x00, ss, se, 1, 0)
        bw = _BitWriter()
        _emit_ac_refine(bw, zz_list, ss, se, 0)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _encode_progressive_420(rgb):
    """Progressive twin of _encode_420 (same planes, same coefficients):
    one interleaved DC scan (4 Y + Cb + Cr per MCU) then three
    non-interleaved full-band AC scans, all at Al=0 — spectral selection
    without successive approximation."""
    h, w, _ = rgb.shape
    assert (h, w) == (16, 16)
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb_s = cb.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    cr_s = cr.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    zz_y = _zz_blocks(y)          # 4 blocks, raster order
    zz_cb = _zz_blocks(cb_s)      # 1 block each
    zz_cr = _zz_blocks(cr_s)
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0) + _dqt_ones(1)
    out += _seg(
        0xC2,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for th in (0, 1):
        out += _dht(0, th, _DC_BITS, _DC_VALS)
        out += _dht(1, th, _AC_BITS, _AC_VALS)
    # interleaved DC-first scan: one MCU = 4 Y blocks + Cb + Cr
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0]))
    bw = _BitWriter()
    pred_y = pred_cb = pred_cr = 0

    def dc_code(bw, zz, pred):
        v = int(zz[0])
        diff = v - pred
        t = _cat(diff)
        ln, code = _DC_CODES[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return v

    for zz in zz_y:
        pred_y = dc_code(bw, zz, pred_y)
    pred_cb = dc_code(bw, zz_cb[0], pred_cb)
    pred_cr = dc_code(bw, zz_cr[0], pred_cr)
    out += bw.flush()
    # non-interleaved AC scans, full band, Al=0
    for cid, blocks in ((1, zz_y), (2, zz_cb), (3, zz_cr)):
        out += _sos_prog(cid, 0x00 if cid == 1 else 0x11, 1, 63, 0, 0)
        bw = _BitWriter()
        _emit_ac_first(bw, blocks, 1, 63, 0)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out), y, cb_s, cr_s


# -- tests --------------------------------------------------------------------


def _gradient(h, w, seed=3):
    rng = np.random.RandomState(seed)
    base = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
    return np.clip(base + rng.randint(0, 20, (h, w)), 0, 255).astype(np.uint8)


def test_gray_roundtrip_within_rounding():
    img = _gradient(16, 24)
    w, h, rgb = decode_jpeg(_encode_gray(img))
    assert (w, h) == (24, 16)
    assert rgb.shape == (16, 24, 3)
    err = np.abs(rgb[..., 0].astype(int) - img.astype(int))
    # all-ones quant: error is FDCT coefficient rounding only
    assert err.max() <= 2, err.max()
    assert np.array_equal(rgb[..., 0], rgb[..., 1])


def test_restart_markers_reset_predictors():
    img = _gradient(8, 48, seed=9)
    payload = _encode_gray(img, restart_interval=2)
    assert b"\xff\xd0" in payload  # RST0 present
    w, h, rgb = decode_jpeg(payload)
    assert (w, h) == (48, 8)
    err = np.abs(rgb[..., 0].astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()


def test_color_420_upsample_and_ycbcr():
    rng = np.random.RandomState(5)
    rgb_src = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    payload, y, cb_s, cr_s = _encode_420(rgb_src)
    w, h, rgb = decode_jpeg(payload)
    assert (w, h) == (16, 16)
    # reference: what a replicate-upsampling decoder of the EXACT encoded
    # planes should produce (the JPEG pipeline's own loss stays out of the
    # comparison; only the decoder's rounding remains)
    cb_f = np.repeat(np.repeat(cb_s, 2, axis=0), 2, axis=1) - 128.0
    cr_f = np.repeat(np.repeat(cr_s, 2, axis=0), 2, axis=1) - 128.0
    ref_r = np.clip(np.round(y + 1.402 * cr_f), 0, 255)
    ref_g = np.clip(np.round(y - 0.344136 * cb_f - 0.714136 * cr_f), 0, 255)
    ref_b = np.clip(np.round(y + 1.772 * cb_f), 0, 255)
    for ch, ref in zip(range(3), (ref_r, ref_g, ref_b)):
        err = np.abs(rgb[..., ch].astype(float) - ref)
        assert err.max() <= 4, (ch, err.max())


def test_arithmetic_rejected_with_clear_error():
    img = _gradient(8, 8)
    payload = bytearray(_encode_gray(img))
    # flip SOF0 (0xC0) to SOF9 (arithmetic sequential)
    idx = payload.index(bytes([0xFF, 0xC0]))
    payload[idx + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(payload))


def test_progressive_gray_matches_baseline_exactly():
    """The full successive-approximation ladder (6 scans, Al=1->0, band
    split at k=5) carries the SAME quantized coefficients as the baseline
    encoding — decode must agree with the baseline decode to the pixel
    (both run the identical dequant+IDCT math) and with the original
    within the usual FDCT/IDCT rounding."""
    img = _gradient(24, 32)
    _, _, base = decode_jpeg(_encode_gray(img))
    w, h, prog = decode_jpeg(_encode_progressive_gray(img))
    assert (w, h) == (32, 24)
    assert int(np.abs(prog.astype(int) - base.astype(int)).max()) <= 1
    err = np.abs(prog[..., 0].astype(int) - img.astype(int))
    assert err.max() <= 2


def test_progressive_dc_restart_markers():
    img = _gradient(16, 32, seed=5)
    _, _, base = decode_jpeg(_encode_progressive_gray(img))
    _, _, rst = decode_jpeg(_encode_progressive_gray(img, restart_interval=3))
    assert (base == rst).all()


def test_progressive_eobrun_spans_blocks():
    """A DC-flat image with one high-frequency spike: every other block's
    AC bands are empty, so the encoder emits cross-block EOBn runs that
    the decoder's eobrun path must count through correctly."""
    img = np.full((24, 24), 100, np.uint8)
    img[8:16, 8:16] = np.clip(
        100 + 40 * ((np.add.outer(np.arange(8), np.arange(8)) % 2)), 0, 255
    ).astype(np.uint8)
    _, _, base = decode_jpeg(_encode_gray(img))
    _, _, prog = decode_jpeg(_encode_progressive_gray(img))
    assert int(np.abs(prog.astype(int) - base.astype(int)).max()) <= 1


def test_progressive_color_420_interleaved_dc():
    """Interleaved DC scan geometry (4 Y + Cb + Cr per MCU) plus
    non-interleaved per-component AC scans — the canonical progressive
    color layout — decodes to the same image as the baseline 4:2:0
    encoding of the identical planes."""
    rng = np.random.RandomState(23)
    rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    payload_b, *_ = _encode_420(rgb)
    payload_p, *_ = _encode_progressive_420(rgb)
    _, _, base = decode_jpeg(payload_b)
    w, h, prog = decode_jpeg(payload_p)
    assert (w, h) == (16, 16)
    assert int(np.abs(prog.astype(int) - base.astype(int)).max()) <= 1


def test_progressive_truncated_raises_value_error():
    payload = _encode_progressive_gray(_gradient(16, 16))
    with pytest.raises(ValueError):
        decode_jpeg(payload[: int(len(payload) * 0.7)])


def test_truncated_stream_raises_value_error():
    img = _gradient(8, 8)
    payload = _encode_gray(img)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_decode_image_dispatches_jpeg():
    from surge_spark.operators.multimodal import decode_image

    img = _gradient(8, 16)
    w, h, rgb = decode_image(_encode_gray(img))
    assert (w, h) == (16, 8)
    assert np.abs(rgb[..., 0].astype(int) - img.astype(int)).max() <= 2


def test_extract_features_uses_real_jpeg_pixels(spark):
    """A JPEG payload through the mapInPandas feature extractor must yield
    REAL dimensions and pixel statistics, not the fake-decode fallback."""
    import pandas as pd

    from surge_spark.operators.multimodal import extract_features

    img = np.full((8, 8), 200, dtype=np.uint8)
    payload = _encode_gray(img)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1],
                "payload": [bytearray(payload)],
                "mime": ["image/jpeg"],
            }
        )
    )
    row = extract_features(df, "id").collect()[0]
    assert (row.width, row.height) == (8, 8)
    # constant-200 image: mean/min/max all ~200/255
    feats = list(row.feat)
    assert abs(feats[3] - 200 / 255) < 0.02
    assert abs(feats[5] - feats[4]) < 0.03  # max-min tiny for a flat image


def test_undeclared_table_and_zero_sampling_are_value_errors():
    """Malformed-but-magic-valid streams must raise ValueError (the
    fallback contract), never KeyError/ZeroDivisionError escaping the
    mapInPandas batch."""
    img = _gradient(8, 8)
    payload = bytearray(_encode_gray(img))
    # point the scan at Huffman table 3 (never declared)
    sos = payload.index(bytes([0xFF, 0xDA]))
    payload[sos + 6] = 0x33
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    # sampling byte 0x00 on EVERY component of a color SOF -> hmax 0
    # (single-component frames normalize sampling away, so the zero-div
    # shape only exists for interleaved multi-component scans)
    rng = np.random.RandomState(4)
    color, *_ = _encode_420(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8))
    payload2 = bytearray(color)
    sof = payload2.index(bytes([0xFF, 0xC0]))
    for ci in range(3):
        payload2[sof + 11 + ci * 3] = 0x00
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload2))


def test_single_component_scan_ignores_sampling_factors():
    """T.81 A.2.2: a grayscale JPEG whose only component declares
    samp=0x22 (common leftover from color encoders) must decode in the
    component's own raster order — identical pixels to the 0x11 file,
    never a silently block-permuted image."""
    img = _gradient(16, 32, seed=11)
    plain = _encode_gray(img)
    tweaked = bytearray(plain)
    sof = tweaked.index(bytes([0xFF, 0xC0]))
    assert tweaked[sof + 11] == 0x11
    tweaked[sof + 11] = 0x22
    w1, h1, rgb1 = decode_jpeg(plain)
    w2, h2, rgb2 = decode_jpeg(bytes(tweaked))
    assert (w1, h1) == (w2, h2) == (32, 16)
    assert np.array_equal(rgb1, rgb2)


def test_multi_scan_baseline_rejected_not_scrambled():
    """A 3-component frame whose SOS lists one component (non-interleaved
    multi-scan baseline) is out of scope — it must reject loudly, not
    decode the first scan as the whole image."""
    rng = np.random.RandomState(2)
    payload, *_ = _encode_420(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8))
    b = bytearray(payload)
    sos = b.index(bytes([0xFF, 0xDA]))
    # rewrite the SOS header to a single-component scan (len 8: Ns=1)
    b[sos + 2 : sos + 12] = struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    with pytest.raises((NotImplementedError, ValueError)):
        decode_jpeg(bytes(b))


def test_ac_refine_zrl_with_interleaved_corrections():
    """Unit-level pin of the hardest refinement path: a newly-significant
    coefficient behind a 20-long zero-history run forces a ZRL whose walk
    must consume the correction bit of a nonzero-history coefficient
    sitting INSIDE the run — the bit-ordering the buffered-corrections
    discipline exists for. Round-trips encoder->decoder at the function
    level and checks exact coefficient recovery."""
    from surge_spark.operators.jpeg import (
        _ac_first,
        _ac_refine,
        _BitReader,
        _HuffTable,
    )

    truth = np.zeros(64, int)
    truth[1] = 5      # history at Al=1 (prior 2), correction bit 1
    truth[22] = -1    # newly significant at Al=0, 20 zero-history before it
    truth[40] = 3     # history (prior 1), correction bit 1, then EOB tail
    table = _HuffTable(_AC_BITS, _AC_VALS)

    bw = _BitWriter()
    _emit_ac_first(bw, [truth], 1, 63, 1)
    cb = np.zeros(64, np.int32)
    eob = _ac_first(_BitReader(bw.flush()), table, cb, 1, 63, 1, 0)
    assert eob == 0
    assert cb[1] == 4 and cb[22] == 0 and cb[40] == 2  # Al=1 precision <<1

    bw = _BitWriter()
    _emit_ac_refine(bw, [truth], 1, 63, 0)
    eob = _ac_refine(_BitReader(bw.flush()), table, cb, 1, 63, 0, 0)
    assert eob == 0
    assert (cb == truth).all(), cb[cb != truth]


def _pad_to_blocks(plane):
    h, w = plane.shape
    hp, wp = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.empty((hp, wp), np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :w]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _encode_multiscan_420(rgb):
    """T.81-legal baseline file split into THREE non-interleaved scans
    (Y, Cb, Cr — one component each) on a 16x24 4:2:0 frame: the Y scan
    iterates the component's OWN 2x3 block raster (not the MCU-padded
    2x4 grid) and the 8x12 chroma planes carry an edge-padded partial
    block — exactly the geometry the coefficient-accumulation path must
    get right."""
    h, w, _ = rgb.shape
    assert (h, w) == (16, 24)
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb_s = cb.reshape(8, 2, 12, 2).mean(axis=(1, 3))
    cr_s = cr.reshape(8, 2, 12, 2).mean(axis=(1, 3))
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0) + _dqt_ones(1)
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for th in (0, 1):
        out += _dht(0, th, _DC_BITS, _DC_VALS)
        out += _dht(1, th, _AC_BITS, _AC_VALS)
    for cid, table, plane in ((1, 0x00, y), (2, 0x11, cb_s), (3, 0x11, cr_s)):
        out += _seg(0xDA, bytes([1, cid, table, 0, 63, 0]))
        padded = _pad_to_blocks(plane)
        bw = _BitWriter()
        pred = 0
        for by in range(padded.shape[0] // 8):
            for bx in range(padded.shape[1] // 8):
                pred = _encode_block(
                    bw,
                    _fdct_block(
                        padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                    ),
                    pred,
                )
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out), y, cb_s, cr_s


def test_multiscan_sequential_baseline_420():
    """Non-interleaved multi-scan baseline (previously rejected): decode
    through the coefficient path and compare against the replicate-
    upsampling reference of the exact encoded planes."""
    rng = np.random.RandomState(29)
    rgb_src = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    payload, y, cb_s, cr_s = _encode_multiscan_420(rgb_src)
    w, h, rgb = decode_jpeg(payload)
    assert (w, h) == (24, 16)
    cb_f = np.repeat(np.repeat(cb_s, 2, axis=0), 2, axis=1) - 128.0
    cr_f = np.repeat(np.repeat(cr_s, 2, axis=0), 2, axis=1) - 128.0
    ref_r = np.clip(np.round(y + 1.402 * cr_f), 0, 255)
    ref_g = np.clip(np.round(y - 0.344136 * cb_f - 0.714136 * cr_f), 0, 255)
    ref_b = np.clip(np.round(y + 1.772 * cb_f), 0, 255)
    for ch, ref in zip(range(3), (ref_r, ref_g, ref_b)):
        err = np.abs(rgb[..., ch].astype(float) - ref)
        assert err.max() <= 4, (ch, err.max())


def test_multiscan_sequential_gray_matches_single_scan():
    """A 1-component frame always takes the single-scan path; a 3-scan
    gray-as-3x-luma file is contrived, so instead pin that a multi-scan
    Y-only restart-free stream and the interleaved encoding of the same
    24x16 image agree exactly: encode the LUMA plane both ways through
    the two code paths via a 3-component 4:4:4 frame."""
    rng = np.random.RandomState(31)
    rgb_src = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    payload_i, *_ = _encode_420(rgb_src)

    # 4:4:4 multi-scan of the same rgb: three full-res component scans
    r = rgb_src[..., 0].astype(np.float64)
    g = rgb_src[..., 1].astype(np.float64)
    b = rgb_src[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0) + _dqt_ones(1)
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, 16, 16, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for th in (0, 1):
        out += _dht(0, th, _DC_BITS, _DC_VALS)
        out += _dht(1, th, _AC_BITS, _AC_VALS)
    for cid, table, plane in ((1, 0x00, y), (2, 0x11, cb), (3, 0x11, cr)):
        out += _seg(0xDA, bytes([1, cid, table, 0, 63, 0]))
        bw = _BitWriter()
        pred = 0
        for by in range(2):
            for bx in range(2):
                pred = _encode_block(
                    bw,
                    _fdct_block(plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]),
                    pred,
                )
        out += bw.flush()
    out += b"\xff\xd9"
    w, h, rgb444 = decode_jpeg(bytes(out))
    assert (w, h) == (16, 16)
    # 4:4:4 has no chroma subsampling loss: decode matches source ±2
    assert int(np.abs(rgb444.astype(int) - rgb_src.astype(int)).max()) <= 2


def test_dc_predictor_runaway_raises_value_error():
    """A crafted DC-first scan accumulating max-category diffs must hit
    the predictor range guard (ValueError) long before pred<<Al could
    leave int32 — silent wraparound on numpy 1.x / uncaught
    OverflowError on 2.x were the failure modes (r10 review)."""
    from surge_spark.operators.jpeg import _BitReader, _dc_first, _HuffTable

    table = _HuffTable(_DC_BITS, _DC_VALS)
    bw = _BitWriter()
    for _ in range(32):  # 32 x +2047 diffs: pred passes 2^15 at the 17th
        ln, code = _DC_CODES[11]
        bw.write(code, ln)
        bw.write(2047, 11)
    # _BitReader takes an already-unstuffed segment (the encoder's
    # BitWriter stuffs FF00); undo it for this function-level test
    reader = _BitReader(bw.flush().replace(b"\xff\x00", b"\xff"))
    cb = np.zeros(64, np.int32)
    pred = 0
    with pytest.raises(ValueError, match="predictor"):
        for _ in range(32):
            pred = _dc_first(reader, table, cb, pred, 13)
