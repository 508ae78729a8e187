"""GIF decoder tests (operators/gif.py) — the test file carries its own
minimal GIF ENCODER (real greedy LZW with width growth and 4096-reset,
LSB-first bit packing, optional interlace), the same
own-encoder-roundtrip strategy as tests/test_jpeg.py. A hand-computed
golden byte stream pins the decoder against the spec independently of
the encoder, so a matching encoder/decoder bug pair cannot hide.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from surge_spark.operators.gif import _lzw_decode, decode_gif
from surge_spark.operators.multimodal import decode_image


# ---------------------------------------------------------------- encoder

class _BitWriter:
    """LSB-first bit packer (GIF's LZW bit order)."""

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def write(self, value: int, width: int) -> None:
        self.acc |= value << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Greedy GIF LZW: emit clear, longest-prefix codes, grow width when
    the next code to define crosses 2^width, reset the dictionary at
    4096 (so long streams exercise the decoder's clear handling)."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset()
    bw.write(clear, width)
    buf = b""
    for b in indices:
        cand = buf + bytes([b])
        if cand in table:
            buf = cand
            continue
        bw.write(table[buf], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder defines each entry one code LATER than the
            # encoder (its first post-clear read defines nothing), so the
            # encoder grows the width one definition later too: when
            # next_code EXCEEDS 2^width (the giflib rule), not when it
            # reaches it
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table, next_code, width = reset()
        buf = bytes([b])
    if buf:
        bw.write(table[buf], width)
    bw.write(end, width)
    return bw.flush()


def _interlace_rows(ih: int) -> list[int]:
    return (
        list(range(0, ih, 8))
        + list(range(4, ih, 8))
        + list(range(2, ih, 4))
        + list(range(1, ih, 2))
    )


def _encode_gif(
    idx: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    ih, iw = idx.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1)  # 2^(s+1) >= n
    ct = np.zeros((2 << size_field, 3), np.uint8)
    ct[:n] = palette
    min_code = max(2, (len(ct) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", iw, ih, 0x80 | size_field, 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, iw, ih, 0x40 if interlace else 0
    )
    rows = idx[_interlace_rows(ih)] if interlace else idx
    out.append(min_code)
    data = _lzw_encode(rows.tobytes(), min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# ------------------------------------------------------------------ tests

# hand-computed golden: 2x2, 4-color GCT (red, blue, black, white),
# pixels [[0,1],[1,0]], min code size 2. LZW codes: clear(4,3b) 0(3b)
# 1(3b) 1(3b) — table reaches 8 entries, width grows to 4 — 0(4b)
# end(5,4b). LSB-first packing gives bytes 44 02 05.
_GOLDEN = (
    b"GIF89a"
    + struct.pack("<HHBBB", 2, 2, 0x91, 0, 0)
    + bytes([255, 0, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255])
    + b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    + bytes([2])  # LZW min code size
    + bytes([3, 0x44, 0x02, 0x05, 0])  # one data sub-block + terminator
    + b"\x3b"
)


def test_golden_bytes_decode_exactly():
    w, h, img = decode_gif(_GOLDEN)
    assert (w, h) == (2, 2)
    expect = np.array(
        [[[255, 0, 0], [0, 0, 255]], [[0, 0, 255], [255, 0, 0]]], np.uint8
    )
    assert (img == expect).all()


def test_roundtrip_random_palette_images():
    rng = np.random.RandomState(7)
    for n_colors, shape in [(4, (5, 3)), (16, (11, 17)), (256, (23, 31))]:
        palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        idx = rng.randint(0, n_colors, shape).astype(np.uint8)
        w, h, img = decode_gif(_encode_gif(idx, palette))
        assert (w, h) == (shape[1], shape[0])
        assert (img == palette[idx]).all()


def test_roundtrip_exercises_width_growth_and_4096_reset():
    # a long low-entropy stream defines thousands of LZW entries: the
    # encoder crosses every width boundary and resets at 4096, so the
    # decoder's full dictionary lifecycle is exercised
    rng = np.random.RandomState(11)
    idx = np.repeat(rng.randint(0, 8, (90, 200)).astype(np.uint8), 2, axis=1)
    palette = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    payload = _encode_gif(idx, palette)
    w, h, img = decode_gif(payload)
    assert (w, h) == (400, 90)
    assert (img == palette[idx]).all()


def test_interlaced_equals_progressive_scan():
    rng = np.random.RandomState(13)
    idx = rng.randint(0, 4, (13, 7)).astype(np.uint8)
    palette = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8
    )
    _, _, plain = decode_gif(_encode_gif(idx, palette, interlace=False))
    _, _, laced = decode_gif(_encode_gif(idx, palette, interlace=True))
    assert (plain == laced).all()


def test_kwkwk_self_referencing_code():
    # 'aaaa' compresses to [clear, a, <next-to-define>, end] — the KwKwK
    # case where a code is used before its definition completes
    payload = _encode_gif(
        np.zeros((1, 4), np.uint8), np.array([[9, 9, 9]], np.uint8)
    )
    w, h, img = decode_gif(payload)
    assert (w, h) == (4, 1) and (img == 9).all()


def test_extensions_and_first_frame_only():
    # graphic-control + comment extensions precede the image block; a
    # second frame after it must be ignored
    rng = np.random.RandomState(17)
    idx = rng.randint(0, 4, (4, 4)).astype(np.uint8)
    palette = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    base = bytearray(_encode_gif(idx, palette))
    img_at = base.index(b"\x2c")
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"  # transparency flag set
    comment = b"\x21\xfe\x05hello\x00"
    frame2 = bytes(base[img_at:-1])  # second copy of the image block
    payload = bytes(base[:img_at]) + gce + comment + bytes(base[img_at:-1]) + frame2 + b"\x3b"
    w, h, img = decode_gif(payload)
    assert (w, h) == (4, 4)
    assert (img == palette[idx]).all()


def test_decode_image_dispatches_gif():
    w, h, img = decode_image(_GOLDEN)
    assert (w, h) == (2, 2) and img.shape == (2, 2, 3)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda p: p[: len(p) // 2],                      # truncated mid-stream
        lambda p: p[:10],                                # truncated header
        lambda p: p.replace(b"\x2c", b"\x7c", 1),        # unknown block tag
        lambda p: p[:6] + struct.pack("<HHBBB", 60000, 60000, 0, 0, 0),  # bomb
    ],
)
def test_corrupt_payloads_raise_value_error(mutate):
    rng = np.random.RandomState(19)
    idx = rng.randint(0, 4, (6, 6)).astype(np.uint8)
    palette = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    payload = mutate(_encode_gif(idx, palette))
    with pytest.raises(ValueError):
        decode_gif(payload)


def test_pixel_index_beyond_palette_rejected():
    # declare a 4-entry table but emit index 5: must refuse, not read
    # out of the palette
    idx = np.full((2, 2), 5, np.uint8)
    palette = np.zeros((4, 3), np.uint8)
    # hand-build: _encode_gif sizes the table from the palette, so the
    # LZW stream carries an index past it
    ih, iw = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", iw, ih, 0x81, 0, 0)  # 4-entry GCT
    out += palette.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, iw, ih, 0)
    # LZW min code 3 (roots 0..7) so index 5 is encodable even though the
    # declared color table only has 4 entries — exactly the mismatch the
    # decoder must catch
    out.append(3)
    data = _lzw_encode(idx.tobytes(), 3)
    out.append(len(data))
    out += data + b"\x00\x3b"
    with pytest.raises(ValueError):
        decode_gif(bytes(out))


def test_lzw_code_beyond_dictionary_rejected():
    # code 60 with an empty dictionary (min_code_size=5 -> only roots
    # 0..31 valid; 60 > next-to-define 34)
    bw = _BitWriter()
    bw.write(32, 6)  # clear
    bw.write(60, 6)
    with pytest.raises(ValueError):
        _lzw_decode(bw.flush(), 5, 100)


def test_gif_through_extract_features(spark):
    """A real GIF payload flows through the mapInPandas feature extractor
    with true dimensions and pixel statistics (not the fake decoder's)."""
    import pandas as pd

    from surge_spark.operators.multimodal import extract_features

    idx = np.zeros((6, 8), np.uint8)  # all palette entry 0 = (128,128,128)
    palette = np.array([[128, 128, 128], [0, 0, 0]], np.uint8)
    payload = _encode_gif(idx, palette)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [payload], "mime": ["image/gif"]})
    )
    row = extract_features(df).collect()[0]
    assert (row.width, row.height) == (8, 6)
    assert abs(row.feat[3] - 128 / 255.0) < 1e-6
