"""Multimodal plumbing: binary payload wrapping, feature extraction, resize
metadata math, and the video frame fan-out contract (all over the
deterministic fake decoder — see operators.multimodal)."""

from __future__ import annotations

import pytest

import pandas as pd
from pyspark.sql import functions as F

from surge_spark.operators import multimodal as mm


def _payloads(spark, texts):
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(texts)), "text": texts})
    )
    return mm.to_binary_payload(df, "id", "text", mime="x/fake")


def test_extract_features_one_row_per_input(spark):
    out = mm.extract_features(_payloads(spark, ["abc", "defgh", ""])).toPandas()
    assert len(out) == 3
    assert set(out.columns) == {"id", "mime", "n_bytes", "width", "height", "feat"}
    assert sorted(out.n_bytes) == [0, 3, 5]
    assert all(len(f) == 8 for f in out.feat)


def test_resize_preserves_aspect_and_never_upscales(spark):
    # fake dims: width = 16 + n%64, height = 16 + (n//64)%64
    big = "x" * 50  # 66 x 16 — longer side over the cap
    small = "y" * 10  # 26 x 16 — under the cap
    out = (
        mm.resize_images(_payloads(spark, [big, small]), max_side=58)
        .toPandas()
        .set_index("id")
    )
    b = out.loc[0]
    assert (b.orig_width, b.orig_height) == (66, 16)
    scale = min(1.0, 58 / 66)
    assert (b.width, b.height) == (max(1, int(66 * scale)), max(1, int(16 * scale)))
    assert b.width <= 58 and b.height <= 58
    s = out.loc[1]
    assert (s.width, s.height) == (26, 16)  # under the cap: untouched
    assert bytes(b.payload) == big.encode()  # payload passes through opaque


def test_frame_sample_fan_out(spark):
    # 2500-byte payload = 2500 ms → frames at 0/1000/2000
    vid = "v" * 2500
    out = (
        mm.sample_frames(_payloads(spark, [vid]), every_ms=1000)
        .orderBy("frame_index")
        .toPandas()
    )
    assert list(out.frame_index) == [0, 1, 2]
    assert list(out.ts_ms) == [0, 1000, 2000]
    assert all(len(bytes(f)) == 16 for f in out.frame)
    # each frame is the deterministic slice at its timestamp
    assert bytes(out.frame[1]) == vid.encode()[1000:1016]
    # empty payload still yields exactly one (empty) frame row
    empty = mm.sample_frames(_payloads(spark, [""]), every_ms=1000).toPandas()
    assert len(empty) == 1 and len(bytes(empty.frame[0])) == 0


def test_downstream_plan_prunes_binary_after_extract(spark):
    """The point of the metadata/payload split: analytics over features must
    not drag the binary through the plan — extract's output schema simply
    has no payload column."""
    out = mm.extract_features(_payloads(spark, ["abc"] * 10))
    assert "payload" not in out.columns
    agg = out.groupBy("mime").agg(F.avg("n_bytes").alias("avg_bytes"))
    assert agg.collect()[0].avg_bytes == 3.0


def _make_bmp(width, height, rgb_rows):
    """Construct a real 24-bit uncompressed BMP (bottom-up) via struct."""
    import struct

    row_size = (width * 3 + 3) & ~3
    pixel_data = b""
    for row in reversed(rgb_rows):  # BMP stores rows bottom-up
        packed = b"".join(bytes((b, g, r)) for (r, g, b) in row)  # BGR on disk
        pixel_data += packed + b"\x00" * (row_size - len(packed))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixel_data), 2835, 2835, 0, 0)
    return header + dib + pixel_data


def _make_wav(sample_rate=8000, freq_cycle=8, n_frames=800):
    """Construct a real 16-bit mono WAV (square wave) via the wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = b"".join(
            (16000 if (i // freq_cycle) % 2 == 0 else -16000).to_bytes(
                2, "little", signed=True
            )
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_real_bmp_decode_end_to_end(spark):
    """VERDICT r4 #4: a REAL constructed BMP flows through extract_features
    with true dimensions and pixel statistics — not the fake decoder."""
    # 3x2 image: top row pure red/green/blue, bottom row black/gray/white
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(0, 0, 0), (128, 128, 128), (255, 255, 255)],
    ]
    bmp = _make_bmp(3, 2, rows)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [bmp], "mime": ["image/bmp"]})
    )
    out = mm.extract_features(df).toPandas().iloc[0]
    assert (out.width, out.height) == (3, 2)
    feat = list(out.feat)
    # channel means over the 6 known pixels
    exp_r = (255 + 0 + 0 + 0 + 128 + 255) / 6 / 255
    exp_g = (0 + 255 + 0 + 0 + 128 + 255) / 6 / 255
    exp_b = (0 + 0 + 255 + 0 + 128 + 255) / 6 / 255
    assert abs(feat[0] - exp_r) < 1e-6
    assert abs(feat[1] - exp_g) < 1e-6
    assert abs(feat[2] - exp_b) < 1e-6
    assert feat[4] == 0.0 and feat[5] == 1.0  # min black, max white


def test_real_ppm_decode_matches_bmp(spark):
    """The same pixels as P6 PPM decode to identical features."""
    ppm = b"P6\n# comment\n3 2\n255\n" + bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 128, 128, 128, 255, 255, 255]
    )
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(0, 0, 0), (128, 128, 128), (255, 255, 255)],
    ]
    bmp = _make_bmp(3, 2, rows)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1, 2], "payload": [ppm, bmp],
             "mime": ["image/x-portable-pixmap", "image/bmp"]}
        )
    )
    out = mm.extract_features(df).toPandas().set_index("id")
    assert list(out.loc[1].feat) == list(out.loc[2].feat)
    assert (out.loc[1].width, out.loc[1].height) == (3, 2)


def test_real_wav_decode_end_to_end(spark):
    """A REAL wave-module WAV flows through extract_audio_features with
    true rate/frames/duration and sane signal stats."""
    wav = _make_wav(sample_rate=8000, freq_cycle=8, n_frames=800)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [7], "payload": [wav], "mime": ["audio/wav"]})
    )
    out = mm.extract_audio_features(df).toPandas().iloc[0]
    assert out.n_channels == 1
    assert out.sample_rate == 8000
    assert out.n_frames == 800
    assert out.duration_ms == 100
    rms, mean, peak, zcr = out.feat
    assert abs(rms - 16000 / 32768) < 1e-6  # constant-amplitude square wave
    assert abs(mean) < 1e-6  # symmetric
    assert abs(peak - 16000 / 32768) < 1e-6
    assert abs(zcr - (99 / 799)) < 1e-3  # one crossing per 8 samples


def test_non_stdlib_format_falls_back_to_fake(spark):
    """A payload no stdlib path can decode must not crash extract — it
    routes through the fake decoder (and decode_image's gate raises for it
    directly, documenting the env limit). A corrupt PNG (signature but no
    chunks) likewise falls back rather than poisoning the batch."""
    import pytest

    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 36
    corrupt_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 32
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2],
                "payload": [jpeg_ish, corrupt_png],
                "mime": ["image/jpeg", "image/png"],
            }
        )
    )
    out = mm.extract_features(df).toPandas().sort_values("id")
    assert list(out.n_bytes) == [40, 40]  # fake path ran for both
    # since r10's real baseline decoder, a structurally invalid JPEG is a
    # ValueError (corrupt stream) — the NotImplementedError codec gate now
    # applies to the genuinely unimplemented frames (progressive etc.)
    with pytest.raises(ValueError):
        mm.decode_image(jpeg_ish)
    with pytest.raises(ValueError):
        mm.decode_image(corrupt_png)  # structurally invalid PNG


def test_ppm_crlf_header_decodes_identically(spark):
    """A CRLF-written P6 header (Windows tools) must not shift the pixel
    stream by one byte — the \\r\\n pair after maxval is the separator."""
    pixels = bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 128, 128, 128, 255, 255, 255]
    )
    unix = b"P6\n3 2\n255\n" + pixels
    crlf = b"P6\r\n3 2\r\n255\r\n" + pixels
    df = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1, 2], "payload": [unix, crlf],
             "mime": ["image/x-portable-pixmap"] * 2}
        )
    )
    out = mm.extract_features(df).toPandas().set_index("id")
    assert list(out.loc[1].feat) == list(out.loc[2].feat)
    assert out.loc[2].feat[4] == 0.0 and out.loc[2].feat[5] == 1.0


def test_ppm_lone_cr_with_0x0a_first_pixel(spark):
    """Spec-legal file: lone \\r separator, first raster byte 0x0A — the
    CRLF heuristic must NOT eat the pixel (remaining length fits exactly)."""
    pixels = bytes([10, 20, 30, 40, 50, 60])  # 2x1, first byte 0x0A
    ppm = b"P6\n2 1\n255\r" + pixels
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [ppm], "mime": ["image/x-portable-pixmap"]})
    )
    out = mm.extract_features(df).toPandas().iloc[0]
    assert (out.width, out.height) == (2, 1)
    assert abs(out.feat[0] - (10 + 40) / 2 / 255) < 1e-6  # R channel intact


def _make_png(width, height, pixels, color_type=2, filters=None):
    """Hand-build a PNG: signature + IHDR + one IDAT (zlib of filtered
    scanlines) + IEND, with a chosen filter byte per row. ``pixels`` is an
    HxWxC uint8 array; filtering applies the SPEC's forward transform so
    the decoder must invert it."""
    import struct
    import zlib

    import numpy as np

    ch = {0: 1, 2: 3, 6: 4}[color_type]
    px = np.asarray(pixels, dtype=np.uint8).reshape(height, width, ch)
    filters = filters or [0] * height
    raw = bytearray()
    prev = np.zeros(width * ch, dtype=np.int32)
    for y in range(height):
        row = px[y].reshape(-1).astype(np.int32)
        f = filters[y]
        enc = np.zeros(width * ch, dtype=np.int32)
        for i in range(width * ch):
            a = int(row[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if f == 0:
                enc[i] = row[i]
            elif f == 1:
                enc[i] = row[i] - a
            elif f == 2:
                enc[i] = row[i] - b
            elif f == 3:
                enc[i] = row[i] - ((a + b) >> 1)
            else:  # paeth
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = row[i] - pred
        raw.append(f)
        raw += bytes((enc & 0xFF).astype(np.uint8))
        prev = row

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_all_filter_types():
    """Known pixels survive a PNG round-trip through every filter type
    (None/Sub/Up/Average/Paeth, one per row) — the constructed-bytes pin
    for the stdlib zlib+struct decode path."""
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = _make_png(4, 5, px, color_type=2, filters=[0, 1, 2, 3, 4])
    w, h, img = decode_image(png)
    assert (w, h) == (4, 5)
    assert (img == px).all()


def test_png_rgba_and_grey_decode():
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rgba = np.zeros((2, 2, 4), dtype=np.uint8)
    rgba[..., 0] = 10
    rgba[..., 1] = 20
    rgba[..., 2] = 30
    rgba[..., 3] = 255
    w, h, img = decode_image(_make_png(2, 2, rgba, color_type=6, filters=[4, 1]))
    assert (w, h) == (2, 2)
    assert (img == np.broadcast_to([10, 20, 30], (2, 2, 3))).all()

    grey = np.arange(6, dtype=np.uint8).reshape(2, 3, 1) * 40
    w, h, img = decode_image(_make_png(3, 2, grey, color_type=0, filters=[2, 3]))
    assert (w, h) == (3, 2)
    assert (img == np.repeat(grey, 3, axis=2)).all()


def test_png_through_extract_features(spark):
    """A real PNG payload flows through the mapInPandas feature extractor
    with true dimensions (not the fake decoder's)."""
    import numpy as np
    import pandas as pd

    from surge_spark.operators.multimodal import extract_features

    px = np.full((6, 8, 3), 128, dtype=np.uint8)
    png = _make_png(8, 6, px, filters=[0, 1, 2, 3, 4, 0])
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [png], "mime": ["image/png"]})
    )
    row = extract_features(df).collect()[0]
    assert (row.width, row.height) == (8, 6)
    assert abs(row.feat[3] - 128 / 255.0) < 1e-6


def _png_chunk(ctype, data):
    import struct as _s
    import zlib as _z

    return (
        _s.pack(">I", len(data))
        + ctype
        + data
        + _s.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_pack_row(samples_row, bit_depth):
    """One scanline's samples -> raw bytes (bit-packed / BE-16 / bytes)."""
    import numpy as np

    if bit_depth < 8:
        bits = (
            (samples_row[:, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
        ).reshape(-1)
        return np.packbits(bits.astype(np.uint8)).tobytes()
    if bit_depth == 16:
        return samples_row.astype(">u2").tobytes()
    return samples_row.astype(np.uint8).tobytes()


def _png_filter_rows(rows_bytes, bpp, filters):
    """Apply the spec's FORWARD filter transform (the decoder inverts)."""
    import numpy as np

    out = bytearray()
    prev = np.zeros(len(rows_bytes[0]), np.int32)
    for y, rb in enumerate(rows_bytes):
        row = np.frombuffer(rb, np.uint8).astype(np.int32)
        f = filters[y]
        enc = np.zeros(len(row), np.int32)
        for i in range(len(row)):
            a = int(row[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            if f == 0:
                enc[i] = row[i]
            elif f == 1:
                enc[i] = row[i] - a
            elif f == 2:
                enc[i] = row[i] - b
            elif f == 3:
                enc[i] = row[i] - ((a + b) >> 1)
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = row[i] - pred
        out.append(f)
        out += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = row
    return bytes(out)


_ADAM7_T = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _make_png_v2(
    samples, bit_depth, color_type, palette=None, interlace=0, filters=None
):
    """General PNG builder: ``samples`` is (h, w, ch) ints (indices for
    palette type); supports sub-byte/8/16 depths, PLTE, Adam7, per-row
    filter choice (non-interlaced only)."""
    import struct as _s
    import zlib as _z

    import numpy as np

    samples = np.asarray(samples)
    h, w, ch = samples.shape
    bpp = max(1, bit_depth * ch // 8)

    def pass_bytes(sub, fl):
        rows = [_png_pack_row(sub[y].reshape(-1), bit_depth) for y in range(len(sub))]
        return _png_filter_rows(rows, bpp, fl)

    if interlace:
        raw = b""
        for x0, y0, dx, dy in _ADAM7_T:
            sub = samples[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            raw += pass_bytes(sub, [0] * len(sub))
    else:
        raw = pass_bytes(samples, filters or [0] * h)
    ihdr = _s.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    out += _png_chunk(b"IDAT", _z.compress(raw)) + _png_chunk(b"IEND", b"")
    return out


def test_png_palette_subbyte_decode():
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(37)
    palette = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (5, 9))  # 4-bit indices, odd width
    payload = _make_png_v2(idx[..., None], 4, 3, palette=palette)
    w, h, img = decode_image(payload)
    assert (w, h) == (9, 5)
    assert (img == palette[idx]).all()


def test_png_grey_2bit_scaled_to_full_range():
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    g = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]])
    payload = _make_png_v2(g[..., None], 2, 0)
    _, _, img = decode_image(payload)
    assert (img[..., 0] == g * 85).all()
    assert (img[..., 0] == img[..., 1]).all()


def test_png_16bit_rgb_sub_filter_high_byte():
    """16-bit RGB with the Sub filter: pins the bpp=6 filter distance
    (a wrong distance scrambles every pixel after the first)."""
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(41)
    px16 = rng.randint(0, 65536, (4, 7, 3))
    payload = _make_png_v2(px16, 16, 2, filters=[1, 4, 3, 2])
    w, h, img = decode_image(payload)
    assert (w, h) == (7, 4)
    assert (img == (px16 >> 8).astype(np.uint8)).all()


def test_png_grey_alpha_drops_alpha():
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    ga = np.stack(
        [np.arange(12).reshape(3, 4) * 20, np.full((3, 4), 7)], axis=-1
    )
    payload = _make_png_v2(ga, 8, 4)
    _, _, img = decode_image(payload)
    assert (img[..., 0] == ga[..., 0]).all()
    assert (img[..., 2] == ga[..., 0]).all()


def test_png_adam7_equals_progressive_scan():
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(43)
    px = rng.randint(0, 256, (5, 9, 3))  # odd dims: partial passes
    _, _, plain = decode_image(_make_png_v2(px, 8, 2, interlace=0))
    _, _, laced = decode_image(_make_png_v2(px, 8, 2, interlace=1))
    assert (plain == laced).all()
    # interlaced sub-byte palette too: pass strides are per-pass bit-packed
    palette = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, (6, 11))
    _, _, got = decode_image(
        _make_png_v2(idx[..., None], 2, 3, palette=palette, interlace=1)
    )
    assert (got == palette[idx]).all()


def test_png_illegal_combo_and_bad_palette_raise():
    import numpy as np
    import pytest

    from surge_spark.operators.multimodal import decode_image

    # depth 2 with RGB is spec-illegal
    with pytest.raises(ValueError):
        decode_image(_make_png_v2(np.zeros((2, 2, 3), int), 2, 2))
    # palette index beyond PLTE
    payload = _make_png_v2(
        np.full((2, 2, 1), 3, int), 2, 3, palette=np.zeros((2, 3), np.uint8)
    )
    with pytest.raises(ValueError):
        decode_image(payload)


def test_resize_real_roundtrip_known_pixels(spark):
    """A real decodable payload (PNG) resizes through the true pixel path:
    output is a P6 PPM whose pixels are the nearest-neighbor decimation of
    the source, re-decodable by decode_image."""
    import numpy as np
    import pandas as pd

    from surge_spark.operators.multimodal import decode_image, resize_images

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:4, :, 0] = 200  # top half red-ish
    px[4:, :, 2] = 150  # bottom half blue-ish
    png = _make_png(8, 8, px, filters=[0, 1, 2, 3, 4, 0, 1, 2])
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [png], "mime": ["image/png"]})
    )
    row = resize_images(df, max_side=4).collect()[0]
    assert (row.width, row.height) == (4, 4)
    assert (row.orig_width, row.orig_height) == (8, 8)
    assert row.mime == "image/x-portable-pixmap"
    w, h, out = decode_image(bytes(row.payload))
    assert (w, h) == (4, 4)
    # nearest-neighbor of the half-split image keeps the halves
    assert (out[:2, :, 0] == 200).all() and (out[2:, :, 2] == 150).all()
    # undecodable payload still passes through with fake dims
    jpeg_ish = b"\xff\xd8\xff\xe0" + b"\x00" * 20
    df2 = spark.createDataFrame(
        pd.DataFrame({"id": [2], "payload": [jpeg_ish], "mime": ["image/jpeg"]})
    )
    row2 = resize_images(df2, max_side=4).collect()[0]
    assert bytes(row2.payload) == jpeg_ish
    assert row2.mime == "image/jpeg"


def test_zero_dimension_headers_route_to_fallback(spark):
    """r6 ADVICE fix: a malformed-but-parseable header declaring width or
    height 0 must raise ValueError from the decoder (routing through the
    fake-decode fallback) — not ZeroDivisionError out of resize_images'
    max_side / max(ow, oh)."""
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from surge_spark.operators.multimodal import (
        decode_image,
        resize_images,
        to_binary_payload,
    )

    zero_png = _make_png(0, 0, np.zeros((0, 0, 3), dtype=np.uint8), filters=[])
    zero_ppm = b"P6\n0 5\n255\n"
    # 24-bit BMP with width 0 (plausible 54-byte header, no pixel data)
    zero_bmp = (
        b"BM" + _struct.pack("<IHHI", 54, 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, 0, 5, 1, 24, 0, 0, 0, 0, 0, 0)
    )
    for payload in (zero_png, zero_ppm, zero_bmp):
        with _pytest.raises(ValueError):
            decode_image(payload)

    # through the pipeline: the row survives via the fake fallback
    rows = spark.createDataFrame(
        [(1, zero_png.decode("latin-1")), (2, zero_ppm.decode("latin-1")),
         (3, zero_bmp.decode("latin-1"))],
        "id long, content string",
    )
    # to_binary_payload utf-8-encodes, so bytes differ from the originals —
    # irrelevant here: any undecodable payload must pass through opaque
    bin_df = to_binary_payload(rows, "id", "content", mime="image/bad")
    out = resize_images(bin_df, max_side=64).collect()
    assert len(out) == 3  # no task death, 1:1 row contract held


# -- real ISO-BMFF demux (operators/mp4.py) -----------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    import struct as _s

    return _s.pack(">I", len(body) + 8) + fourcc + body


def _full(fourcc: bytes, body: bytes, version=0, flags=0) -> bytes:
    import struct as _s

    return _box(fourcc, _s.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def _make_mp4(
    frames: list[bytes], timescale=1000, delta=500, syncs=(1,), codec=b"avc1"
):
    """Minimal unfragmented MP4: one video track, one chunk holding every
    sample back-to-back in mdat, 2 fps at the default delta."""
    import struct as _s

    n = len(frames)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_payload = b"".join(frames)
    # moov is assembled twice: first pass with offset 0 to learn its size,
    # then with the real mdat payload offset
    def moov_bytes(chunk_off: int) -> bytes:
        stsd = _full(b"stsd", _s.pack(">I", 1) + _box(codec, b"\x00" * 78))
        stts = _full(b"stts", _s.pack(">III", 1, n, delta))
        stss = _full(
            b"stss", _s.pack(">I", len(syncs)) + b"".join(_s.pack(">I", s) for s in syncs)
        )
        stsc = _full(b"stsc", _s.pack(">IIII", 1, 1, n, 1))
        stsz = _full(
            b"stsz",
            _s.pack(">II", 0, n) + b"".join(_s.pack(">I", len(f)) for f in frames),
        )
        stco = _full(b"stco", _s.pack(">II", 1, chunk_off))
        stbl = _box(b"stbl", stsd + stts + stss + stsc + stsz + stco)
        minf = _box(b"minf", stbl)
        hdlr = _full(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 12)
        mdhd = _full(
            b"mdhd", _s.pack(">IIIIHH", 0, 0, timescale, n * delta, 0x55C4, 0)
        )
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", mdia)
        return _box(b"moov", trak)

    moov_size = len(moov_bytes(0))
    chunk_off = len(ftyp) + moov_size + 8  # mdat body start
    moov = moov_bytes(chunk_off)
    mdat = _box(b"mdat", mdat_payload)
    return ftyp + moov + mdat


def test_mp4_demux_sample_table():
    from surge_spark.operators.mp4 import parse_mp4

    frames = [b"FRAME-%02d-" % i + bytes([i]) * (10 + i) for i in range(4)]
    payload = _make_mp4(frames, timescale=1000, delta=500, syncs=(1, 3))
    info = parse_mp4(payload)
    assert info["codec"] == "avc1"
    assert info["timescale"] == 1000
    assert info["duration_ms"] == 2000.0
    assert len(info["samples"]) == 4
    for i, (off, size, ts_ms, is_sync) in enumerate(info["samples"]):
        assert payload[off : off + size] == frames[i], i  # TRUE byte ranges
        assert ts_ms == i * 500.0
        assert is_sync == (i + 1 in (1, 3))


def test_mp4_demux_rejects_fragmented_and_corrupt():
    import pytest as _pytest

    from surge_spark.operators.mp4 import parse_mp4

    frames = [b"x" * 8]
    good = _make_mp4(frames)
    with _pytest.raises(NotImplementedError, match="fragmented"):
        parse_mp4(good + _box(b"moof", b""))
    with _pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08ftyp")  # no moov
    with _pytest.raises(ValueError):
        parse_mp4(b"not an mp4 at all......")


def test_sample_frames_real_mp4_demux(spark):
    """An MP4 payload through sample_frames yields the TRUE coded sample
    bytes at each grid timestamp (2 fps content sampled at 1 fps picks
    every second frame); non-MP4 payloads keep the fake-slice path in the
    same batch."""
    frames = [b"FRM%d" % i + bytes(range(16)) for i in range(4)]
    mp4 = _make_mp4(frames, timescale=1000, delta=500)  # 2 fps, 2 s total
    fake = b"A" * 2500  # fake path: 2.5 s, 16-byte slices
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2],
                "payload": [bytearray(mp4), bytearray(fake)],
                "mime": ["video/mp4", "video/fake"],
            }
        )
    )
    out = mm.sample_frames(df, every_ms=1000).toPandas()
    real = out[out.id == 1].sort_values("frame_index")
    assert list(real.ts_ms) == [0, 1000]
    # ts=0 -> sample 0; ts=1000 -> the last sample at-or-before 1000 ms = #2
    assert bytes(real.iloc[0].frame) == frames[0]
    assert bytes(real.iloc[1].frame) == frames[2]
    fake_rows = out[out.id == 2]
    assert len(fake_rows) == 3  # 0/1000/2000 ms from the fake duration
    assert all(len(bytes(f)) == 16 for f in fake_rows.frame)


def test_mp4_bomb_counts_rejected_and_routed_to_fake(spark):
    """Untrusted 32-bit sample counts must not allocate: an stts run
    declaring 2^31 samples in a 200-byte payload raises ValueError in the
    parser, and sample_frames routes the payload to the fake path instead
    of dying."""
    import struct as _s

    import pytest as _pytest

    from surge_spark.operators.mp4 import parse_mp4

    frames = [b"x" * 8, b"y" * 8]
    good = bytearray(_make_mp4(frames))
    # corrupt the stts run count to 2^31
    stts_at = bytes(good).index(b"stts")
    # stts body: ver/flags(+4), entry_count(+8), first run count(+12)
    good[stts_at + 12 : stts_at + 16] = _s.pack(">I", 2**31)
    bomb = bytes(good)
    with _pytest.raises(ValueError, match="implausible"):
        parse_mp4(bomb)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"id": [1], "payload": [bytearray(bomb)], "mime": ["video/mp4"]}
        )
    )
    out = mm.sample_frames(df, every_ms=1000).toPandas()
    assert len(out) >= 1  # fake path ran; task did not die
    assert all(len(bytes(f)) <= 16 for f in out.frame)


def test_mp4_absurd_duration_bounded_fan_out(spark):
    """A parseable header with timescale 1 (duration seconds become
    milliseconds x1000) must not fan out unboundedly: the grid is capped
    relative to the real sample count."""
    frames = [b"a" * 8, b"b" * 8]
    mp4 = _make_mp4(frames, timescale=1, delta=3600)  # claims ~2h video
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [bytearray(mp4)], "mime": ["video/mp4"]})
    )
    out = mm.sample_frames(df, every_ms=1000).toPandas()
    assert 1 <= len(out) <= 8 * len(frames) + 64


def test_mjpeg_video_real_pixel_decode(spark):
    """REAL video pixel decode end to end: an unfragmented MP4 whose
    track is MJPEG (stsd fourcc 'jpeg', every sample a standalone
    baseline JPEG) flows demux -> frame sampling -> JPEG decode -> pixel
    features with true dimensions and per-frame means. Frame 0 is dark
    (mean 40), frame 1 bright (mean 200) — the features must track the
    actual pixels of the RIGHT frame at each grid point."""
    import numpy as np

    from test_jpeg import _encode_gray  # pytest puts tests/ on sys.path

    from surge_spark.operators.multimodal import extract_frame_features

    dark = _encode_gray(np.full((16, 24), 40, np.uint8))
    bright = _encode_gray(np.full((16, 24), 200, np.uint8))
    payload = _make_mp4(
        [dark, bright], timescale=1000, delta=500, codec=b"jpeg"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"id": [7], "payload": [payload], "mime": ["video/mp4"]})
    )
    rows = sorted(
        extract_frame_features(df, every_ms=500).collect(),
        key=lambda r: r.frame_index,
    )
    assert len(rows) == 2
    for r, expect_mean in zip(rows, (40 / 255.0, 200 / 255.0)):
        assert (r.width, r.height) == (24, 16)
        assert abs(r.feat[3] - expect_mean) < 2 / 255.0, (r.frame_index, r.feat)
    assert rows[0].ts_ms == 0 and rows[1].ts_ms == 500


def test_frame_features_entropy_codec_falls_back(spark):
    """An avc1 (H.264) track's samples are not standalone images: the
    decode stage must route every frame to the deterministic fake
    features, never die."""
    from surge_spark.operators.multimodal import extract_frame_features

    payload = _make_mp4([b"\x00\x00\x01A" * 10], codec=b"avc1")
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "payload": [payload], "mime": ["video/mp4"]})
    )
    rows = extract_frame_features(df, every_ms=500).collect()
    assert rows and all(r.width > 0 and len(r.feat) == 8 for r in rows)


def test_bmp_32bit_and_8bit_palette_decode():
    import struct as _s

    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(47)
    px = rng.randint(0, 256, (3, 5, 3)).astype(np.uint8)
    # 32-bit BGRA, bottom-up
    rows32 = b""
    for row in px[::-1]:
        rows32 += b"".join(bytes((b, g, r, 0xAA)) for r, g, b in row)
    hdr = _s.pack("<2sIHHI", b"BM", 54 + len(rows32), 0, 0, 54)
    dib = _s.pack("<IiiHHIIiiII", 40, 5, 3, 1, 32, 0, len(rows32), 0, 0, 0, 0)
    w, h, img = decode_image(hdr + dib + rows32)
    assert (w, h) == (5, 3) and (img == px).all()

    # 8-bit paletted, 16-entry table, width 5 needs row padding to 8
    palette = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (3, 5)).astype(np.uint8)
    table = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
    pixel_off = 54 + len(table)
    rows8 = b""
    for row in idx[::-1]:
        rows8 += row.tobytes() + b"\x00" * 3  # pad 5 -> 8
    hdr = _s.pack("<2sIHHI", b"BM", pixel_off + len(rows8), 0, 0, pixel_off)
    dib = _s.pack("<IiiHHIIiiII", 40, 5, 3, 1, 8, 0, len(rows8), 0, 0, 16, 0)
    w, h, img = decode_image(hdr + dib + table + rows8)
    assert (w, h) == (5, 3) and (img == palette[idx]).all()


def test_ppm_wide_maxval_and_scaling():
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(53)
    # 16-bit samples at maxval 65535: output is round(v*255/65535)
    v16 = rng.randint(0, 65536, (2, 3, 3))
    payload = b"P6\n3 2\n65535\n" + v16.astype(">u2").tobytes()
    w, h, img = decode_image(payload)
    assert (w, h) == (3, 2)
    assert (img == np.round(v16 * 255.0 / 65535).astype(np.uint8)).all()
    # single-byte low maxval scales too (spec: samples are 0..maxval)
    v4 = rng.randint(0, 16, (2, 2, 3))
    payload = b"P6\n2 2\n15\n" + v4.astype(np.uint8).tobytes()
    _, _, img = decode_image(payload)
    assert (img == np.round(v4 * 17.0).astype(np.uint8)).all()


@pytest.mark.slow  # r16 fast-tier split (>10 s; see pytest.ini)
def test_png_zlib_bomb_bounded_and_serial_budget():
    """Two decode-bomb guards (r10 review): (a) the inflate is bounded by
    the header-derived raw size, so a 1x1-declared payload carrying a
    huge zlib stream cannot allocate past it; (b) a tiny payload
    declaring a big raster of Paeth rows hits the serial-work budget as
    ValueError instead of pinning a core for minutes."""
    import time
    import zlib as _z

    import numpy as np
    import pytest

    from surge_spark.operators.multimodal import decode_image

    # (a) 1x1 grey PNG whose IDAT inflates to ~64 MB of zeros
    import struct as _s
    ihdr = _s.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"\x00" * 64_000_000))
        + _png_chunk(b"IEND", b"")
    )
    t0 = time.time()
    w, h, img = decode_image(bomb)  # bounded: only the 2 needed bytes inflate
    assert (w, h) == (1, 1) and time.time() - t0 < 5

    # (b) 4000x2000 grey, every row Paeth — 8M serial bytes > the 4M budget
    ihdr = _s.pack(">IIBBBBB", 4000, 2000, 8, 0, 0, 0, 0)
    raw = (b"\x04" + b"\x00" * 4000) * 2000
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    t0 = time.time()
    with pytest.raises(ValueError, match="budget"):
        decode_image(payload)
    assert time.time() - t0 < 60


def test_png_sub_filter_vectorized_exact():
    """The Sub filter's lane-cumsum vectorization must be bit-exact
    against the spec's serial definition, incl. mod-256 wraparound."""
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(59)
    px = rng.randint(0, 256, (6, 7, 3))
    payload = _make_png_v2(px, 8, 2, filters=[1] * 6)
    _, _, img = decode_image(payload)
    assert (img == px).all()


def test_ppm_sample_beyond_maxval_rejected():
    import pytest

    from surge_spark.operators.multimodal import decode_image

    payload = b"P6\n2 1\n15\n" + bytes([255, 3, 3, 3, 3, 3])
    with pytest.raises(ValueError, match="maxval"):
        decode_image(payload)


def _make_tiff(px, byte_order="<", packbits=False, photometric=None,
               rows_per_strip=None):
    """Minimal strip-organized TIFF writer (both byte orders, optional
    PackBits) for decoder tests. ``px`` is (h, w) grey or (h, w, 3)."""
    import struct as _s

    import numpy as np

    px = np.asarray(px, np.uint8)
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    if photometric is None:
        photometric = 1 if spp == 1 else 2
    rps = rows_per_strip or h
    o = byte_order

    def pack_strip(rows):
        raw = rows.tobytes()
        if not packbits:
            return raw
        # literal-run-only PackBits (valid, if inefficient): chunks of
        # <=128 literal bytes prefixed by n-1
        out = bytearray()
        for i in range(0, len(raw), 128):
            chunk = raw[i : i + 128]
            out.append(len(chunk) - 1)
            out += chunk
        return bytes(out)

    strips = [
        pack_strip(px[y : y + rps]) for y in range(0, h, rps)
    ]
    n_strips = len(strips)
    # layout: header(8) + IFD + strip offset/count arrays + bits array + data
    tags = []  # (tag, type, count, value_or_offset_placeholder)
    ifd_off = 8
    n_tags = 9
    arrays_off = ifd_off + 2 + 12 * n_tags + 4

    def arr(fmt, values):
        nonlocal arrays_off
        off = arrays_off
        blob = _s.pack(o + fmt * len(values), *values)
        arrays_off += len(blob)
        array_blobs.append(blob)
        return off

    array_blobs = []
    # reserve space for: strip offsets (I*n), strip counts (I*n), bits (H*spp)
    strip_off_pos = arrays_off
    arrays_off += 4 * n_strips
    strip_cnt_pos = arrays_off
    arrays_off += 4 * n_strips
    bits_pos = arrays_off
    arrays_off += 2 * spp if spp > 1 else 0
    data_off = arrays_off
    offsets = []
    counts = []
    pos = data_off
    for sdata in strips:
        offsets.append(pos)
        counts.append(len(sdata))
        pos += len(sdata)

    def entry(tag, typ, count, value):
        # inline values are LEFT-justified in the 4-byte field (TIFF §2):
        # a big-endian SHORT packed as ">I" would land in the wrong half
        if typ == 3 and count == 1:
            val = _s.pack(o + "HH", value, 0)
        else:
            val = _s.pack(o + "I", value)
        return _s.pack(o + "HHI", tag, typ, count) + val

    bits_value = 8 if spp == 1 else bits_pos
    entries = (
        entry(256, 4, 1, w)
        + entry(257, 4, 1, h)
        + entry(258, 3, spp, bits_value if spp > 1 else (8))
        + entry(259, 3, 1, 32773 if packbits else 1)
        + entry(262, 3, 1, photometric)
        + entry(273, 4, n_strips, offsets[0] if n_strips == 1 else strip_off_pos)
        + entry(277, 3, 1, spp)
        + entry(278, 4, 1, rps)
        + entry(279, 4, n_strips, counts[0] if n_strips == 1 else strip_cnt_pos)
    )
    out = bytearray()
    out += (b"II*\x00" if o == "<" else b"MM\x00*")
    out += _s.pack(o + "I", 8)
    out += _s.pack(o + "H", n_tags) + entries + _s.pack(o + "I", 0)
    out += _s.pack(o + "I" * n_strips, *offsets)
    out += _s.pack(o + "I" * n_strips, *counts)
    if spp > 1:
        out += _s.pack(o + "H" * spp, *([8] * spp))
    for sdata in strips:
        out += sdata
    return bytes(out)


def test_tiff_decode_rgb_both_byte_orders_and_strips():
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(61)
    px = rng.randint(0, 256, (7, 5, 3)).astype(np.uint8)
    for o in ("<", ">"):
        w, h, img = decode_image(_make_tiff(px, byte_order=o, rows_per_strip=3))
        assert (w, h) == (5, 7) and (img == px).all(), o


def test_tiff_packbits_and_whiteiszero_grey():
    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(67)
    g = rng.randint(0, 256, (6, 9)).astype(np.uint8)
    _, _, img = decode_image(_make_tiff(g, packbits=True, rows_per_strip=2))
    assert (img[..., 0] == g).all() and (img[..., 1] == g).all()
    # photometric 0: white-is-zero inverts
    _, _, inv = decode_image(_make_tiff(g, photometric=0))
    assert (inv[..., 0] == 255 - g).all()


def test_tiff_real_packbits_runs_roundtrip():
    """Repeat-run PackBits (not just literal runs): constant rows
    compress to 2-byte repeats; pin the decoder's run arithmetic."""
    import struct as _s

    import numpy as np

    from surge_spark.operators.multimodal import _packbits

    # 257-n repeats: n=0x81 -> 128 repeats; plus a 3-literal tail
    data = bytes([0x81, 0xAB]) + bytes([0x02, 1, 2, 3])
    out = _packbits(data, 131)
    assert out == bytes([0xAB]) * 128 + bytes([1, 2, 3])
    import pytest

    with pytest.raises(ValueError):
        _packbits(bytes([0x81]), 10)  # truncated repeat
    with pytest.raises(ValueError):
        _packbits(bytes([0x05, 1, 2]), 6)  # truncated literal


def test_tiff_unsupported_layouts_raise_value_error():
    import numpy as np
    import pytest

    from surge_spark.operators.multimodal import decode_image

    px = np.zeros((4, 4), np.uint8)
    base = bytearray(_make_tiff(px))
    # flip compression tag (259) value to 5 (LZW)
    import struct as _s
    for k in range(9):
        off = 8 + 2 + 12 * k
        tag = _s.unpack_from("<H", base, off)[0]
        if tag == 259:
            _s.pack_into("<I", base, off + 8, 5)
    with pytest.raises(ValueError, match="codec"):
        decode_image(bytes(base))
    with pytest.raises(ValueError):
        decode_image(bytes(_make_tiff(px))[:20])  # truncated


def test_tiff_overdeclared_strip_count_clamped():
    """An over-declared StripByteCounts entry must not shift later rows:
    the uncompressed branch clamps each strip to its geometry-derived
    size (r10 third-review finding — previously rows after the bloated
    strip silently shifted)."""
    import struct as _s

    import numpy as np

    from surge_spark.operators.multimodal import decode_image

    g = np.arange(12, dtype=np.uint8).reshape(4, 3)
    base = bytearray(_make_tiff(g, rows_per_strip=2))
    # bloat strip 0's byte count by 2 (the extra bytes exist in the file:
    # they're the start of strip 1)
    for k in range(9):
        off = 8 + 2 + 12 * k
        tag = _s.unpack_from("<H", base, off)[0]
        if tag == 279:
            cnt_pos = _s.unpack_from("<I", base, off + 8)[0]
            c0 = _s.unpack_from("<I", base, cnt_pos)[0]
            _s.pack_into("<I", base, cnt_pos, c0 + 2)
    w, h, img = decode_image(bytes(base))
    assert (img[..., 0] == g).all()


def _py_ahash(grey_rows):
    """Pure-Python aHash recompute (third engine beside the kernel and
    the DuckDB oracle): grey_rows is 8 rows (top-down) of 8 ints."""
    flat = [v for row in grey_rows for v in row]
    total = sum(flat)
    lo = sum(1 << i for i in range(32) if flat[i] * 64 > total)
    hi = sum(1 << i for i in range(32) if flat[32 + i] * 64 > total)
    return hi, lo


def test_ahash64_matches_python_recompute():
    """ahash64 over a constructed 8x8 BMP equals the pure-Python aHash of
    the same grey grid — pins decode + resample-identity + integer grey
    + strict mean threshold + the (hi, lo) packing in one shot."""
    from surge_spark.operators.multimodal import ahash64

    grey = [[(r * 8 + c) * 3 % 256 for c in range(8)] for r in range(8)]
    bmp = _make_bmp(8, 8, [[(v, v, v) for v in row] for row in grey])
    assert ahash64(bmp) == _py_ahash(grey)
    # halves are unsigned 32-bit (the no-sign-channel contract)
    hi, lo = ahash64(bmp)
    assert 0 <= hi < 2**32 and 0 <= lo < 2**32


def test_ahash64_near_duplicate_small_hamming():
    """A single perturbed pixel flips at most a few bits (the near-dup
    premise the banded entry relies on), and an unrelated image is far."""
    from surge_spark.operators.multimodal import ahash64

    base = [[(r * 31 + c * 17) % 256 for c in range(8)] for r in range(8)]
    pert = [row[:] for row in base]
    pert[3][4] = (pert[3][4] + 120) % 256  # one pixel changed
    inv = [[255 - v for v in row] for row in base]

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    fa = ahash64(_make_bmp(8, 8, [[(v, v, v) for v in r] for r in base]))
    fp = ahash64(_make_bmp(8, 8, [[(v, v, v) for v in r] for r in pert]))
    fi = ahash64(_make_bmp(8, 8, [[(v, v, v) for v in r] for r in inv]))
    assert ham(fa, fp) <= 6
    assert ham(fa, fi) >= 20  # inversion flips every threshold decision


def test_dhash64_gradient_images():
    """dHash pins: a strictly increasing horizontal ramp sets every bit
    (all 64 right>left gradients true); a constant image sets none; a
    reversed ramp sets none (strict >)."""
    from surge_spark.operators.multimodal import dhash64

    ramp = [[c * 20 for c in range(9)] for _ in range(8)]
    down = [[(8 - c) * 20 for c in range(9)] for _ in range(8)]
    flat = [[100] * 9 for _ in range(8)]

    def mk(g):
        return _make_bmp(9, 8, [[(v, v, v) for v in row] for row in g])

    assert dhash64(mk(ramp)) == (2**32 - 1, 2**32 - 1)
    assert dhash64(mk(down)) == (0, 0)
    assert dhash64(mk(flat)) == (0, 0)


def test_image_ahash_null_on_undecodable(spark):
    """Undecodable payloads yield NULL fingerprint halves — visible, not
    dropped, and never poisoning the Arrow batch (the WAV lesson)."""
    grey = [[(r + c) * 15 % 256 for c in range(8)] for r in range(8)]
    good = _make_bmp(8, 8, [[(v, v, v) for v in row] for row in grey])
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "payload": [good, b"not an image"]})
    )
    out = (
        mm.image_ahash(df)
        .orderBy("id")
        .collect()
    )
    assert out[0].fp_hi is not None and out[0].fp_lo is not None
    assert (out[0].fp_hi, out[0].fp_lo) == _py_ahash(grey)
    assert out[1].fp_hi is None and out[1].fp_lo is None


def test_tiff_construct_in_query_roundtrip():
    """The constructed 6x3 TIFF framing decodes through the REAL
    _decode_tiff to exactly the embedded chars (grey expanded R=G=B)."""
    from surge_spark.operators.multimodal import decode_image
    from surge_spark.queries.text import _TIFF_6X3_PREFIX, _TIFF_6X3_SUFFIX

    chars = b"zyxwvutsrqponmlkji"
    w, h, img = decode_image(_TIFF_6X3_PREFIX + chars + _TIFF_6X3_SUFFIX)
    assert (w, h) == (6, 3)
    assert img[:, :, 0].reshape(-1).tolist() == list(chars)
    assert (img[:, :, 0] == img[:, :, 1]).all()
    assert (img[:, :, 0] == img[:, :, 2]).all()
