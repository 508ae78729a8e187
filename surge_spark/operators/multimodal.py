"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schema, partition sizing, UDF
signature, batch shape. Decode is REAL for the formats the standard
library can parse — BMP (8-bit paletted / 24 / 32-bit) and PPM (P6 at
any legal maxval) via struct + numpy, PNG
in FULL (every legal depth/color-type/interlace combination: zlib
inflate + the five filter reconstructions + PLTE + Adam7), JPEG both
baseline AND progressive (full marker/
Huffman/successive-approximation/IDCT decode in operators.jpeg — no
codec library), GIF (full LZW + interlace in operators.gif), WAV audio
via the ``wave`` module, baseline TIFF (strips, PackBits, both byte
orders), and MJPEG video pixels end to end (real MP4
demux in operators.mp4 + per-sample JPEG decode,
``extract_frame_features``) — and gated for everything else (this
container has no imaging/audio codecs): ``decode_image`` raises
NotImplementedError for arithmetic JPEG unless Pillow is
importable, and ``extract_features`` falls back to a deterministic fake
decoder for payloads it cannot sniff, so pipelines stay end-to-end
testable on any input.

At 100 TB: binary payloads dominate row size, so feature extraction runs
mapInPandas (no shuffle) and downstream analytics select only the small
metadata/feature columns — column pruning keeps the binary out of every
subsequent scan.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import ensure_shipped

FEATURE_SCHEMA = (
    "id long, mime string, n_bytes long, width int, height int, feat array<float>"
)


def to_binary_payload(
    df: DataFrame, id_col: str, content_col: str, mime: str
) -> DataFrame:
    """Wrap a content column as an opaque binary payload + typed metadata —
    the shape a real multimodal table has (payload binary, mime string)."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(content_col), "UTF-8").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def _decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real uncompressed BMP decode with stdlib struct + numpy: 24-bit
    BGR, 32-bit BGRA (alpha/padding byte dropped) and 8-bit paletted
    (BGRX color table after the DIB header). Returns (width, height,
    HxWx3 uint8 RGB). Rows are stored bottom-up (positive height) and
    padded to 4-byte boundaries."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError("unsupported BMP DIB header")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp not in (8, 24, 32) or compression != 0:
        raise ValueError(
            "only uncompressed 8/24/32-bit BMP is stdlib-decodable"
        )
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        # malformed-but-parseable header: dims must be positive or the
        # resize path divides by max(ow, oh)=0 — route through the
        # fake-decode fallback instead of killing the Spark task
        raise ValueError("BMP declares non-positive dimensions")
    if w * h > 64_000_000:
        raise ValueError("BMP declares unreasonable dimensions")
    nbytes = bpp // 8
    row_size = (w * nbytes + 3) & ~3
    if pixel_off + row_size * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=pixel_off
    ).reshape(h, row_size)[:, : w * nbytes]
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        tbl = np.frombuffer(
            payload, np.uint8, count=n_colors * 4, offset=14 + dib_size
        ).reshape(n_colors, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        idx = rows.astype(np.int64)
        if (idx >= n_colors).any():
            raise ValueError("BMP palette index beyond color table")
        img = tbl[idx]
    else:
        img = rows.reshape(h, w, nbytes)[..., :3][..., ::-1]  # BGR(A) -> RGB
    if bottom_up:
        img = img[::-1]
    return w, h, np.ascontiguousarray(img)


def _decode_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real binary-PPM (P6) decode at ANY legal maxval: ASCII header
    tokens (comments allowed) then raw RGB samples — one byte each for
    maxval <= 255, big-endian two-byte for 256..65535 (spec: "plain" and
    wide P6), scaled to 0..255 output when maxval != 255."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw data
    w, h, maxval = tokens
    if w <= 0 or h <= 0:
        raise ValueError("PPM declares non-positive dimensions")
    if not 0 < maxval < 65536:
        raise ValueError(f"PPM maxval {maxval} out of range")
    if w * h > 64_000_000:
        raise ValueError("PPM declares unreasonable dimensions")
    wide = maxval > 255
    need = w * h * 3 * (2 if wide else 1)
    if (
        payload[pos - 1 : pos] == b"\r"
        and payload[pos : pos + 1] == b"\n"
        and len(payload) - pos != need
        and len(payload) - (pos + 1) >= need
    ):
        # CRLF-written header (out-of-spec but common): the separator is
        # the \r\n pair — without this the pixel stream starts one byte
        # early and every channel silently shifts. The length check keeps
        # the spec-legal lone-\r file whose FIRST pixel byte is 0x0A
        # intact: if the remaining bytes already fit the raster exactly,
        # that 0x0A is data, not whitespace.
        pos += 1
    if pos + need > len(payload):
        raise ValueError("truncated PPM pixel data")
    if wide:
        v = np.frombuffer(
            payload, dtype=">u2", count=w * h * 3, offset=pos
        ).reshape(h, w, 3)
    else:
        v = np.frombuffer(
            payload, dtype=np.uint8, count=need, offset=pos
        ).reshape(h, w, 3)
    if maxval != 255:
        if int(v.max(initial=0)) > maxval:
            # a sample past maxval is spec-invalid; scaling it would cast
            # out of uint8 range (undefined wraparound -> silent garbage
            # features) — refuse like the palette-index checks do
            raise ValueError("PPM sample exceeds declared maxval")
        v = np.round(v.astype(np.float64) * (255.0 / maxval))
    return w, h, np.ascontiguousarray(v.astype(np.uint8))


def _packbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF compression 32773): n<128 -> n+1 literal
    bytes; n>128 -> the next byte repeated 257-n times; 128 is a no-op."""
    out = bytearray()
    i = 0
    n_data = len(data)
    while i < n_data and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            chunk = data[i : i + n + 1]
            if len(chunk) < n + 1:
                raise ValueError("truncated PackBits literal run")
            out += chunk
            i += n + 1
        elif n > 128:
            if i >= n_data:
                raise ValueError("truncated PackBits repeat run")
            out += data[i : i + 1] * (257 - n)
            i += 1
    if len(out) < expected:
        raise ValueError("PackBits output short of expected strip size")
    return bytes(out[:expected])


# TIFF type sizes for the tag values this decoder reads
_TIFF_TYPE_SIZE = {1: 1, 3: 2, 4: 4}


def _decode_tiff(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real baseline-TIFF decode, stdlib struct + numpy: both byte
    orders (II/MM), 8-bit greyscale or RGB, strip-organized, compression
    1 (none) or 32773 (PackBits), photometric 0 (white-is-zero,
    inverted) / 1 / 2. Tiled, LZW/JPEG-compressed, planar-separated and
    sub-8-bit TIFFs raise ValueError to the fake fallback — those need
    either a codec or a rarer layout than scan pipelines emit. Truncated
    payloads surface as ValueError per the fallback contract (fuzz-
    pinned in tests/test_decoder_fuzz.py)."""
    try:
        return _decode_tiff_inner(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated TIFF payload: {e}") from e


def _decode_tiff_inner(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:4] == b"II*\x00":
        o = "<"
    elif payload[:4] == b"MM\x00*":
        o = ">"
    else:
        raise ValueError("not a TIFF payload")
    (ifd_off,) = struct.unpack_from(o + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    (n_entries,) = struct.unpack_from(o + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        if base + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, count = struct.unpack_from(o + "HHI", payload, base)
        size = _TIFF_TYPE_SIZE.get(typ)
        if size is None:
            continue  # RATIONAL etc. — nothing this decoder needs
        if count > 1_000_000:
            raise ValueError("TIFF tag count unreasonable")
        total = size * count
        if total <= 4:
            off = base + 8
        else:
            (off,) = struct.unpack_from(o + "I", payload, base + 8)
        if off + total > len(payload):
            raise ValueError("TIFF tag values out of bounds")
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(o + fmt * count, payload, off))
    try:
        w = tags[256][0]
        h = tags[257][0]
        strip_offsets = tags[273]
        strip_counts = tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag: {e}") from e
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    rows_per_strip = tags.get(278, [h])[0]
    if w <= 0 or h <= 0 or w * h > 64_000_000:
        raise ValueError("TIFF declares unreasonable dimensions")
    if spp not in (1, 3) or any(b != 8 for b in bits[:spp]):
        raise ValueError("only 8-bit grey/RGB TIFF is stdlib-decodable")
    if compression not in (1, 32773):
        raise ValueError(
            f"TIFF compression {compression} needs a codec library"
        )
    if photometric not in (0, 1, 2):
        raise ValueError(f"TIFF photometric {photometric} unsupported")
    if len(strip_offsets) != len(strip_counts):
        raise ValueError("TIFF strip tables disagree")
    raster = bytearray()
    rows_done = 0
    for off, cnt in zip(strip_offsets, strip_counts):
        if off + cnt > len(payload):
            raise ValueError("TIFF strip out of bounds")
        strip_rows = min(rows_per_strip, h - rows_done)
        expected = strip_rows * w * spp
        data = payload[off : off + cnt]
        if compression == 32773:
            raster += _packbits(data, expected)
        else:
            # clamp to the geometry-derived strip size: an over-declared
            # StripByteCounts would otherwise shift every later row
            # (silently wrong pixels, not the ValueError contract)
            if len(data) < expected:
                raise ValueError("TIFF strip shorter than its raster rows")
            raster += data[:expected]
        rows_done += strip_rows
    if len(raster) < h * w * spp:
        raise ValueError("truncated TIFF raster")
    px = np.frombuffer(bytes(raster), np.uint8, count=h * w * spp).reshape(
        h, w, spp
    )
    if spp == 1:
        if photometric == 0:  # white-is-zero: invert to normal grey
            px = 255 - px
        px = np.repeat(px, 3, axis=2)
    return w, h, np.ascontiguousarray(px)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# total Average/Paeth-filtered bytes one PNG may decode serially (the
# per-byte Python recurrence): ~4 MB is seconds of CPU; a legit thumbnail
# is far under it, a crafted huge-raster file falls back to fake-decode
_PNG_SERIAL_BUDGET = 4_000_000


def _png_reconstruct(
    raw: bytes,
    stride: int,
    h: int,
    bpp: int,
    offset: int = 0,
    budget: list[int] | None = None,
) -> tuple[np.ndarray, int]:
    """Undo PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth).
    ``raw[offset:]`` holds h rows of (1 filter byte + ``stride`` sample
    bytes); ``bpp`` is the filter's byte distance (bytes per complete
    pixel, min 1 — so 1 for sub-byte depths, 2*ch for 16-bit). Returns
    (rows, bytes consumed) so Adam7 passes can chain through one
    datastream. Row-vectorized where the filter allows (None/Up);
    Sub/Average/Paeth carry an in-row serial dependency, done per-pixel
    on the row (images decoded here are thumbnails/test fixtures;
    production routes compressed formats through a codec library
    anyway)."""
    need = h * (stride + 1)
    if len(raw) - offset < need:
        raise ValueError("truncated PNG datastream")
    if budget is None:
        budget = [_PNG_SERIAL_BUDGET]
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = offset
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += stride + 1
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            out[y] = row
        elif ftype == 2:  # Up
            out[y] = (row.astype(np.int32) + prev).astype(np.uint8)
        elif ftype == 1:  # Sub: per-lane running sum mod 256 — exact and
            # vectorized (out[i] = raw[i] + out[i-bpp] is a cumulative
            # sum along each of the bpp byte lanes)
            pad = (-stride) % bpp
            lanes = np.pad(row.astype(np.int64), (0, pad)).reshape(-1, bpp)
            out[y] = (
                np.cumsum(lanes, axis=0).reshape(-1)[:stride] & 0xFF
            ).astype(np.uint8)
        elif ftype in (3, 4):
            # Average/Paeth carry a genuinely serial nonlinear in-row
            # recurrence — per-byte Python. Budget the total serial work:
            # past it, a crafted tiny-payload/huge-raster PNG would pin
            # an executor core for minutes (the CPU-bomb twin of the
            # zlib size bomb); legit thumbnails stay far under it, and
            # oversized files route to the fake-decode fallback
            budget[0] -= stride
            if budget[0] < 0:
                raise ValueError(
                    "PNG serial-filter (Average/Paeth) work exceeds the "
                    "stdlib decode budget"
                )
            cur = out[y]
            r = row.astype(np.int32)
            p = prev.astype(np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                if ftype == 3:  # Average
                    cur[i] = (r[i] + ((a + int(p[i])) >> 1)) & 0xFF
                else:  # Paeth
                    b = int(p[i])
                    c = int(p[i - bpp]) if i >= bpp else 0
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (r[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out, need


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 pass geometry: (x0, y0, dx, dy) per pass (spec §8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_rows_to_rgb(
    rows: np.ndarray, w: int, h: int, bit_depth: int, color_type: int,
    palette: np.ndarray | None,
) -> np.ndarray:
    """Reconstructed scanline bytes -> (h, w, 3) uint8 RGB: sub-byte
    sample unpacking (grey scaled to full range, palette looked up),
    16-bit high-byte reduction, alpha dropped (training features read
    RGB — same policy as RGBA and GIF transparency)."""
    ch = _PNG_CHANNELS[color_type]
    if bit_depth < 8:  # grey (0) or palette (3) only, per spec
        bits = np.unpackbits(rows, axis=1)
        n = bits.shape[1] // bit_depth
        weights = 1 << np.arange(bit_depth - 1, -1, -1)
        samples = (
            bits[:, : n * bit_depth].reshape(h, n, bit_depth) * weights
        ).sum(axis=2)[:, :w]
        if color_type == 0:
            g = (samples * (255 // ((1 << bit_depth) - 1))).astype(np.uint8)
            return np.stack([g, g, g], axis=-1)
        idx = samples.astype(np.int64)
        if palette is None or (idx >= len(palette)).any():
            raise ValueError("PNG palette index beyond PLTE")
        return palette[idx]
    if bit_depth == 16:
        px = rows[:, : w * ch * 2].reshape(h, w, ch, 2)[..., 0]  # high byte
    else:
        px = rows[:, : w * ch].reshape(h, w, ch)
    if color_type == 3:
        idx = px[..., 0].astype(np.int64)
        if palette is None or (idx >= len(palette)).any():
            raise ValueError("PNG palette index beyond PLTE")
        return palette[idx]
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:  # grey + alpha: replicate grey, drop alpha
        g = px[..., 0]
        return np.stack([g, g, g], axis=-1)
    return np.ascontiguousarray(px[..., :3])  # RGB / RGBA


def _decode_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real stdlib PNG decode: critical-chunk parse (struct), zlib
    inflate, the five filter reconstructions, EVERY legal bit depth
    (1/2/4/8/16 — sub-byte samples unpacked, 16-bit reduced to the high
    byte), every color type (grey, RGB, palette via PLTE, grey+alpha,
    RGBA — alpha dropped, tRNS not composited, the GIF policy), and
    Adam7 interlacing (seven per-pass filtered sub-images scattered back
    into the raster). PNG's compression IS zlib DEFLATE (spec §10), so
    no codec library is needed for ANY of it."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("truncated PNG IHDR")
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif ctype == b"PLTE":
            if len(data) % 3 or not data:
                raise ValueError("malformed PNG PLTE")
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if w == 0 or h == 0:
        raise ValueError("PNG declares zero dimensions")
    if w * h > 64_000_000:
        raise ValueError("PNG declares unreasonable dimensions")
    ch = _PNG_CHANNELS.get(color_type)
    legal_depths = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(
        color_type, (8, 16)
    )
    if ch is None or bit_depth not in legal_depths or interlace not in (0, 1):
        raise ValueError(
            f"illegal PNG depth/color/interlace combination "
            f"({bit_depth}/{color_type}/{interlace})"
        )
    bits_pp = bit_depth * ch
    bpp = max(1, bits_pp // 8)
    # the exact inflated size is a pure function of the header — bound
    # the inflate to it, or a 1x1-declared payload carrying a 1000:1
    # zlib bomb would allocate the full inflated stream (MemoryError /
    # executor OOM, outside the ValueError fallback contract) before any
    # length check ran
    if interlace == 0:
        passes = [(0, 0, 1, 1)]
    else:
        passes = _ADAM7
    expected = 0
    geom = []
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw <= 0 or ph <= 0:
            continue
        stride = -(-(pw * bits_pp) // 8)
        geom.append((x0, y0, dx, dy, pw, ph, stride))
        expected += ph * (stride + 1)
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), expected)
    except zlib.error as e:
        # corrupt IDAT must surface as ValueError so the extract/resize
        # fallback catches it — one bad file must not kill the Spark task
        raise ValueError(f"corrupt PNG datastream: {e}") from e
    budget = [_PNG_SERIAL_BUDGET]
    if interlace == 0:
        _, _, _, _, _, _, stride = geom[0]
        rows, _ = _png_reconstruct(raw, stride, h, bpp, budget=budget)
        img = _png_rows_to_rgb(rows, w, h, bit_depth, color_type, palette)
        return w, h, np.ascontiguousarray(img)
    img = np.zeros((h, w, 3), np.uint8)
    off = 0
    for x0, y0, dx, dy, pw, ph, stride in geom:
        rows, consumed = _png_reconstruct(
            raw, stride, ph, bpp, offset=off, budget=budget
        )
        off += consumed
        img[y0::dy, x0::dx] = _png_rows_to_rgb(
            rows, pw, ph, bit_depth, color_type, palette
        )
    return w, h, np.ascontiguousarray(img)


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode an image payload to (width, height, HxWx3 uint8 RGB).

    Real stdlib decode for BMP (8-bit paletted / 24 / 32-bit), PPM (P6,
    any legal maxval), PNG in full (all
    legal depths 1-16, grey/RGB/palette/alpha color types, Adam7
    interlace — zlib DEFLATE + struct + numpy), JPEG (baseline
    SOF0/SOF1 AND progressive SOF2 — full marker/Huffman/
    successive-approximation/IDCT decode in operators.jpeg, no codec
    library) and GIF (87a/89a, full LZW + interlace, first frame —
    operators.gif) and baseline TIFF (8-bit grey/RGB strips, both byte
    orders, PackBits). Arithmetic-coded JPEG still needs a codec library
    this container lacks — gated honestly behind the Pillow import."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
    try:
        import PIL.Image  # noqa: F401  (not installed here; gate, don't assume)
    except ImportError as e:
        raise NotImplementedError(
            "compressed-image decode requires an imaging library (e.g. "
            "Pillow); BMP/PPM/PNG/GIF/baseline-JPEG are the stdlib-decodable "
            "formats in this environment"
        ) from e
    raise NotImplementedError("Pillow decode path not wired in this build")


def _pack_bits64(bits: np.ndarray) -> tuple[int, int]:
    """Pack a 64-element boolean array (bit i = element i) into two
    unsigned 32-bit halves (hi = bits 32..63, lo = bits 0..31) — the
    md5-halves precedent: each half < 2^32 fits a signed BIGINT on both
    engines, so no sign channel and no 2^63 ANSI overflow."""
    lo = 0
    hi = 0
    for i in range(32):
        if bits[i]:
            lo |= 1 << i
        if bits[32 + i]:
            hi |= 1 << i
    return hi, lo


def ahash64(payload: bytes) -> tuple[int, int]:
    """64-bit average hash (aHash) over the REAL decode path: decode →
    8×8 nearest-neighbor resample (_resample_nearest — identity for 8×8
    inputs, so constructed 8×8 oracle images hit an exact channel) →
    integer grey ``(r+g+b)//3`` → bit i set iff ``grey_i*64 > total``
    (strict, all-integer — no float mean, so a SQL oracle computes the
    identical fingerprint). Bit order is row-major top-down; returns
    (hi, lo) 32-bit halves. Raises like decode_image on undecodable
    payloads (callers choose null-row vs drop)."""
    _w, _h, img = decode_image(payload)
    small = _resample_nearest(img, 8, 8)
    grey = small.astype(np.int64).sum(axis=2) // 3
    flat = grey.reshape(-1)
    total = int(flat.sum())
    return _pack_bits64((flat * 64) > total)


def dhash64(payload: bytes) -> tuple[int, int]:
    """64-bit difference hash (dHash): decode → 9×8 nearest resample →
    integer grey → bit r*8+c set iff grey[r][c+1] > grey[r][c] (strict
    horizontal gradient — all-integer, oracle-exact for constructed
    9-wide images). Same (hi, lo) packing as ahash64."""
    _w, _h, img = decode_image(payload)
    small = _resample_nearest(img, 9, 8)
    grey = small.astype(np.int64).sum(axis=2) // 3
    return _pack_bits64((grey[:, 1:] > grey[:, :-1]).reshape(-1))


AHASH_SCHEMA = "id long, fp_hi long, fp_lo long"


def image_ahash(df: DataFrame, id_col: str = "id", kind: str = "ahash") -> DataFrame:
    """Per-payload 64-bit perceptual fingerprint over mapInPandas —
    kind='ahash'/'dhash' for images, kind='audio' for WAV payloads
    (audio_ahash64) — the multimodal members of the dedup family's
    fingerprint stage (simhash's shape: fingerprint → band → Hamming
    verify).
    Undecodable payloads yield NULL halves (visible, never silently
    dropped); one pass, no shuffle, payload dropped on output."""
    fn = {"ahash": ahash64, "dhash": dhash64, "audio": audio_ahash64}[kind]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
                try:
                    hi, lo = fn(payload)
                except (NotImplementedError, ValueError):
                    hi = lo = None
                rows.append({"id": rec[1], "fp_hi": hi, "fp_lo": lo})
            out = pd.DataFrame(rows, columns=["id", "fp_hi", "fp_lo"])
            # nullable-int dtype: a None in a plain int column becomes
            # float NaN and Arrow rejects it against a long schema
            out["fp_hi"] = out["fp_hi"].astype("Int64")
            out["fp_lo"] = out["fp_lo"].astype("Int64")
            yield out

    cols = df.select(F.col(id_col).alias("id"), F.col("payload"))
    ensure_shipped(df.sparkSession)
    return cols.mapInPandas(run, schema=AHASH_SCHEMA)


def decode_audio(payload: bytes) -> dict:
    """Real WAV decode via the stdlib ``wave`` module: returns channel
    count, sample rate/width, frame count and the PCM samples as an int
    numpy array (interleaved channels). Malformed payloads raise
    ValueError uniformly — the wave module itself leaks wave.Error,
    EOFError and even bare RuntimeError (its Chunk.seek on truncated
    files, fuzz-pinned), all of which must normalize to the fallback
    contract before reaching an Arrow batch."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            n_channels = w.getnchannels()
            sample_width = w.getsampwidth()
            frame_rate = w.getframerate()
            n_frames = w.getnframes()
            frames = w.readframes(n_frames)
    except (wave.Error, EOFError, RuntimeError, struct.error, IndexError) as e:
        raise ValueError(f"corrupt/truncated WAV: {type(e).__name__}") from e
    if sample_width == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    elif sample_width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"unsupported PCM sample width {sample_width}")
    return {
        "n_channels": n_channels,
        "sample_width": sample_width,
        "frame_rate": frame_rate,
        "n_frames": n_frames,
        "samples": samples,
    }


def audio_ahash64(payload: bytes) -> tuple[int, int]:
    """64-bit audio fingerprint over the REAL WAV decode path — the
    audio member of the perceptual-hash family (ahash64/dhash64 for
    images): decode → channel-mean mono (integer floor) → 64-point
    nearest-index resample → bit i set iff ``s_i·64 > Σs`` (the strict
    all-integer aHash rule, here over signed PCM amplitudes). Same
    (hi, lo) unsigned-32-bit packing. Constructed 64-sample WAVs make
    the whole fingerprint an exact integer channel a SQL oracle
    recomputes (the BMP construct-in-query precedent). Raises
    ValueError on undecodable/too-short payloads."""
    d = decode_audio(payload)
    samples = d["samples"].astype(np.int64)
    if d["n_channels"] > 1:
        samples = (
            samples.reshape(-1, d["n_channels"]).sum(axis=1)
            // d["n_channels"]
        )
    n = samples.shape[0]
    if n < 1:
        raise ValueError("empty WAV")
    idx = (np.arange(64) * n) // 64
    s = samples[idx]
    total = int(s.sum())
    return _pack_bits64((s * 64) > total)


def _pixel_features(w: int, h: int, img: np.ndarray) -> list[float]:
    """8-dim deterministic feature vector from real pixels: per-channel
    means, global mean/min/max (all /255), and the aspect split."""
    means = img.reshape(-1, 3).mean(axis=0) / 255.0
    flat = img.reshape(-1)
    return [
        float(means[0]),
        float(means[1]),
        float(means[2]),
        float(flat.mean() / 255.0),
        float(flat.min() / 255.0),
        float(flat.max() / 255.0),
        float(w / (w + h)),
        float(h / (w + h)),
    ]


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder: derives a (width, height) and an 8-dim
    feature vector purely from payload bytes, so the pipeline shape is
    testable without media libs."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    feat = [float((payload[i % n] if n else 0) + i) / 255.0 for i in range(8)]
    return width, height, feat


def extract_features(df: DataFrame, id_col: str = "id") -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches). One pass,
    no shuffle; output drops the binary payload so downstream plans never
    re-scan it.

    BMP/PPM payloads (sniffed by magic bytes) get the REAL stdlib decode —
    true dimensions and pixel-statistic features; anything else falls back
    to the deterministic fake decoder so the pipeline never dies on a
    format this container cannot parse (production: route those through a
    codec library behind decode_image's gate)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
                try:
                    width, height, img = decode_image(payload)
                    feat = _pixel_features(width, height, img)
                except (NotImplementedError, ValueError):
                    width, height, feat = _fake_decode(payload)
                rows.append(
                    {
                        "id": rec[1],
                        "mime": rec.mime,
                        "n_bytes": len(payload),
                        "width": width,
                        "height": height,
                        "feat": feat,
                    }
                )
            yield pd.DataFrame(rows)

    cols = df.select(
        F.col(id_col).alias("id"), F.col("payload"), F.col("mime")
    )
    ensure_shipped(df.sparkSession)
    return cols.mapInPandas(run, schema=FEATURE_SCHEMA)


AUDIO_FEATURE_SCHEMA = (
    "id long, mime string, n_bytes long, n_channels int, sample_rate int, "
    "n_frames long, duration_ms long, feat array<float>"
)


def extract_audio_features(df: DataFrame, id_col: str = "id") -> DataFrame:
    """WAV audio feature extraction over mapInPandas — REAL stdlib decode
    (``wave`` module, 8/16-bit PCM): true channel/rate/frame metadata plus
    a 4-dim signal feature vector (normalized RMS, mean, peak, zero-
    crossing rate). Same no-shuffle, payload-dropping contract as
    extract_features — and the same per-record resilience: a corrupt or
    non-WAV payload yields a zeroed metadata/feature row (n_frames=0)
    instead of killing the Arrow batch (r10 fuzz finding: previously ANY
    bad payload in a batch poisoned every record in it)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
                try:
                    a = decode_audio(payload)
                except ValueError:
                    rows.append(
                        {
                            "id": rec[1],
                            "mime": rec.mime,
                            "n_bytes": len(payload),
                            "n_channels": 0,
                            "sample_rate": 0,
                            "n_frames": 0,
                            "duration_ms": 0,
                            "feat": [0.0, 0.0, 0.0, 0.0],
                        }
                    )
                    continue
                s = a["samples"].astype(np.float64)
                full = float(1 << (8 * a["sample_width"] - 1))
                zcr = (
                    float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
                    if len(s) > 1
                    else 0.0
                )
                rows.append(
                    {
                        "id": rec[1],
                        "mime": rec.mime,
                        "n_bytes": len(payload),
                        "n_channels": a["n_channels"],
                        "sample_rate": a["frame_rate"],
                        "n_frames": a["n_frames"],
                        "duration_ms": int(
                            a["n_frames"] * 1000 // max(a["frame_rate"], 1)
                        ),
                        "feat": [
                            float(np.sqrt(np.mean(s * s)) / full) if len(s) else 0.0,
                            float(s.mean() / full) if len(s) else 0.0,
                            float(np.abs(s).max() / full) if len(s) else 0.0,
                            zcr,
                        ],
                    }
                )
            yield pd.DataFrame(rows)

    cols = df.select(F.col(id_col).alias("id"), "payload", "mime")
    ensure_shipped(df.sparkSession)
    return cols.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "id long, mime string, payload binary, width int, height int, "
    "orig_width int, orig_height int"
)


def encode_ppm(img: np.ndarray) -> bytes:
    """Minimal binary-PPM (P6) encoder for an HxWx3 uint8 array — the
    re-encode half of the real resize path (PPM is the one RGB container
    writable losslessly with zero codec dependencies)."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _resample_nearest(img: np.ndarray, nw: int, nh: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample via integer index maps —
    the standard decimation kernel, exactly reproducible anywhere."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(nh) * h) // nh
    xs = (np.arange(nw) * w) // nw
    return img[ys][:, xs]


def resize_images(df: DataFrame, max_side: int, id_col: str = "id") -> DataFrame:
    """Resize every image so its longer side is ``max_side`` (aspect
    preserved, never upscaled) — the standard normalize-before-training
    step, over mapInPandas (no shuffle, 1:1 row contract).

    REAL for every stdlib-decodable payload (BMP 24-bit, PPM P6, PNG 8-bit
    — see decode_image): true decode → nearest-neighbor resample →
    lossless P6 re-encode (mime becomes image/x-portable-pixmap, the
    honest statement that the container changed). Payloads the environment
    cannot decode fall back to the deterministic fake dimensions with the
    payload passed through opaque — the pipeline never dies on an exotic
    format (production routes those through a codec library)."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
                try:
                    ow, oh, img = decode_image(payload)
                    scale = min(1.0, max_side / max(ow, oh))
                    nw = max(1, int(ow * scale))
                    nh = max(1, int(oh * scale))
                    out_payload = encode_ppm(_resample_nearest(img, nw, nh))
                    mime = "image/x-portable-pixmap"
                except (NotImplementedError, ValueError):
                    ow, oh, _ = _fake_decode(payload)
                    scale = min(1.0, max_side / max(ow, oh))
                    nw = max(1, int(ow * scale))
                    nh = max(1, int(oh * scale))
                    out_payload = payload  # opaque pass-through
                    mime = rec.mime
                rows.append(
                    {
                        "id": rec[1],
                        "mime": mime,
                        "payload": out_payload,
                        "width": nw,
                        "height": nh,
                        "orig_width": ow,
                        "orig_height": oh,
                    }
                )
            yield pd.DataFrame(rows)

    cols = df.select(F.col(id_col).alias("id"), "payload", "mime")
    ensure_shipped(df.sparkSession)
    return cols.mapInPandas(work, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "id long, frame_index int, ts_ms long, frame binary"


def sample_frames(
    df: DataFrame, every_ms: int = 1000, id_col: str = "id"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame — the 1→N
    fan-out shape (a video row explodes into frames) that a training
    pipeline feeds to per-frame feature extraction. Runs in mapInPandas so
    the (large) video payload is read once per partition and never
    shuffles; downstream selects frames, not videos.

    REAL demux for MP4 payloads (r10): operators.mp4 parses the ISO-BMFF
    sample tables — true per-frame byte ranges, timestamps, keyframe
    flags — and each sampled grid point emits the coded bytes of the
    LAST sample at-or-before it. For MJPEG tracks those bytes are
    standalone JPEGs that extract_frame_features decodes to REAL pixels;
    entropy-coded codecs (H.264/H.265) stay honestly gated at the decode
    stage. Non-MP4 / corrupt / fragmented payloads keep the
    deterministic fake path ('duration' = payload length in ms,
    'frame' = a 16-byte slice) so the pipeline never dies on an
    unparseable container."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import parse_mp4

        def mp4_rows(rid, payload: bytes) -> list[dict] | None:
            try:
                info = parse_mp4(payload)
            except (
                ValueError,
                NotImplementedError,
                struct.error,
                IndexError,
                KeyError,
            ):
                # any malformed-container shape routes to the fake path —
                # the pipeline must never die on an unparseable payload
                return None
            samples = info["samples"]
            if not samples:
                return None
            rows = []
            si = 0
            i = 0
            ts = 0.0
            # bound the fan-out: a corrupt-but-parseable header declaring
            # an absurd duration (timescale 1, huge deltas) must not emit
            # billions of grid rows. A legitimate sparse-frame video still
            # gets generous headroom; beyond it, later grid points only
            # repeat the final sample anyway.
            max_rows = max(64, 8 * len(samples))
            while ts < max(info["duration_ms"], 1.0) and i < max_rows:
                while (
                    si + 1 < len(samples) and samples[si + 1][2] <= ts
                ):
                    si += 1
                off, size, _sts, _sync = samples[si]
                rows.append(
                    {
                        "id": rid,
                        "frame_index": i,
                        "ts_ms": int(ts),
                        "frame": payload[off : off + size],
                    }
                )
                i += 1
                ts += every_ms
            return rows

        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
                if payload[4:8] == b"ftyp":
                    real = mp4_rows(rec[1], payload)
                    if real is not None:
                        rows.extend(real)
                        continue
                duration_ms = len(payload)
                for i, ts in enumerate(range(0, max(duration_ms, 1), every_ms)):
                    start = min(ts, max(duration_ms - 16, 0))
                    rows.append(
                        {
                            "id": rec[1],
                            "frame_index": i,
                            "ts_ms": ts,
                            "frame": payload[start : start + 16],
                        }
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_index", "ts_ms", "frame"])

    cols = df.select(F.col(id_col).alias("id"), "payload")
    ensure_shipped(df.sparkSession)
    return cols.mapInPandas(work, schema=FRAME_SCHEMA)


FRAME_FEATURE_SCHEMA = (
    "id long, frame_index int, ts_ms long, n_bytes long, "
    "width int, height int, feat array<float>"
)


def extract_frame_features(
    df: DataFrame, every_ms: int = 1000, id_col: str = "id"
) -> DataFrame:
    """Video frames -> per-frame pixel features: sample_frames' coded
    sample bytes fed straight into the image decoder. For MJPEG tracks
    (stsd fourcc 'jpeg'/'mjpa' — every sample is a standalone JPEG) this
    is REAL video pixel decode end to end: real demux (operators.mp4) ->
    real JPEG decode (operators.jpeg) -> pixel statistics, no codec
    library anywhere. Entropy-coded codecs (H.264/H.265) decode to the
    deterministic fake features per frame, same fallback contract as
    extract_features. Two mapInPandas passes, both 1:N with no shuffle:
    the video payload is read once, only the (small) sampled frames flow
    to the decode stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                frame = bytes(rec.frame)
                try:
                    width, height, img = decode_image(frame)
                    feat = _pixel_features(width, height, img)
                except (NotImplementedError, ValueError):
                    width, height, feat = _fake_decode(frame)
                rows.append(
                    {
                        "id": rec.id,
                        "frame_index": rec.frame_index,
                        "ts_ms": rec.ts_ms,
                        "n_bytes": len(frame),
                        "width": width,
                        "height": height,
                        "feat": feat,
                    }
                )
            # explicit columns: an empty batch must yield a zero-ROW
            # frame, not a zero-COLUMN one (schema-match kills the task)
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "frame_index", "ts_ms", "n_bytes",
                    "width", "height", "feat",
                ],
            )

    frames = sample_frames(df, every_ms=every_ms, id_col=id_col)
    ensure_shipped(df.sparkSession)
    return frames.mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)
