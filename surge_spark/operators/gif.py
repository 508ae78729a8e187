"""Pure stdlib+numpy GIF decoder (GIF87a/GIF89a, first frame).

Same rationale as the baseline JPEG decoder in operators/jpeg.py: the
multimodal operators route undecodable payloads to an honest fake
fallback, and GIF — a spec-complete, self-contained format — does not
need a codec library. This module does the real decode: header/logical
screen descriptor, global and local color tables,
variable-width LSB-first LZW decompression with the full dictionary
lifecycle (clear/end codes, width growth to 12 bits, 4096-entry deferred
clear), and Adam-style 4-pass de-interlacing. Extension blocks
(including graphic-control transparency) are SKIPPED wholesale — feature
extraction reads the palette color of every pixel, which is
deterministic regardless of what a viewer would blend a transparent
pixel over. Animated GIFs decode to their FIRST image block.

Error contract matches the other stdlib decoders (the r6 corrupt-payload
fallback contract): malformed or truncated payloads raise ValueError —
never IndexError/struct.error — so operators.multimodal.extract_features
routes them to the fake-decode fallback. Decompression bombs are clamped
the same way as the MP4 demux: declared pixel counts are bounded, and
the LZW loop can never emit more output than the declared frame size.

Reference anchor: surge has no media path at all; this extends the
multimodal mapInPandas operators (SURVEY §2 extension family).
"""

from __future__ import annotations

import struct

import numpy as np

# hard ceiling on declared frame pixels (64 MPix ~ 192 MB RGB) — a tiny
# payload declaring a huge canvas is a decompression bomb, not an image
_MAX_PIXELS = 64_000_000


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    codes packed LSB-first, clear = 2^min, end = clear+1, dictionary
    capped at 4096 (further codes reuse the table until a clear arrives —
    the 'deferred clear' the spec allows). Output is clamped at
    ``max_pixels``: a malicious stream cannot fan out past the declared
    frame size."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF LZW minimum code size {min_code_size} out of range")
    clear = 1 << min_code_size
    end = clear + 1
    roots = [bytes([i]) for i in range(clear)]
    table: list[bytes] = []
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    nbits = len(data) * 8
    while bitpos + width <= nbits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = []
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < clear:
            entry = roots[code]
        elif code - clear - 2 < len(table):
            entry = table[code - clear - 2]
        elif code == clear + 2 + len(table) and prev is not None:
            # the KwKwK case: code == next entry to be defined
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream: code beyond dictionary")
        out += entry
        if prev is not None and clear + 2 + len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if clear + 2 + len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= max_pixels:
            break
    return out


def _deinterlace(arr: np.ndarray) -> np.ndarray:
    """Undo GIF's 4-pass row interlacing (rows arrive 0,8,16.. then
    4,12.. then 2,6.. then 1,3..)."""
    ih = arr.shape[0]
    order = (
        list(range(0, ih, 8))
        + list(range(4, ih, 8))
        + list(range(2, ih, 4))
        + list(range(1, ih, 2))
    )
    out = np.empty_like(arr)
    out[order] = arr
    return out


def decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the first image block of a GIF payload to
    (width, height, HxWx3 uint8 RGB)."""
    try:
        return _decode(payload)
    except (IndexError, struct.error) as e:
        # out-of-bounds reads on truncated payloads become the uniform
        # corrupt-payload signal (the fallback contract)
        raise ValueError(f"truncated GIF payload: {e}") from e


def _decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    _, _, packed, _, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        raw = payload[pos : pos + 3 * n]
        if len(raw) < 3 * n:
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(raw, np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, all skippable
            pos += 1  # label byte
            while True:
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        _, _, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            raw = payload[pos : pos + 3 * n]
            if len(raw) < 3 * n:
                raise ValueError("truncated GIF local color table")
            ct = np.frombuffer(raw, np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image block with no color table")
        if iw <= 0 or ih <= 0 or iw * ih > _MAX_PIXELS:
            raise ValueError(f"GIF declares unreasonable dimensions {iw}x{ih}")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            if pos + sz > len(payload):
                raise ValueError("truncated GIF image data sub-block")
            data += payload[pos : pos + sz]
            pos += sz
        idx = _lzw_decode(bytes(data), min_code_size, iw * ih)
        if len(idx) < iw * ih:
            raise ValueError(
                f"GIF pixel data short: {len(idx)} of {iw * ih} pixels"
            )
        arr = np.frombuffer(bytes(idx[: iw * ih]), np.uint8).reshape(ih, iw)
        if int(arr.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index beyond color table")
        if ipacked & 0x40:
            arr = _deinterlace(arr)
        return int(iw), int(ih), np.ascontiguousarray(ct[arr])
    raise ValueError("GIF contains no image block")
