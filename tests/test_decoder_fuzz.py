"""Decoder fallback-contract fuzz: every stdlib decoder must, on ANY
mutated payload, either decode or raise ValueError/NotImplementedError —
never IndexError / struct.error / KeyError / OverflowError / a numpy
cast surprise. extract_features' per-record fallback catches exactly
those two types; anything else poisons the whole Arrow batch, so this
property IS the multimodal pipeline's crash-safety. Deterministic
seeded mutations (bit flips, byte overwrites, truncations, insertions)
over small valid payloads of every supported format.
"""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from surge_spark.operators.ingest import parse_warc
from surge_spark.operators.multimodal import decode_audio, decode_image

from test_gif import _GOLDEN as GIF_GOLDEN  # noqa: E402
from test_gif import _encode_gif  # noqa: E402
from test_jpeg import _encode_gray, _encode_progressive_gray, _gradient  # noqa: E402
from test_multimodal import (  # noqa: E402
    _make_bmp,
    _make_png_v2,
    _make_tiff,
    _make_wav,
)

OK_TYPES = (ValueError, NotImplementedError)


def _mutations(payload: bytes, rng: np.random.RandomState, n: int):
    """Deterministic corpus of corrupted variants."""
    L = len(payload)
    for _ in range(n):
        kind = rng.randint(4)
        b = bytearray(payload)
        if kind == 0:  # single byte overwrite
            b[rng.randint(L)] = rng.randint(256)
        elif kind == 1:  # burst overwrite
            at = rng.randint(L)
            for j in range(at, min(L, at + 8)):
                b[j] = rng.randint(256)
        elif kind == 2:  # truncation
            b = b[: rng.randint(1, L)]
        else:  # insertion
            at = rng.randint(L)
            b = b[:at] + bytes([rng.randint(256)]) + b[at:]
        yield bytes(b)


def _payloads():
    rng = np.random.RandomState(101)
    g = _gradient(16, 16)
    px = rng.randint(0, 256, (5, 4, 3)).astype(np.uint8)
    idx = rng.randint(0, 4, (4, 6)).astype(np.uint8)
    pal = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    return {
        "jpeg_baseline": _encode_gray(g),
        "jpeg_progressive": _encode_progressive_gray(g),
        "gif": _encode_gif(idx, pal),
        "gif_golden": GIF_GOLDEN,
        "png": _make_png_v2(px, 8, 2),
        "png_adam7": _make_png_v2(idx[..., None], 2, 3, palette=pal, interlace=1),
        "bmp": _make_bmp(3, 2, [[(1, 2, 3)] * 3, [(4, 5, 6)] * 3]),
        "ppm": b"P6\n4 3\n255\n" + bytes(range(36)),
        "tiff": _make_tiff(px, packbits=True, rows_per_strip=2),
    }


@pytest.mark.parametrize("name", sorted(_payloads()))
def test_image_decoders_never_leak_raw_exceptions(name):
    payload = _payloads()[name]
    rng = np.random.RandomState(sum(payload[:16]))
    ok = bad = 0
    for mutated in _mutations(payload, rng, 400):
        try:
            w, h, img = decode_image(mutated)
            assert img.dtype == np.uint8 and img.shape == (h, w, 3)
            ok += 1
        except OK_TYPES:
            bad += 1
        # anything else propagates and fails the test with its real type
    assert ok + bad == 400


def test_wav_decoder_contract():
    """decode_audio normalizes EVERY wave-module failure (wave.Error,
    EOFError, the bare RuntimeError its Chunk.seek raises on truncation)
    to ValueError — the r10 fuzz finding that motivated the wrap."""
    payload = _make_wav(n_frames=64)
    rng = np.random.RandomState(7)
    for mutated in _mutations(payload, rng, 300):
        try:
            decode_audio(mutated)
        except OK_TYPES:
            pass


def test_audio_extract_survives_corrupt_record(spark):
    """One corrupt WAV in a batch must not poison its neighbors: the bad
    record yields a zeroed row, the good one real features."""
    import pandas as pd

    from surge_spark.operators.multimodal import extract_audio_features

    good = _make_wav(n_frames=64)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1, 2],
                "payload": [good, good[:20]],
                "mime": ["audio/wav"] * 2,
            }
        )
    )
    out = extract_audio_features(df).toPandas().set_index("id")
    assert out.loc[1].n_frames == 64
    assert out.loc[2].n_frames == 0 and list(out.loc[2].feat) == [0.0] * 4


def test_warc_parser_contract():
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nhello"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://a/\r\n"
        + b"Content-Length: %d\r\n\r\n" % len(body)
        + body
        + b"\r\n\r\n"
    )
    for payload in (rec + rec, gzip.compress(rec) + gzip.compress(rec)):
        rng = np.random.RandomState(11)
        for mutated in _mutations(payload, rng, 400):
            try:
                parse_warc(mutated)
            except OK_TYPES:
                pass


def test_mp4_demux_contract():
    """parse_mp4's caller (sample_frames) catches (ValueError,
    NotImplementedError, struct.error, IndexError, KeyError) — mutated
    containers must stay inside that set (no OverflowError/MemoryError/
    hangs)."""
    import struct

    from test_multimodal import _make_mp4

    from surge_spark.operators.mp4 import parse_mp4

    frames = [b"FRAME-%d" % i * 3 for i in range(4)]
    payload = _make_mp4(frames, timescale=1000, delta=250, syncs=(1, 3))
    rng = np.random.RandomState(13)
    ok = bad = 0
    for mutated in _mutations(payload, rng, 400):
        try:
            info = parse_mp4(mutated)
            assert isinstance(info["samples"], list)
            ok += 1
        except (ValueError, NotImplementedError, struct.error, IndexError, KeyError):
            bad += 1
    # both outcomes must actually occur: some mutations (e.g. inside
    # frame payloads) still parse, some corrupt the tables — an all-ok or
    # all-reject regression would be suspicious either way
    assert ok > 0 and bad > 0, (ok, bad)


def test_sitemap_parser_contract():
    import gzip as _gz

    from surge_spark.operators.ingest import parse_sitemap

    xml = (
        b'<?xml version="1.0"?>'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + b"".join(
            b"<url><loc>http://a/%d</loc><lastmod>2024-01-01</lastmod></url>" % i
            for i in range(6)
        )
        + b"</urlset>"
    )
    for payload in (xml, _gz.compress(xml)):
        rng = np.random.RandomState(17)
        for mutated in _mutations(payload, rng, 400):
            try:
                parse_sitemap(mutated)
            except OK_TYPES:
                pass


def test_hpack_decoder_contract():
    """The HPACK decoder parses untrusted NETWORK bytes — 400 mutations
    of a representative header block (indexed fields, literals with and
    without indexing, Huffman-coded literals, a table-size update) must
    decode or raise ValueError, never IndexError/UnicodeDecodeError (a
    wire peer could otherwise crash the connection handler with a
    non-protocol exception)."""
    from surge_spark.streaming.h2c import HpackDecoder, hpack_encode

    base = hpack_encode(
        [
            (":method", "POST"),
            (":path", "/x.Y/Process"),
            ("content-type", "application/grpc"),
            ("x-custom", "abc123"),
        ],
        huffman=True,
    )
    # prepend a table-size update and an incremental-indexing literal so
    # the 0x20 and 0x40 opcode paths are inside the fuzzed region
    block = b"\x20" + b"\x40\x03abc\x02xy" + base
    dec = HpackDecoder()
    assert dec.decode(block)[0] == ("abc", "xy")  # the crafted block is valid
    rng = np.random.RandomState(19)
    for mutated in _mutations(block, rng, 400):
        try:
            out = HpackDecoder().decode(mutated)
            assert all(isinstance(n, str) and isinstance(v, str) for n, v in out)
        except OK_TYPES:
            pass


def test_proto_wire_contract():
    """proto3 message decode over untrusted wire bytes: mutations must
    parse or raise ValueError — a mutated string field previously leaked
    UnicodeDecodeError out of the connection handler."""
    from surge_spark.streaming.proto_wire import (
        decode_kv,
        decode_process_command_request,
        encode_process_command_request,
    )

    payload = encode_process_command_request(
        "agg-42", b"\x01\x02state", b'{"kind":"credit","amount":5}'
    )
    rng = np.random.RandomState(23)
    for mutated in _mutations(payload, rng, 400):
        for fn in (decode_process_command_request, decode_kv):
            try:
                fn(mutated)
            except OK_TYPES:
                pass
