"""Pure-stdlib ISO-BMFF (MP4) demuxer for the video frame-sampling path.

Why this exists: frame sampling was the last multimodal operator whose
container handling was entirely fake. Demuxing — unlike codec DECODE —
is fully self-contained spec work (ISO/IEC 14496-12 box structures, all
length-prefixed big-endian), the same class as the HPACK Huffman table
and the baseline JPEG decoder: parse the sample tables and every
sample's true byte range, timestamp, and keyframe flag falls out, no
codec library involved. Frame PIXELS decode for real when the track is
MJPEG (every sample is a standalone JPEG — operators.jpeg handles it,
see multimodal.extract_frame_features); H.264/H.265 entropy decode is a
codec, honestly gated as before. A demuxer's
output is the coded sample bytes plus timing, which is exactly what a
training pipeline's frame-sampling stage needs to select and route
frames before a decode stage.

Supported: unfragmented MP4/MOV ('moov' sample tables: mdhd/hdlr/stsd/
stts/stss/stsz/stz2-less, stsc, stco/co64), 32- and 64-bit box sizes,
first video ('vide') track preferred. Fragmented MP4 (moof) raises
NotImplementedError — callers fall back like any undecodable payload.
"""

from __future__ import annotations

import struct


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for the boxes in [start, end)."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", buf[i : i + 4])
        fourcc = buf[i + 4 : i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", buf[i + 8 : i + 16])
            body = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError("corrupt MP4 box size")
        yield fourcc, body, i + size
        i += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for fc, b, e in _iter_boxes(buf, start, end):
        if fc == fourcc:
            return b, e
    return None


def parse_mp4(payload: bytes) -> dict:
    """Parse the first video track's sample table. Returns::

        {"codec": str, "timescale": int, "duration_ms": float,
         "samples": [(offset, size, ts_ms, is_sync), ...]}

    ``offset``/``size`` are the sample's true byte range in the payload
    (mdat-resident coded frame), ``ts_ms`` its decode timestamp,
    ``is_sync`` the stss keyframe flag (all-sync when stss is absent).
    """
    n = len(payload)
    top = list(_iter_boxes(payload, 0, n))
    if not any(fc == b"ftyp" for fc, _b, _e in top):
        raise ValueError("not an MP4 (no ftyp)")
    if any(fc == b"moof" for fc, _b, _e in top):
        raise NotImplementedError("fragmented MP4 (moof) unsupported")
    moov = next(((b, e) for fc, b, e in top if fc == b"moov"), None)
    if moov is None:
        raise ValueError("MP4 has no moov")
    tracks = [
        (b, e)
        for fc, b, e in _iter_boxes(payload, *moov)
        if fc == b"trak"
    ]
    chosen = None
    for tb, te in tracks:
        mdia = _find(payload, tb, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        handler = payload[hdlr[0] + 8 : hdlr[0] + 12] if hdlr else b""
        if handler == b"vide":
            chosen = mdia
            break
        if chosen is None:
            chosen = mdia  # fallback: first track with an mdia
    if chosen is None:
        raise ValueError("MP4 has no usable track")
    mdhd = _find(payload, *chosen, b"mdhd")
    if mdhd is None:
        raise ValueError("MP4 track has no mdhd")
    version = payload[mdhd[0]]
    if version == 1:
        (timescale,) = struct.unpack(">I", payload[mdhd[0] + 20 : mdhd[0] + 24])
    else:
        (timescale,) = struct.unpack(">I", payload[mdhd[0] + 12 : mdhd[0] + 16])
    minf = _find(payload, *chosen, b"minf")
    stbl = _find(payload, *minf, b"stbl") if minf else None
    if stbl is None:
        raise ValueError("MP4 track has no stbl")
    boxes = {fc: (b, e) for fc, b, e in _iter_boxes(payload, *stbl)}

    def body(fc: bytes) -> bytes | None:
        be = boxes.get(fc)
        return payload[be[0] : be[1]] if be else None

    # stsd: codec fourcc of the first sample description
    codec = "unknown"
    sd = body(b"stsd")
    if sd is not None and len(sd) >= 16:
        codec = sd[12:16].decode("latin-1")

    # decompression-bomb guard: every declared count is untrusted 32-bit
    # input, and the parser materializes per-sample lists — a ~100-byte
    # payload declaring 2^32 samples must be rejected as corrupt, not
    # allocated. A real MP4's sample tables cost bytes per sample (stsz
    # entries, mdat content), so payload size bounds any plausible count.
    max_samples = max(len(payload), 64)

    # stts: run-length (count, delta) -> per-sample decode times
    st = body(b"stts")
    if st is None:
        raise ValueError("MP4 track has no stts")
    (n_runs,) = struct.unpack(">I", st[4:8])
    if n_runs > max_samples:
        raise ValueError("implausible MP4 stts run count")
    deltas: list[int] = []
    for r in range(n_runs):
        cnt, delta = struct.unpack(">II", st[8 + r * 8 : 16 + r * 8])
        if cnt > max_samples or len(deltas) + cnt > max_samples:
            raise ValueError("implausible MP4 stts sample count")
        deltas.extend([delta] * cnt)

    # stsz: uniform or per-sample sizes
    sz = body(b"stsz")
    if sz is None:
        raise ValueError("MP4 track has no stsz")
    uniform, n_samples = struct.unpack(">II", sz[4:12])
    if n_samples > max_samples:
        raise ValueError("implausible MP4 sample count")
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(
            struct.unpack(f">{n_samples}I", sz[12 : 12 + 4 * n_samples])
        )

    # stsc: (first_chunk, samples_per_chunk) runs
    sc = body(b"stsc")
    if sc is None:
        raise ValueError("MP4 track has no stsc")
    (n_sc,) = struct.unpack(">I", sc[4:8])
    sc_runs = [
        struct.unpack(">III", sc[8 + r * 12 : 20 + r * 12])[:2]
        for r in range(n_sc)
    ]

    # stco / co64: chunk offsets
    co = body(b"stco")
    if co is not None:
        (n_chunks,) = struct.unpack(">I", co[4:8])
        chunk_offs = list(struct.unpack(f">{n_chunks}I", co[8 : 8 + 4 * n_chunks]))
    else:
        co = body(b"co64")
        if co is None:
            raise ValueError("MP4 track has no stco/co64")
        (n_chunks,) = struct.unpack(">I", co[4:8])
        chunk_offs = list(struct.unpack(f">{n_chunks}Q", co[8 : 8 + 8 * n_chunks]))

    # stss: sync samples (1-based); absent = every sample is sync
    ss = body(b"stss")
    if ss is not None:
        (n_ss,) = struct.unpack(">I", ss[4:8])
        syncs = set(struct.unpack(f">{n_ss}I", ss[8 : 8 + 4 * n_ss]))
    else:
        syncs = None

    # samples-per-chunk for every chunk from the stsc runs
    spc = []
    for idx, (first, per) in enumerate(sc_runs):
        last = (
            sc_runs[idx + 1][0] - 1 if idx + 1 < len(sc_runs) else n_chunks
        )
        spc.extend([per] * (last - first + 1))

    samples = []
    s = 0
    t = 0
    for ci, coff in enumerate(chunk_offs):
        off = coff
        for _ in range(spc[ci] if ci < len(spc) else 0):
            if s >= n_samples:
                break
            ts_ms = (t / timescale) * 1000.0 if timescale else 0.0
            is_sync = syncs is None or (s + 1) in syncs
            samples.append((off, sizes[s], ts_ms, is_sync))
            off += sizes[s]
            t += deltas[s] if s < len(deltas) else 0
            s += 1
    duration_ms = (sum(deltas) / timescale) * 1000.0 if timescale else 0.0
    return {
        "codec": codec,
        "timescale": timescale,
        "duration_ms": duration_ms,
        "samples": samples,
    }
