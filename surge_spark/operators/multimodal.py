"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schema, partition sizing, UDF
signature, batch shape. The actual media decode is STUBBED (this container
has no image/audio libraries): ``decode_image`` raises NotImplementedError
unless a library is importable, and ``extract_features`` uses a deterministic
fake decoder so pipelines are end-to-end testable. Swapping in a real decoder
is a one-function change.

At 100 TB: binary payloads dominate row size, so feature extraction runs
mapInPandas (no shuffle) and downstream analytics select only the small
metadata/feature columns — column pruning keeps the binary out of every
subsequent scan.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def decode_image(payload: bytes) -> object:
    """Decode an image payload. STUB: no imaging library in this container."""
    try:
        import PIL.Image  # noqa: F401  (not installed here; gate, don't assume)
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. Pillow); "
            "not available in this environment"
        ) from e
    raise NotImplementedError("real decode path not wired in this build")


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
    re-scan it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
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


RESIZE_SCHEMA = (
    "id long, mime string, payload binary, width int, height int, "
    "orig_width int, orig_height int"
)


def resize_images(df: DataFrame, max_side: int, id_col: str = "id") -> DataFrame:
    """Resize every image so its longer side is ``max_side`` (aspect
    preserved, never upscaled) — the standard normalize-before-training
    step. Same honest split as extract_features: the mapInPandas batch
    shape, 1:1 row contract, and metadata math are real; the pixel resample
    is the deterministic fake decoder (no imaging library here), with the
    payload passed through opaque. A real decoder changes only the body of
    ``work``."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
                ow, oh, _ = _fake_decode(payload)
                scale = min(1.0, max_side / max(ow, oh))
                rows.append(
                    {
                        "id": rec[1],
                        "mime": rec.mime,
                        "payload": payload,  # real decoder: resampled bytes
                        "width": max(1, int(ow * scale)),
                        "height": max(1, int(oh * scale)),
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

    Fake decoder: 'duration' is derived from payload length (1 byte = 1 ms)
    and each 'frame' is a deterministic 16-byte slice at its timestamp. A
    real build swaps in a container demuxer; the fan-out contract and
    schema stay identical."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
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
