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
