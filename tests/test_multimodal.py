"""Multimodal plumbing: binary payload wrapping, feature extraction, resize
metadata math, and the video frame fan-out contract (all over the
deterministic fake decoder — see operators.multimodal)."""

from __future__ import annotations

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
