"""Multimodal plumbing tests: the Spark-side schema/partitioning/Arrow
batch shape is real; the decoders are deterministic fakes (media libs
absent by design — see operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topn_spark.operators.multimodal import (
    ASSET_SCHEMA,
    decode_image,
    extract_features,
    read_binary_dir,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        ("img1", "image", b"\x89PNG-fake-1", ("png", None, None, None, None)),
        ("img2", "image", b"\x89PNG-fake-22", ("png", None, None, None, None)),
        ("vid1", "video", b"RIFF-fake", ("avi", None, None, 3500, None)),
        ("empty", "image", None, ("png", None, None, None, None)),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_decode_image_fake(assets):
    out = {r.asset_id: r for r in decode_image(assets, fake=True).collect()}
    assert out["img1"].width != out["img2"].width or out["img1"].height != out["img2"].height
    assert out["img1"].n_bytes == 11
    assert out["empty"].n_bytes == 0
    # determinism
    again = {r.asset_id: r for r in decode_image(assets, fake=True).collect()}
    assert out["img1"].width == again["img1"].width


def test_decode_image_real_is_stubbed(assets):
    with pytest.raises(Exception) as ei:
        decode_image(assets, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or "PIL" in str(ei.value)


def test_extract_features_unit_norm(assets):
    out = extract_features(assets, fake=True).collect()
    for r in out:
        assert len(r.features) == 16
        norm = sum(x * x for x in r.features) ** 0.5
        assert abs(norm - 1.0) < 1e-5


def test_sample_frames_fanout(assets):
    frames = sample_frames(
        assets.where(F.col("modality") == "video"), every_ms=1000, fake=True
    ).collect()
    assert len(frames) == 3  # 3500ms // 1000
    assert [f.frame_idx for f in frames] == [0, 1, 2]
    assert len({f.frame_digest for f in frames}) == 3


def test_read_binary_dir(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(b"fake-png-bytes")
    (tmp_path / "b.jpg").write_bytes(b"fake-jpg")
    df = read_binary_dir(spark, str(tmp_path), glob="*.png")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].meta.format == "png"
    assert rows[0].payload == b"fake-png-bytes"
    assert df.schema["payload"].dataType.typeName() == "binary"
