"""Multimodal plumbing: real decode lanes + stubbed codec lanes."""

from __future__ import annotations

import numpy as np
import pytest

from europarl_crawler_spark.functions import imaging
from europarl_crawler_spark.operators import multimodal


@pytest.fixture(scope="module")
def images(spark):
    rows = []
    for i, fmt in enumerate(["raw", "ppm", "qraw"]):
        rng = np.random.Generator(np.random.Philox(key=i))
        px = rng.integers(0, 256, size=(16, 8, 3), dtype=np.uint8)
        rows.append((f"img{i}", bytearray(imaging.encode(px, fmt)), 8, 16, fmt))
    rows.append((f"imgjpeg", bytearray(b"\xff\xd8fakejpeg"), 8, 16, "jpeg"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_image_features(images):
    got = {r.image_id: r for r in multimodal.image_features(images).collect()}
    assert len(got) == 4
    for i in range(3):
        r = got[f"img{i}"]
        assert r.mean_r is not None and 0 <= r.mean_r <= 255
        assert r.phash is not None
    # stub format passes through with null features, not a crash
    assert got["imgjpeg"].phash is None
    assert got["imgjpeg"].n_bytes == len(b"\xff\xd8fakejpeg")


def test_resize(images):
    decodable = images.filter("fmt != 'jpeg'")
    out = {r.image_id: r for r in multimodal.resize_images(decodable, 4, 4).collect()}
    for r in out.values():
        assert (r.w, r.h, r.fmt) == (4, 4, "raw")
        px = imaging.decode(bytes(r.bytes), 4, 4, "raw")
        assert px.shape == (4, 4, 3)


def test_stub_raises_for_videos(spark):
    videos = spark.createDataFrame(
        [("v1", bytearray(b"notavideo"), "mp4", 90)],
        "video_id string, bytes binary, fmt string, n_frames int",
    )
    with pytest.raises(Exception):
        # surfaces as a PythonException wrapping the NotImplementedError
        multimodal.frame_sample_stub(videos).collect()
