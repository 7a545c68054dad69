"""Multimodal (image/audio/video) column handling.

Opaque ``binary`` payload + typed metadata columns; all pixel/sample work in
Arrow ``mapInPandas`` stages with explicit schemas and bounded batch sizes
(the Spark-side plumbing is real and tested; decoders for container formats
that need codec libraries are STUBBED — the sandbox has no Pillow/ffmpeg).

Real decoders: raw / ppm / qraw / png (functions/imaging.py — png is genuine
zlib-compressed RFC 2083) — used by the crawl pipeline. Stubbed:
jpeg/webp/mp3/wav/mp4 → NotImplementedError with the exact Arrow-stage shape
already in place, so wiring a real codec is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import imaging

STUB_FORMATS = frozenset({"jpeg", "webp", "mp3", "wav", "mp4"})

META_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def decode_pixels(body: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt in STUB_FORMATS:
        raise NotImplementedError(
            f"codec for {fmt!r} requires an image/audio library not present "
            "in this environment; plug a decoder into operators/multimodal.py"
        )
    return imaging.decode(body, w, h, fmt)


def image_features(images: DataFrame) -> DataFrame:
    """Decode + per-channel means + phash over an images table
    (image_id, bytes, w, h, fmt). One Arrow pass; numpy per element."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, body, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    px = decode_pixels(bytes(body), int(w), int(h), fmt)
                    m = px.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (iid, len(body), float(m[0]), float(m[1]), float(m[2]),
                         imaging.phash64(px))
                    )
                except NotImplementedError:
                    rows.append((iid, len(body), None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        batches, schema=META_SCHEMA
    )


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize inside Arrow batches; output stays `raw`."""

    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType(), False),
            T.StructField("bytes", T.BinaryType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("fmt", T.StringType(), False),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, body, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                px = decode_pixels(bytes(body), int(w), int(h), fmt)
                yi = (np.arange(out_h) * int(h) // out_h).clip(0, int(h) - 1)
                xi = (np.arange(out_w) * int(w) // out_w).clip(0, int(w) - 1)
                rz = px[np.ix_(yi, xi)]
                rows.append((iid, imaging.encode(rz, "raw"), out_w, out_h, "raw"))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        batches, schema=out_schema
    )


def frame_sample_stub(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB. The Spark plumbing (schema, explode of
    sampled frame indices, partitioning by video) is real; the frame decode
    raises until a codec is plugged in."""
    frames = videos.select(
        "video_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
        "bytes",
        "fmt",
    )

    out_schema = T.StructType(
        [
            T.StructField("video_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            raise NotImplementedError(
                "video frame decode requires ffmpeg-like codec; stub per sandbox"
            )

    return frames.mapInPandas(batches, schema=out_schema)
