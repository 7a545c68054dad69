"""Multimodal (image/audio/video) column handling.

Opaque ``binary`` payload + typed metadata columns; all pixel/sample work in
Arrow ``mapInPandas`` stages with explicit schemas and bounded batch sizes
(the Spark-side plumbing is real and tested; decoders for container formats
that need codec libraries are STUBBED — the sandbox has no Pillow/ffmpeg).

Real decoders: raw / ppm / qraw / png / jpeg / gif for images
(functions/imaging.py — png is genuine zlib RFC 2083, jpeg is genuine
baseline T.81/JFIF with DCT + Huffman, functions/jpegkit.py, gif is full
variable-width LZW, functions/gifkit.py), wav (PCM, stdlib ``wave``),
adpcm (IMA ADPCM WAV tag 0x11, 4:1 lossy — functions/adpcmkit.py), and
flac (RFC 9639 lossless — rice-coded predictors, functions/flackit.py)
for audio, and y4m (YUV4MPEG2, functions/videokit.py — real BT.601 + 4:2:0
chroma subsampling) plus avi (Motion-JPEG in a RIFF AVI container —
functions/avikit.py) for video — used by the crawl pipeline and the
feature lanes.

Images additionally decode webp (real VP8L lossless, RFC 9649 —
functions/webpkit.py). Container-level metadata for mp3 and mp4 is REAL
(``media_probe`` — MPEG frame-header walk in functions/mp3kit.py, ISO
BMFF box walk in functions/mp4kit.py: dims, frame counts, fps,
samplerate, bitrate, duration). mp3 SAMPLE decode is real as of r4
(functions/mp3codec.py — Layer III side info/Huffman/requantization/
alias reduction/IMDCT/polyphase, with a declared synthesis-window
boundary); only entropy-coded video (H.264/H.265) remains a
NotImplementedError stub, with the exact Arrow-stage shape in place so
wiring a codec is a one-function change.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import adpcmkit, avikit, flackit, imaging, mp3codec, mp3kit, mp4kit, videokit

# mp3 AUDIO decode is real as of r4 (functions/mp3codec.py — Layer III
# side info, Huffman, requantization, alias reduction, IMDCT, polyphase;
# see its module docstring for the declared synthesis-window boundary);
# mp4 VIDEO decode is real for mjpg samples (mp4kit.mp4_decode via the
# frame_sample lane). Neither is a PIXEL format, so the image-decode
# dispatch below still routes both to the honest NotImplementedError.
STUB_FORMATS = frozenset({"mp3", "mp4"})

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
            f"{fmt!r} is not a pixel format: mp3 decodes via mp3_pcm_decode "
            "(audio), mp4 MJPEG samples via mp4kit.mp4_decode (video); "
            "entropy-coded video (h264/h265) stays a declared stub"
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
                except (NotImplementedError, ValueError, AssertionError):
                    # stubbed codec OR corrupt payload → null features; a
                    # feature pass over a web-scale crawl must not die on a
                    # truncated download
                    rows.append((iid, len(body), None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA.fields])

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        batches, schema=META_SCHEMA
    )


QUALITY_RAW_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("n_px", T.LongType(), True),
        T.StructField("sum_y", T.LongType(), True),
        T.StructField("min_y", T.IntegerType(), True),
        T.StructField("max_y", T.IntegerType(), True),
    ]
)


def image_quality(
    images: DataFrame,
    dark_max: int = 40,
    bright_min: int = 215,
    flat_max: int = 16,
) -> DataFrame:
    """Image quality scoring for training-data curation — the image-side
    analog of the text lane's quality filter (operators/textstats.py):
    decode → INTEGER BT.601 luma stats → keep/drop verdict. The Arrow stage
    emits only raw integer sums (n_px, sum_y, min_y, max_y); mean, contrast,
    and the verdict are Catalyst column expressions on top — the decision
    logic stays JVM-side, declarative, and bit-exactly oracle-mirrorable
    (no float crosses the Arrow boundary).

    Output: (image_id, n_px, mean_luma, contrast, is_dark, is_bright,
    is_flat, keep). Undecodable payloads keep their row with null stats and
    keep=false — a curation pass must neither die on nor silently admit a
    truncated download."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for iid, body, w, h, fmt in zip(
                pdf["image_id"], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    px = decode_pixels(bytes(body), int(w), int(h), fmt)
                except (NotImplementedError, ValueError, AssertionError):
                    rows.append((iid, None, None, None, None))
                    continue
                p = px.astype(np.int64)
                # the videokit/imagedup integer luma — one arithmetic, all lanes
                y = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2] + 128) >> 8
                rows.append(
                    (iid, int(y.size), int(y.sum()), int(y.min()), int(y.max()))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in QUALITY_RAW_SCHEMA.fields]
            )

    raw = images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        batches, schema=QUALITY_RAW_SCHEMA
    )
    return quality_verdict(raw, dark_max, bright_min, flat_max)


def quality_verdict(
    raw: DataFrame,
    dark_max: int = 40,
    bright_min: int = 215,
    flat_max: int = 16,
) -> DataFrame:
    """The Catalyst half of ``image_quality`` — verdict algebra over a raw
    integer-sums frame (image_id, n_px, sum_y, min_y, max_y). Factored out so
    a fused curation lane can compute the sums in a SHARED Arrow stage
    (alongside perceptual hashes and alignment histograms) and still reuse
    the exact oracle-checked decision logic."""
    mean_luma = (F.col("sum_y") / F.col("n_px")).cast("long")  # floor: all >= 0
    contrast = F.col("max_y") - F.col("min_y")
    is_dark = mean_luma < dark_max
    is_bright = mean_luma > bright_min
    is_flat = contrast < flat_max
    return raw.select(
        "image_id",
        "n_px",
        mean_luma.alias("mean_luma"),
        contrast.alias("contrast"),
        is_dark.alias("is_dark"),
        is_bright.alias("is_bright"),
        is_flat.alias("is_flat"),
        (
            F.col("n_px").isNotNull() & ~is_dark & ~is_bright & ~is_flat
        ).alias("keep"),
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


def wav_encode(samples: np.ndarray, framerate: int = 16000) -> bytes:
    """Mono 16-bit PCM samples → WAV bytes (stdlib ``wave`` — a real RIFF
    container, readable by any audio tool)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_decode(body: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (mono int16 samples, framerate). Real PCM decode via
    stdlib ``wave``; multi-channel input is averaged to mono. Compressed
    audio (mp3/…) stays stubbed — see STUB_FORMATS."""
    if len(body) >= 8:
        (riff_size,) = struct.unpack_from("<I", body, 4)
        if riff_size != len(body) - 8:
            raise ValueError("wav: truncated container (RIFF size mismatch)")
    try:
        with wave.open(io.BytesIO(body), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError("wav: only 16-bit PCM supported")
            n = w.getnframes()
            ch = w.getnchannels()
            raw = np.frombuffer(w.readframes(n), dtype="<i2")
            if len(raw) != n * ch:
                # the data chunk header promised more frames than the body holds
                raise ValueError("wav: truncated data chunk")
            if ch > 1:
                raw = raw.reshape(-1, ch).mean(axis=1).astype(np.int16)
            return raw, w.getframerate()
    except (wave.Error, EOFError) as e:
        raise ValueError(f"wav: malformed stream ({e})") from e


def flac_pcm_decode(body: bytes) -> tuple[np.ndarray, int]:
    """flac bytes → (int16 samples, framerate) via the real lossless decoder
    (functions/flackit.py, RFC 9639). Stereo is interleaved to the shared
    1-D int16 lane so every downstream audio operator (features,
    fingerprints, dedup) runs unchanged on decoded flac."""
    s, fr = flackit.flac_decode(body)
    return s.reshape(-1), fr


def mp3_pcm_decode(body: bytes) -> tuple[np.ndarray, int]:
    """mp3 bytes → (mono int16 samples, framerate) via the real Layer III
    decoder (functions/mp3codec.py). The filterbank's float output is scaled
    to the int16 lane the wav/adpcm decoders share (×8192, round-half-even —
    deterministic), so every downstream audio operator (features,
    fingerprints, dedup) runs unchanged on decoded mp3."""
    dec = mp3codec.mp3_decode(body)
    s = np.clip(np.rint(dec["samples"] * 8192.0), -32768, 32767).astype(np.int16)
    return s, int(dec["samplerate"])


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("framerate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_cross_rate", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def audio_features(audios: DataFrame) -> DataFrame:
    """Audio feature extraction over (audio_id, bytes, fmt): real decode for
    wav (PCM, lossless), adpcm (IMA ADPCM, 4:1 lossy — adpcmkit), and mp3
    (Layer III — mp3codec); nulls for unknown formats. One Arrow pass; the
    per-element numpy work is sample math, not Python row logic — the same
    stage shape as ``image_features``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for aid, body, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                body = bytes(body)
                decoder = {
                    "wav": wav_decode,
                    "adpcm": adpcmkit.adpcm_wav_decode,
                    "mp3": mp3_pcm_decode,
                    "flac": flac_pcm_decode,
                }.get(fmt)
                try:
                    if decoder is None:
                        raise ValueError(f"unknown audio format {fmt!r}")
                    s, fr = decoder(body)
                except (NotImplementedError, ValueError):
                    # same contract as image_quality: a truncated/alien
                    # download keeps its row with null features, never
                    # kills the stage and never silently passes curation
                    rows.append((aid, len(body), None, None, None, None, None, None))
                    continue
                x = s.astype(np.float64)
                n = len(s)
                zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append(
                    (
                        aid,
                        len(body),
                        n,
                        fr,
                        round(n / fr, 6),
                        round(float(np.sqrt(np.mean(x**2))) if n else 0.0, 6),
                        round(zc / max(n - 1, 1), 6),
                        int(np.max(np.abs(x))) if n else 0,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return audios.select("audio_id", "bytes", "fmt").mapInPandas(
        batches, schema=AUDIO_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("mean_y", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)


def frame_sample(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling over (video_id, bytes, fmt): REAL decode for y4m
    (YUV4MPEG2 — functions/videokit.py, genuine BT.601 + 4:2:0 container),
    avi (Motion-JPEG in RIFF AVI — functions/avikit.py), and mp4 holding
    Motion-JPEG samples (``mjpg`` — functions/mp4kit.py walks stsz/stsc/stco
    and jpeg-decodes every sample); every compressed frame is a genuine
    baseline-JPEG bitstream. ``NotImplementedError`` for entropy-coded
    codecs (h264/h265 — no ffmpeg in the sandbox; the Arrow-stage shape is
    identical, so plugging a codec is a one-function change).
    Emits every ``every_n``-th frame with luma mean (y4m: from the encoded
    Y plane — integer-exact, SQL-predictable; avi: the same BT.601 integer
    luma recomputed from the decoded RGB) and the 8×8-DCT perceptual hash
    of the decoded frame.

    One Arrow pass partitioned by video — at scale the decode parallelism is
    the video count, and a long-tail video only ever costs its own task."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for vid, body, fmt in zip(pdf["video_id"], pdf["bytes"], pdf["fmt"]):
                body = bytes(body)
                if fmt == "y4m":
                    frames, _fps = videokit.y4m_decode(body)
                    lumas = videokit.y4m_luma_planes(body)
                elif fmt in ("avi", "mp4"):
                    frames, _fps = (
                        avikit.avi_decode(body)
                        if fmt == "avi"
                        else mp4kit.mp4_decode(body)
                    )
                    p = frames.astype(np.int64)
                    lumas = (
                        77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2] + 128
                    ) >> 8
                else:
                    raise NotImplementedError(
                        f"video codec '{fmt}' requires ffmpeg-like decoder; "
                        "stub per sandbox (y4m/avi/mp4-mjpg are the real lanes)"
                    )
                n, h, w, _ = frames.shape
                for idx in range(0, n, every_n):
                    rows.append(
                        (
                            vid,
                            idx,
                            w,
                            h,
                            round(float(lumas[idx].astype(np.float64).mean()), 6),
                            imaging.phash64(frames[idx]),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return videos.select("video_id", "bytes", "fmt").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def frame_sample_stub(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Back-compat alias: the lane is real now (see ``frame_sample``)."""
    return frame_sample(videos, every_n)


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.IntegerType(), True),
        T.StructField("samplerate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bitrate_kbps", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("ok", T.BooleanType(), False),
    ]
)


def _probe_one(body: bytes, fmt: str) -> dict:
    """Container/frame-header metadata WITHOUT sample decode — the O(kB)
    pass a 100 TB pipeline runs over every media blob before deciding what
    to decode. Real parsers for wav/adpcm (RIFF fmt+fact), mp3 (frame-header
    walk, mp3kit), y4m (stream header), avi (avih/strh, avikit), and mp4
    (ISO BMFF box walk, mp4kit)."""
    import struct as _struct

    if fmt == "ogg":
        from ..functions import oggkit

        p = oggkit.ogg_probe(body)
        return dict(
            kind="audio", samplerate=p["samplerate"], channels=p["channels"],
            n_frames=p["n_packets"], duration_ms=p["duration_ms"],
        )
    if fmt in ("png", "jpeg", "gif", "webp", "bmp", "tiff", "qoi", "ppm"):
        from ..functions import sniff

        sfmt, w, h = sniff.image_dims(body)
        if sfmt != fmt:
            raise ValueError(f"probe: bytes sniff as {sfmt!r}, not {fmt!r}")
        return dict(kind="image", w=w, h=h)
    if fmt == "flac":
        p = flackit.flac_probe(body)
        return dict(
            kind="audio", samplerate=p["samplerate"], channels=p["channels"],
            n_frames=p["n_samples"], duration_ms=p["duration_ms"],
        )
    if fmt == "mp3":
        p = mp3kit.mp3_probe(body)
        return dict(
            kind="audio", samplerate=p["samplerate"], channels=p["channels"],
            bitrate_kbps=p["bitrate_kbps"], duration_ms=p["duration_ms"],
            n_frames=p["n_frames"],
        )
    if fmt == "mp4":
        p = mp4kit.mp4_probe(body)
        return dict(
            kind="video", w=p["w"], h=p["h"], n_frames=p["n_samples"],
            fps=p["fps"], duration_ms=p["duration_ms"],
        )
    if fmt == "avi":
        w, h, n, fps = avikit.avi_header_info(body)
        return dict(
            kind="video", w=w, h=h, n_frames=n, fps=fps,
            duration_ms=n * 1000 // fps if fps else None,
        )
    if fmt == "y4m":
        w, h, fps, n = videokit.y4m_parse_header(body)
        return dict(
            kind="video", w=w, h=h, n_frames=n, fps=fps,
            duration_ms=n * 1000 // fps if fps else None,
        )
    if fmt in ("wav", "adpcm"):
        if body[:4] != b"RIFF" or body[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        pos, fmt_c, fact, data_len = 12, None, None, None
        while pos + 8 <= len(body):
            cid = body[pos : pos + 4]
            (size,) = _struct.unpack_from("<I", body, pos + 4)
            if cid == b"fmt ":
                fmt_c = body[pos + 8 : pos + 8 + size]
            elif cid == b"fact":
                (fact,) = _struct.unpack_from("<I", body, pos + 8)
            elif cid == b"data":
                data_len = size
            pos += 8 + size + (size % 2)
        if fmt_c is None or data_len is None:
            raise ValueError("missing fmt/data chunk")
        tag, ch, rate, abps, balign, bits = _struct.unpack_from("<HHIIHH", fmt_c, 0)
        if tag == 0x0011:  # IMA ADPCM: fact carries the true sample count
            n_samples = fact if fact is not None else 0
        else:  # PCM
            n_samples = data_len // (ch * (bits // 8))
        return dict(
            kind="audio", samplerate=rate, channels=ch,
            bitrate_kbps=abps * 8 // 1000,
            duration_ms=n_samples * 1000 // rate if rate else None,
        )
    raise NotImplementedError(f"no prober for format {fmt!r}")


def media_probe(media: DataFrame) -> DataFrame:
    """Media metadata over (media_id, bytes, fmt): one Arrow pass of
    header-only parsing (no sample decode — O(kB) per payload regardless of
    media size). Corrupt or unknown payloads yield ok=false with null
    fields; a metadata pass over a web-scale crawl must not die on a
    truncated download. This is the lane that makes the mp3/mp4 formats
    REAL at the container level while their sample decoders remain declared
    stubs (no Layer III filterbank / H.264 in the sandbox)."""

    cols = [f.name for f in PROBE_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, body, fmt in zip(pdf["media_id"], pdf["bytes"], pdf["fmt"]):
                base = {c: None for c in cols}
                base.update(media_id=mid, fmt=fmt, ok=False)
                try:
                    base.update(_probe_one(bytes(body), fmt), ok=True)
                except (NotImplementedError, ValueError, IndexError,
                        KeyError, EOFError):
                    pass
                rows.append(tuple(base[c] for c in cols))
            yield pd.DataFrame(rows, columns=cols)

    return media.select("media_id", "bytes", "fmt").mapInPandas(
        batches, schema=PROBE_SCHEMA
    )


# (bucket_idx, ar_w, ar_h) — the NaViT/SDXL-style training shapes; a trainer
# groups batches by bucket so every sample in a batch shares one canvas
AR_BUCKETS: list[tuple[int, int, int]] = [
    (0, 1, 1),
    (1, 4, 3),
    (2, 3, 4),
    (3, 16, 9),
    (4, 9, 16),
]


def ar_bucket_assign(
    images: DataFrame, buckets: list[tuple[int, int, int]] = AR_BUCKETS
) -> DataFrame:
    """Aspect-ratio bucketing for multimodal training — assign every image
    (image_id, w, h) to its nearest aspect-ratio bucket, the batch-composition
    step image trainers run so a batch shares one canvas shape.

    Nearest is by ratio QUOTIENT (max/min of w·b vs h·a — the scale-free
    measure whose ordering equals |log(w/h) − log(a/b)|), quantized to 1e-6
    in EXACT integer arithmetic: q = (max·10⁶) div min. Ties take the lowest
    bucket index via one fused min over q·100+idx. No floats anywhere, so the
    assignment is bit-identical across engines and re-runs.

    Plan: broadcast cross join against the |buckets|-row dimension, one
    map-side-combinable min aggregate keyed by image — at 10⁹ images this is
    a single shuffle of (image_id, long) pairs. Output: (image_id, w, h,
    bucket_idx, bucket_ar)."""
    spark = images.sparkSession
    bdf = spark.createDataFrame(buckets, "bidx int, ba int, bb int")
    q = F.expr("(greatest(w * cast(bb as bigint), h * cast(ba as bigint)) * 1000000L) "
               "div least(w * cast(bb as bigint), h * cast(ba as bigint))")
    combined = (q * 100 + F.col("bidx")).alias("_c")
    best = (
        images.select("image_id", "w", "h")
        .crossJoin(F.broadcast(bdf))
        .select("image_id", "w", "h", combined)
        .groupBy("image_id", "w", "h")
        .agg(F.min("_c").alias("_m"))
        .select(
            "image_id",
            "w",
            "h",
            (F.col("_m") % 100).cast("int").alias("bucket_idx"),
        )
    )
    label = F.create_map(
        *[x for i, a, b in buckets for x in (F.lit(i), F.lit(f"{a}:{b}"))]
    )
    return best.withColumn("bucket_ar", label[F.col("bucket_idx")])
