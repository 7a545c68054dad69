"""Multimodal plumbing: real decode lanes + stubbed codec lanes."""

from __future__ import annotations

import numpy as np
import pytest

from europarl_crawler_spark.functions import imaging
from europarl_crawler_spark.operators import multimodal


@pytest.fixture(scope="module")
def images(spark):
    rows = []
    for i, fmt in enumerate(["raw", "ppm", "qraw", "jpeg"]):
        rng = np.random.Generator(np.random.Philox(key=i))
        px = rng.integers(0, 256, size=(16, 8, 3), dtype=np.uint8)
        rows.append((f"img{i}", bytearray(imaging.encode(px, fmt)), 8, 16, fmt))
    rows.append(("imgwebp", bytearray(b"RIFFfakewebp"), 8, 16, "webp"))
    rows.append(("imgcorrupt", bytearray(b"\xff\xd8truncated"), 8, 16, "jpeg"))
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )


def test_image_features(images):
    got = {r.image_id: r for r in multimodal.image_features(images).collect()}
    assert len(got) == 6
    # raw/ppm/qraw/jpeg all decode for real — jpeg included since jpegkit
    for i in range(4):
        r = got[f"img{i}"]
        assert r.mean_r is not None and 0 <= r.mean_r <= 255
        assert r.phash is not None
    # stub format and corrupt payload pass through with null features
    assert got["imgwebp"].phash is None
    assert got["imgcorrupt"].phash is None
    assert got["imgcorrupt"].n_bytes == len(b"\xff\xd8truncated")


def test_resize(images):
    decodable = images.filter("fmt != 'webp' AND image_id != 'imgcorrupt'")
    out = {r.image_id: r for r in multimodal.resize_images(decodable, 4, 4).collect()}
    for r in out.values():
        assert (r.w, r.h, r.fmt) == (4, 4, "raw")
        px = imaging.decode(bytes(r.bytes), 4, 4, "raw")
        assert px.shape == (4, 4, 3)


def test_image_quality_flags_and_nulls(spark):
    """Quality verdict per regime: dark, bright, flat, good — plus broken
    payloads keeping their row with keep=false (curation must not admit
    undecodable downloads)."""

    def flat(val):
        return np.full((16, 16, 3), val, dtype=np.uint8)

    good = np.zeros((16, 16, 3), dtype=np.uint8)
    good[:, :8] = 30   # left half dark, right half bright → mid mean,
    good[:, 8:] = 200  # high contrast
    rows = [
        ("dark", bytearray(imaging.encode(flat(10), "png")), 16, 16, "png"),
        ("bright", bytearray(imaging.encode(flat(250), "png")), 16, 16, "png"),
        ("flat", bytearray(imaging.encode(flat(128), "png")), 16, 16, "png"),
        ("good", bytearray(imaging.encode(good, "png")), 16, 16, "png"),
        ("broken", bytearray(b"\x89PNGnope"), 16, 16, "png"),
    ]
    images = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    got = {r.image_id: r for r in multimodal.image_quality(images).collect()}
    assert len(got) == 5
    assert got["dark"].is_dark and not got["dark"].keep
    assert got["bright"].is_bright and not got["bright"].keep
    assert got["flat"].is_flat and got["flat"].contrast == 0
    assert not got["flat"].keep
    g = got["good"]
    assert g.keep and not (g.is_dark or g.is_bright or g.is_flat)
    assert g.n_px == 256
    b = got["broken"]
    assert b.n_px is None and b.mean_luma is None and b.keep is False


def test_resize_hash_is_even_coordinate_subsample(spark):
    """NN 16×16→8×8 keeps exactly the even-coordinate pixels (i·16//8 = 2i),
    so the thumbnail's ahash must equal the hash of px[::2, ::2] — the
    arithmetic identity the image_resize_hash oracle relies on."""
    from europarl_crawler_spark.operators import imagedup

    rng = np.random.Generator(np.random.Philox(key=11))
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    images = spark.createDataFrame(
        [("a", bytearray(imaging.encode(px, "png")), 16, 16, "png")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    small = multimodal.resize_images(images, 8, 8)
    got = imagedup.image_hashes(small, kind="ahash").collect()
    assert len(got) == 1
    assert got[0].hash64 == imagedup.ahash64(px[::2, ::2])


def test_wav_roundtrip_exact():
    # WAV is lossless PCM: encode→decode must be bit-exact, framerate kept
    rng = np.random.Generator(np.random.Philox(key=7))
    s = rng.integers(-32768, 32768, size=441, dtype=np.int16)
    body = multimodal.wav_encode(s, 22050)
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    dec, fr = multimodal.wav_decode(body)
    assert fr == 22050
    assert np.array_equal(dec, s)


def test_wav_decode_stereo_averages_to_mono():
    import io
    import wave

    left = np.array([100, -200, 300], dtype=np.int16)
    right = np.array([300, 200, -100], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        inter = np.empty(6, dtype="<i2")
        inter[0::2], inter[1::2] = left, right
        w.writeframes(inter.tobytes())
    dec, fr = multimodal.wav_decode(buf.getvalue())
    assert fr == 8000
    assert np.array_equal(dec, ((left.astype(np.int64) + right) / 2).astype(np.int16))


def test_audio_features(spark):
    sine = (
        np.sin(2 * np.pi * 440 * np.arange(8000) / 8000) * 10000
    ).astype(np.int16)
    silence = np.zeros(100, dtype=np.int16)
    rows = [
        ("a_sine", bytearray(multimodal.wav_encode(sine, 8000)), "wav"),
        ("a_silence", bytearray(multimodal.wav_encode(silence, 8000)), "wav"),
        ("a_mp3", bytearray(b"ID3fakemp3"), "mp3"),
    ]
    audios = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    got = {r.audio_id: r for r in multimodal.audio_features(audios).collect()}
    assert len(got) == 3
    r = got["a_sine"]
    assert (r.n_samples, r.framerate, r.duration_s) == (8000, 8000, 1.0)
    # a 440 Hz tone crosses zero ~2*440 times/sec; RMS of A*sin is A/sqrt(2)
    assert abs(r.zero_cross_rate - 2 * 440 / 8000) < 0.01
    assert abs(r.rms - 10000 / np.sqrt(2)) < 10
    assert r.peak == 10000
    s = got["a_silence"]
    assert (s.rms, s.peak, s.zero_cross_rate) == (0.0, 0, 0.0)
    # stubbed compressed format passes through with null features, not a crash
    m = got["a_mp3"]
    assert m.n_samples is None and m.n_bytes == len(b"ID3fakemp3")


def _gradient_frames(n=4, h=16, w=16):
    # smooth luma gradient + gently varying chroma — camera-like content,
    # where 4:2:0 must stay ≥ 40 dB; steep per-pixel chroma edges are the
    # known worst case of ANY 4:2:0 codec and are out of the invariant
    yy, xx = np.mgrid[0:h, 0:w]
    frames = np.empty((n, h, w, 3), dtype=np.uint8)
    base = (64 + (xx * 2 + yy) % 128).astype(np.uint8)
    for i in range(n):
        frames[i, :, :, 0] = base
        frames[i, :, :, 1] = base + 8
        frames[i, :, :, 2] = (128 + 32 * np.sin(xx / 8 + i)).astype(np.uint8)
    return frames


def test_y4m_container_and_roundtrip():
    from europarl_crawler_spark.functions import imaging, videokit

    frames = _gradient_frames()
    body = videokit.y4m_encode(frames, fps=25)
    # genuine YUV4MPEG2 container: magic, header tokens, FRAME markers
    assert body.startswith(b"YUV4MPEG2 W16 H16 F25:1")
    assert body.count(b"FRAME\n") == 4
    assert videokit.y4m_parse_header(body) == (16, 16, 25, 4)
    dec, fps = videokit.y4m_decode(body)
    assert fps == 25 and dec.shape == frames.shape
    # the north's lossy-format PSNR invariant
    assert imaging.psnr(frames, dec) >= 40.0


def test_y4m_luma_plane_integer_exact():
    from europarl_crawler_spark.functions import videokit

    frames = _gradient_frames(n=2, h=8, w=8)
    body = videokit.y4m_encode(frames)
    lumas = videokit.y4m_luma_planes(body)
    r = frames[..., 0].astype(np.int64)
    g = frames[..., 1].astype(np.int64)
    b = frames[..., 2].astype(np.int64)
    want = (77 * r + 150 * g + 29 * b + 128) >> 8
    assert np.array_equal(lumas.astype(np.int64), want)


def test_frame_sample_real_y4m(spark):
    from europarl_crawler_spark.functions import videokit

    frames = _gradient_frames(n=7)
    videos = spark.createDataFrame(
        [("v1", bytearray(videokit.y4m_encode(frames)), "y4m")],
        "video_id string, bytes binary, fmt string",
    )
    got = sorted(
        multimodal.frame_sample(videos, every_n=3).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in got] == [0, 3, 6]
    for r in got:
        assert (r.w, r.h) == (16, 16)
        assert 0.0 <= r.mean_y <= 255.0
        assert r.phash is not None


def test_stub_raises_for_videos(spark):
    videos = spark.createDataFrame(
        [("v1", bytearray(b"notavideo"), "mp4", 90)],
        "video_id string, bytes binary, fmt string, n_frames int",
    )
    with pytest.raises(Exception):
        # surfaces as a PythonException wrapping the NotImplementedError
        multimodal.frame_sample_stub(videos).collect()


# --- aspect-ratio bucketing (ar_bucket_assign) ------------------------------


def test_ar_bucket_known_assignments(spark):
    from europarl_crawler_spark.operators.multimodal import ar_bucket_assign

    rows = [
        ("sq", 100, 100, "1:1"),
        ("l43", 400, 300, "4:3"),
        ("p34", 300, 400, "3:4"),
        ("w169", 1600, 900, "16:9"),
        ("t916", 90, 160, "9:16"),
        ("near", 700, 500, "4:3"),  # 1.4 — nearer 4/3 than 1 or 16/9
    ]
    df = spark.createDataFrame(
        [(i, w, h) for i, w, h, _ in rows], "image_id string, w int, h int"
    )
    got = {r["image_id"]: r["bucket_ar"] for r in ar_bucket_assign(df).collect()}
    for i, _, _, want in rows:
        assert got[i] == want, (i, got[i])


def test_ar_bucket_tie_takes_lowest_index(spark):
    from europarl_crawler_spark.operators.multimodal import ar_bucket_assign

    # 4:3 image vs buckets {1:1, 16:9}: quotient to both is exactly 4/3 —
    # the fused min must break the tie toward the lower bucket index
    df = spark.createDataFrame([("t", 4, 3)], "image_id string, w int, h int")
    row = ar_bucket_assign(df, buckets=[(0, 1, 1), (1, 16, 9)]).collect()[0]
    assert row["bucket_idx"] == 0 and row["bucket_ar"] == "1:1"


def test_ar_bucket_all_buckets_populated_on_synthetic_sizes(spark):
    import __spark_entry__ as entry

    out = entry.q_image_ar_bucket(spark, "/root/testdata/sf0.001")
    idxs = {r["bucket_idx"] for r in out.select("bucket_idx").distinct().collect()}
    assert idxs == {0, 1, 2, 3, 4}
