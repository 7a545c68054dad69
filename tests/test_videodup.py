"""Video near-dup lane (operators/videodup.py): luma-ahash equivalence with
the image lane, frame sampling, banded pair recall at the production
threshold, video-pair collapse semantics, undecodable-row skip, and
cross-container (y4m/avi/mp4-mjpg) re-encode matching."""

from __future__ import annotations

import numpy as np

from europarl_crawler_spark.functions import videokit
from europarl_crawler_spark.operators import imagedup, videodup


def _frames(key=0, n=2, h=16, w=16):
    rng = np.random.Generator(np.random.Philox(key=key))
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def _flip_bits(h64: int, bits: list[int]) -> int:
    acc = np.uint64(h64)
    for b in bits:
        acc ^= np.uint64(1) << np.uint64(b)
    return int(acc.astype(np.int64))


def test_luma_ahash_equals_rgb_ahash():
    """ahash64_luma over the exact BT.601 luma equals ahash64 over RGB —
    the video lane and the image lane share one arithmetic."""
    px = _frames(1, n=1)[0]
    p = px.astype(np.int64)
    y = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2] + 128) >> 8
    assert imagedup.ahash64_luma(y) == imagedup.ahash64(px)


def test_frame_signatures_match_container_lumas(spark):
    """Signatures computed through the DataFrame lane equal hand-hashed
    stored Y planes, for every frame, with frame indices intact."""
    frames = _frames(2, n=4)
    body = videokit.y4m_encode(frames, fps=25)
    want = {
        f: imagedup.ahash64_luma(l)
        for f, l in enumerate(videokit.y4m_luma_planes(body))
    }
    videos = spark.createDataFrame(
        [("v1", bytearray(body), "y4m"), ("skip", bytearray(b"xx"), "mp4")],
        "video_id string, bytes binary, fmt string",
    )
    got = {
        (r["video_id"], r["frame_idx"]): r["hash64"]
        for r in videodup.frame_signatures(videos).collect()
    }
    assert got == {("v1", f): h for f, h in want.items()}  # mp4 row skipped


def test_frame_sampling_every_n(spark):
    body = videokit.y4m_encode(_frames(3, n=6), fps=25)
    videos = spark.createDataFrame(
        [("v1", bytearray(body), "y4m")], "video_id string, bytes binary, fmt string"
    )
    idx = sorted(
        r["frame_idx"]
        for r in videodup.frame_signatures(videos, every_n=3).collect()
    )
    assert idx == [0, 3]


def test_video_near_pairs_production_threshold(spark):
    """At max_hamming=3: a video sharing a 2-bit-perturbed frame matches; an
    unrelated video does not; same-video frame pairs never emit; min/count
    aggregation is right when two frames match."""
    base = _frames(4, n=2)
    a = videokit.y4m_encode(base, fps=25)
    sig0 = imagedup.ahash64_luma(videokit.y4m_luma_planes(a)[0])
    sig1 = imagedup.ahash64_luma(videokit.y4m_luma_planes(a)[1])
    # b: synthetic signatures — frame 0 within hamming 2 of a's frame 0,
    # frame 1 within hamming 1 of a's frame 1 (two matching frame pairs)
    sigs = [
        ("a", 0, sig0),
        ("a", 1, sig1),
        ("b", 0, _flip_bits(sig0, [5, 40])),
        ("b", 1, _flip_bits(sig1, [63])),
        ("c", 0, _flip_bits(sig0, list(range(0, 64, 2)))),  # far away
    ]
    sig_df = spark.createDataFrame(
        sigs, "video_id string, frame_idx int, hash64 long"
    )
    rows = videodup.video_near_pairs_from_signatures(sig_df, max_hamming=3).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["vid_a"], r["vid_b"]) == ("a", "b")
    assert r["min_hamming"] == 1 and r["n_frame_matches"] == 2


def test_video_near_pairs_end_to_end_bytes(spark):
    """Payload-level path: identical videos pair at hamming 0 across all
    frames; a re-encoded copy with a tiny luma perturbation still pairs."""
    frames = _frames(5, n=2)
    body = videokit.y4m_encode(frames, fps=25)
    nudged = frames.copy()
    nudged[0, 0, 0] = (int(nudged[0, 0, 0, 0]) + 2) % 256
    body2 = videokit.y4m_encode(nudged, fps=25)
    videos = spark.createDataFrame(
        [
            ("a", bytearray(body), "y4m"),
            ("b", bytearray(body), "y4m"),
            ("c", bytearray(body2), "y4m"),
        ],
        "video_id string, bytes binary, fmt string",
    )
    got = {
        (r["vid_a"], r["vid_b"]): (r["min_hamming"], r["n_frame_matches"])
        for r in videodup.video_near_pairs(videos, max_hamming=3).collect()
    }
    assert got[("a", "b")] == (0, 2)
    assert ("a", "c") in got and ("b", "c") in got


def test_cross_container_reencode_pairs(spark):
    """The curation case the lane exists for: the SAME content stored as a
    y4m master and as a Motion-JPEG mp4 re-encode must pair — one luma
    arithmetic across containers keeps the hashes a few hamming bits apart
    even through the lossy jpeg round trip."""
    from europarl_crawler_spark.functions import avikit, mp4kit

    yy, xx = np.mgrid[0:16, 0:16]
    frames = np.zeros((2, 16, 16, 3), dtype=np.uint8)
    for f in range(2):
        # frame 1 mirrors the x-gradient: structurally distinct under the
        # mean-thresholded ahash (a mere brightness shift would hash
        # identically and cross-match every frame pair)
        gx = (15 - xx) if f else xx
        for c in range(3):
            frames[f, :, :, c] = np.clip(
                20 * (c + 1) + gx * 4 + yy * 4, 0, 255
            )
    videos = spark.createDataFrame(
        [
            ("y4m", bytearray(videokit.y4m_encode(frames, fps=12)), "y4m"),
            (
                "mp4",
                bytearray(mp4kit.mp4_encode_mjpeg(frames, fps=12, quality=95)),
                "mp4",
            ),
            (
                "avi",
                bytearray(avikit.avi_encode(frames, fps=12, quality=95)),
                "avi",
            ),
        ],
        "video_id string, bytes binary, fmt string",
    )
    got = {
        (r["vid_a"], r["vid_b"]): r["n_frame_matches"]
        for r in videodup.video_near_pairs(videos, max_hamming=3).collect()
    }
    # all three containers carry the same two frames: every pair matches both
    assert got == {
        ("avi", "mp4"): 2,
        ("avi", "y4m"): 2,
        ("mp4", "y4m"): 2,
    }
