"""Video near-duplicate detection via per-frame perceptual signatures.

The crawl's extract stage can frame-sample videos (operators/multimodal.py:
frame_sample — real decode for the y4m/avi/mp4-mjpg lanes); this module makes
the sampled frames actionable for training-data curation: two videos are
near-duplicates
when any of their frames' perceptual hashes sit within a hamming radius —
the standard frame-signature dedup a 100 TB video corpus needs (re-encoded,
trimmed, or re-containered copies share frames even when the bytes differ).
Reference analog: the per-filetype extract dispatch
(/root/reference/europarl/rules/extraction.py:27-52) — the reference stops
at extraction; the curation layer dedups on what was extracted.

Plan shape (the ONLY shuffles are hash-partitioned joins/aggregations):

1. one Arrow ``mapInPandas`` pass over (video_id, bytes, fmt): decode the
   container — y4m takes the STORED Y planes (no RGB round trip — the luma
   plane is the codec's own integer BT.601 output); avi/mp4 decode their
   Motion-JPEG samples and recompute the same integer luma — then hash each
   sampled frame with ``imagedup.ahash64_luma`` — the same oracle-verified
   arithmetic the image lane uses;
2. banded hamming LSH over the frame signatures via the SHARED
   ``imagedup.hamming_near_pairs`` plan (pigeonhole-complete candidate join,
   candidate-local exact ``bit_count`` verify) with the signature id being a
   (video_id, frame_idx) struct — struct ordering gives pair
   canonicalization for free;
3. collapse frame pairs to video pairs: group by (vid_a, vid_b), keeping
   the best (min) hamming and the number of matching frame pairs.

At 10⁹ videos the candidate set is bounded exactly as the image lane's:
band selectivity via ``block_cols`` (e.g. a duration or resolution class)
— cross-block frame pairs are not duplicate candidates by definition of
the chosen key. Frame sampling keeps the signature table at
n_videos × (frames / every_n) rows, and a long-tail video only ever costs
its own task (the decode is partitioned by video).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import videokit
from .imagedup import ahash64_luma, hamming_near_pairs


def frame_signatures(
    videos: DataFrame,
    every_n: int = 1,
    id_col: str = "video_id",
) -> DataFrame:
    """(id, bytes, fmt) → (id, frame_idx, hash64): one Arrow pass that
    decodes the REAL containers — y4m (stored luma planes, integer-exact),
    avi and mp4 (Motion-JPEG samples via functions/avikit.py /
    functions/mp4kit.py, BT.601 integer luma from the decoded RGB) — and
    hashes every ``every_n``-th frame with the image lane's ``ahash64_luma``.
    One arithmetic across containers means a y4m original and its mjpeg
    re-encode land a few hamming bits apart — the cross-container near-dup
    case a curation pass exists for. Rows in entropy-coded formats drop
    (h264/h265 need ffmpeg, stubbed per sandbox); undecodable payloads drop
    (skip what you cannot read). The id column's type is preserved so
    callers can key on whatever their catalog uses."""
    from ..functions import avikit, mp4kit

    id_type = videos.schema[id_col].dataType.simpleString()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fids, hs = [], [], []
            for vid, body, fmt in zip(pdf[id_col], pdf["bytes"], pdf["fmt"]):
                body = bytes(body)
                try:
                    if fmt == "y4m":
                        lumas = videokit.y4m_luma_planes(body)
                    elif fmt in ("avi", "mp4"):
                        frames = (
                            avikit.avi_decode(body)
                            if fmt == "avi"
                            else mp4kit.mp4_decode(body)
                        )[0].astype("int64")
                        lumas = (
                            77 * frames[..., 0]
                            + 150 * frames[..., 1]
                            + 29 * frames[..., 2]
                            + 128
                        ) >> 8
                    else:
                        continue
                except (NotImplementedError, ValueError):
                    continue
                for f in range(0, lumas.shape[0], every_n):
                    ids.append(vid)
                    fids.append(f)
                    hs.append(ahash64_luma(lumas[f]))
            yield pd.DataFrame({id_col: ids, "frame_idx": fids, "hash64": hs})

    return videos.select(id_col, "bytes", "fmt").mapInPandas(
        batches, schema=f"{id_col} {id_type}, frame_idx int, hash64 long"
    )


def video_near_pairs_from_signatures(
    sig: DataFrame,
    max_hamming: int = 3,
    id_col: str = "video_id",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """(id, frame_idx, hash64) → (vid_a, vid_b, min_hamming,
    n_frame_matches): banded hamming pairs over frame signatures (the shared
    ``hamming_near_pairs`` plan, signature id = (video, frame) struct),
    collapsed to video pairs — min hamming across matching frames plus how
    many frame pairs matched. Same-video frame matches are excluded; pair
    order is canonical (vid_a < vid_b, inherited from the struct ordering of
    the signature ids)."""
    keyed = sig.select(
        F.struct(F.col(id_col).alias("vid"), F.col("frame_idx").alias("f")).alias(
            "sig_id"
        ),
        "hash64",
        *(block_cols or []),
    )
    pairs = hamming_near_pairs(
        keyed, max_hamming, id_col="sig_id", block_cols=block_cols
    )
    return (
        pairs.select(
            F.col("id_a.vid").alias("vid_a"),
            F.col("id_b.vid").alias("vid_b"),
            "hamming",
        )
        .filter(F.col("vid_a") != F.col("vid_b"))
        .groupBy("vid_a", "vid_b")
        .agg(
            F.min("hamming").alias("min_hamming"),
            F.count(F.lit(1)).alias("n_frame_matches"),
        )
    )


def video_near_pairs(
    videos: DataFrame,
    max_hamming: int = 3,
    every_n: int = 1,
    id_col: str = "video_id",
) -> DataFrame:
    """Near-duplicate video pairs straight from payload bytes: real
    container decode (y4m/avi/mp4-mjpg) → per-frame luma ahash → banded
    hamming pairs → video-pair collapse."""
    return video_near_pairs_from_signatures(
        frame_signatures(videos, every_n=every_n, id_col=id_col),
        max_hamming,
        id_col=id_col,
    )
