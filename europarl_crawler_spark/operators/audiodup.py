"""Audio near-duplicate detection via delta-sign fingerprints.

The crawl's extract stage decodes PCM WAV audio (operators/multimodal.py:
audio_features); this module fingerprints the decoded waveform for
training-data curation: a 64-bit DELTA-SIGN fingerprint (bit i set iff the
(i+1)-th sample exceeds the i-th — the sample-domain skeleton of the
spectral "landmark" fingerprints production systems use) and banded hamming
LSH over it via the SHARED ``imagedup.hamming_near_pairs`` plan. Re-encoded
or re-sampled copies keep their waveform SHAPE, which is exactly what the
delta signs capture — while the fingerprint stays pure integer comparisons,
so a SQL oracle can reproduce it bit-for-bit from a known sample law.
Reference analog: per-filetype extract dispatch
(/root/reference/europarl/rules/extraction.py:27-52); the reference stops at
extraction, the curation layer dedups on it.

Scale shape: the fingerprint pass is one Arrow ``mapInPandas`` projection
(n_audio rows in, n_audio rows out, no shuffle); the pairs stage is the
banded-bucket equi-join with candidate-local exact verify — identical plan
and guarantees as the image/simhash lanes (pigeonhole recall, no global
window, no all-pairs product).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .imagedup import hamming_near_pairs
from .multimodal import wav_decode


def fingerprint64(samples: np.ndarray) -> int:
    """64-bit delta-sign fingerprint of a PCM sample vector: bit i set iff
    sample[(i+1) % n] > sample[i % n] (wrapping keeps short clips defined).
    Pure integer comparisons — SQL-expressible, amplitude-scale-invariant
    for positive gains, and robust to DC offset. Returns a signed int64
    (bit 63 in the sign bit, matching Spark's LongType)."""
    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    acc = np.uint64(0)
    if n == 0:
        return 0
    for i in range(64):
        if s[(i + 1) % n] > s[i % n]:
            acc |= np.uint64(1) << np.uint64(i)
    return int(acc.astype(np.int64))


def audio_fingerprints(audios: DataFrame, id_col: str = "audio_id") -> DataFrame:
    """(id, bytes, fmt) → (id, hash64): one Arrow pass decoding the real
    codec per format — PCM WAV (operators/multimodal.py:wav_decode), IMA
    ADPCM (functions/adpcmkit.py), MPEG-1 Layer III (operators/multimodal.py:
    mp3_pcm_decode, r4) — and emitting the delta-sign fingerprint over the
    decoded samples. Unknown formats drop. The id column's type is
    preserved."""
    id_type = audios.schema[id_col].dataType.simpleString()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import adpcmkit
        from .multimodal import mp3_pcm_decode

        decoders = {
            "wav": wav_decode,
            "adpcm": adpcmkit.adpcm_wav_decode,
            "mp3": mp3_pcm_decode,
        }
        for pdf in it:
            ids, hs = [], []
            for aid, body, fmt in zip(pdf[id_col], pdf["bytes"], pdf["fmt"]):
                if fmt not in decoders:
                    continue
                try:
                    samples, _fr = decoders[fmt](bytes(body))
                except (NotImplementedError, ValueError):
                    continue  # a curation pass skips what it cannot read
                ids.append(aid)
                hs.append(fingerprint64(samples))
            yield pd.DataFrame({id_col: ids, "hash64": hs})

    return audios.select(id_col, "bytes", "fmt").mapInPandas(
        batches, schema=f"{id_col} {id_type}, hash64 long"
    )


def audio_near_pairs(
    audios: DataFrame,
    max_hamming: int = 3,
    id_col: str = "audio_id",
) -> DataFrame:
    """Near-duplicate audio pairs straight from payload bytes: real WAV
    decode → delta-sign fingerprint → banded hamming pairs (shared
    pigeonhole-complete plan, exact verify candidate-local). Output
    (id_a, id_b, hamming), id_a < id_b. For coarse blocking at 10⁷+ rows
    (e.g. a duration class), call ``hamming_near_pairs`` on a fingerprint
    table that carries the block column."""
    return hamming_near_pairs(
        audio_fingerprints(audios, id_col=id_col),
        max_hamming,
        id_col=id_col,
    )
