"""Image near-duplicate detection over 64-bit perceptual hashes.

The crawl's extract stage computes a perceptual hash per fetched image
(``imaging.phash64`` — stored on the documents table); this module makes
those hashes actionable for training-data curation: near-duplicate pairs via
banded hamming LSH, the image-side analog of the text lanes in
``operators/dedup.py``. Reference analog: the extract stage's per-filetype
content fingerprinting (/root/reference/europarl/rules/extraction.py:27-52)
— the reference stops at extraction; a 100 TB training pipeline dedups on it.

``hamming_near_pairs`` is the generic engine (any int64 hash column):
split 64 bits into (max_hamming + 1) bands — a pair within hamming k must
agree EXACTLY on at least one band (pigeonhole), so the band-bucket
equi-join finds every true pair; the exact ``bit_count(xor)`` check is
candidate-local. No global window, no all-pairs product: the shuffle is one
hash-partitioned join keyed by (band, piece). ``operators/dedup.py``'s
``simhash_near_pairs`` delegates here — text simhash and image phash/ahash
share one verified plan.

Scale note (10⁹ images): band width is 64/(k+1) bits — at k=3 a 16-bit band
has 65 536 buckets, so beyond ~10⁷ images random band collisions dominate
the candidate set. The standard remedies compose with this plan: raise the
piece key's selectivity by prefixing a coarse partition key (e.g. image size
class) — ``hamming_near_pairs(..., block_cols=[...])`` does exactly this —
or dedup within content shards first. The exact verify keeps correctness
regardless — candidate growth costs time, never recall (within a block;
cross-block pairs are excluded by definition, the point of blocking).

``ahash64`` is the classic 8×8 average hash, PURE INTEGER end-to-end
(BT.601 integer luma, 2×2 block sums, ``64·block > total`` comparison — no
division, no float), so the DuckDB oracle reproduces it bit-for-bit and the
``dedup_image_ahash`` query is fully value-checked through a REAL PNG
encode/decode round trip. Unlike the DCT phash it is SQL-expressible while
still being genuinely perceptual: small pixel perturbations move one block
sum slightly and flip at most a few bits.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import imaging


def hamming_candidates(
    sig: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "hash64",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """The banded-bucket candidate-pair stage of ``hamming_near_pairs`` —
    exposed separately so the candidate-pair FRACTION is loggable and
    CI-testable (``operators/diagnostics.py``): a band-width or blocking
    change that silently degrades this join toward all-pairs must fail a
    test, not surface as a bench surprise. Output: (id_a, id_b, h_a, h_b),
    distinct, id_a < id_b."""
    blocks = list(block_cols or [])
    nb = max_hamming + 1
    width = 64 // nb
    spark = sig.sparkSession
    s = sig.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h"), *blocks
    )
    bands = spark.range(nb).select(F.col("id").cast("int").alias("band"))
    # width = 64 (max_hamming = 0, exact-hash join): the mask literal 2⁶⁴-1
    # overflows LongType — the full hash IS the piece
    mask = (1 << width) - 1 if width < 64 else -1
    keyed = s.crossJoin(F.broadcast(bands)).withColumn(
        "piece",
        F.expr(f"shiftrightunsigned(_h, band * {width}) & {mask}L"),
    )
    return (
        keyed.alias("a")
        .join(keyed.alias("b"), ["band", "piece", *blocks])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._h").alias("h_a"),
            F.col("b._h").alias("h_b"),
        )
        .distinct()
    )


def hamming_near_pairs(
    sig: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "hash64",
    block_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs with ``hamming(hash64) <= max_hamming`` from an (id, hash)
    table. Banded-bucket candidate join with the pigeonhole recall guarantee;
    exact bit_count verify on candidates only. Output: (id_a, id_b, hamming)
    with id_a < id_b.

    ``block_cols``: optional coarse blocking keys (e.g. an image size class)
    prefixed to the bucket key — at 10⁷+ rows this is the lever that keeps
    random band collisions from dominating the candidate set. Pairs are only
    sought WITHIN a block (cross-block rows are not near-dup candidates by
    definition of the chosen key)."""
    cand = hamming_candidates(sig, max_hamming, id_col, hash_col, block_cols)
    return (
        cand.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def image_dup_groups(
    sig: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    hash_col: str = "hash64",
    block_cols: list[str] | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Image near-dup GROUPS: banded hamming pairs → connected components
    (min-label propagation with pointer jumping — ``dedup.near_dup_groups``,
    the SAME oracle-verified CC engine the text lane uses). Output:
    (doc_id, group_id) with group_id = smallest reachable id, i.e. the
    representative a curation pipeline keeps per visual duplicate cluster.
    Hamming closeness is not transitive; CC is the standard closure (a
    chain of re-encodes A~B~C clusters even when A,C drift past the
    threshold)."""
    from .dedup import near_dup_groups

    pairs = hamming_near_pairs(
        sig, max_hamming, id_col=id_col, hash_col=hash_col, block_cols=block_cols
    )
    return near_dup_groups(pairs, max_iter=max_iter)


def ahash64_luma(y: np.ndarray) -> int:
    """8×8 average hash of an (h, w) integer LUMA plane, h and w multiples
    of 8: block sums over the (h/8)×(w/8) grid, bit k (row-major) set iff
    64·block_sum_k > total_sum. Returns a signed int64 (bit 63 lands in the
    sign bit, matching Spark's LongType). This is the shared perceptual core:
    ``ahash64`` feeds it RGB-derived luma, the video lane feeds it the Y
    planes a Y4M container already stores — one arithmetic, every lane."""
    h, w = y.shape
    bs = y.astype(np.int64).reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
    total = int(bs.sum())
    bits = (64 * bs > total).flatten()  # row-major: bit k = block (k//8, k%8)
    acc = np.uint64(0)
    for k in range(64):
        if bits[k]:
            acc |= np.uint64(1) << np.uint64(k)
    return int(acc.astype(np.int64))


def ahash64(px: np.ndarray) -> int:
    """8×8 average hash of an (h, w, 3) uint8 image, h and w multiples of 8.
    Integer BT.601 luma (the videokit constants), then ``ahash64_luma``."""
    p = px.astype(np.int64)
    y = (77 * p[..., 0] + 150 * p[..., 1] + 29 * p[..., 2] + 128) >> 8
    return ahash64_luma(y)


def image_hashes(
    images: DataFrame,
    id_col: str = "image_id",
    kind: str = "ahash",
) -> DataFrame:
    """Decode each (id, bytes, w, h, fmt) row through the REAL codecs and
    emit (id, hash64) — ``kind='ahash'`` for the SQL-mirrorable average hash,
    ``'phash'`` for the float DCT hash the crawl stores, ``'phash_i'`` for
    the integer fixed-point DCT hash (imaging.phash64_i) that is ALSO
    SQL-mirrorable. One Arrow pass; undecodable payloads drop (a curation
    pass skips what it cannot read)."""
    hasher = {
        "ahash": ahash64,
        "phash": imaging.phash64,
        "phash_i": imaging.phash64_i,
    }[kind]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, hs = [], []
            for iid, body, w, h, fmt in zip(
                pdf[id_col], pdf["bytes"], pdf["w"], pdf["h"], pdf["fmt"]
            ):
                try:
                    px = imaging.decode(bytes(body), int(w), int(h), fmt)
                except (NotImplementedError, ValueError, AssertionError):
                    continue
                ids.append(iid)
                hs.append(hasher(px))
            yield pd.DataFrame({id_col: ids, "hash64": hs})

    return images.select(id_col, "bytes", "w", "h", "fmt").mapInPandas(
        batches, schema=f"{id_col} string, hash64 long"
    )


def image_near_pairs(
    images: DataFrame,
    max_hamming: int = 3,
    id_col: str = "image_id",
    kind: str = "phash",
) -> DataFrame:
    """Near-duplicate image pairs straight from payload bytes: real decode →
    perceptual hash → banded hamming pairs. For tables that already store the
    crawl's phash, skip the decode and call ``hamming_near_pairs`` on the
    stored column directly."""
    return hamming_near_pairs(
        image_hashes(images, id_col, kind), max_hamming, id_col=id_col
    )
