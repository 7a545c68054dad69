"""Candidate-fraction regression guards (VERDICT r3 next-step #8).

The blocked/banded pair lanes are sub-quadratic only because their
candidate joins prune the O(n²) pair space; a threshold/banding change can
silently degrade them toward all-pairs while every value oracle stays
green. These tests pin the fraction at TWO corpus sizes so a degradation
fails CI instead of surfacing as a bench (or cluster-bill) surprise:

* absolute bound — each lane's fraction stays well under all-pairs at both
  sizes;
* two-size monotonicity — growing the corpus must not grow the fraction
  (beyond slack): banded buckets and √n angular cells both concentrate as n
  rises, so fraction(larger) ≤ fraction(smaller) · SLACK. A change that
  breaks concentration (e.g. a constant cell count, a 1-bit band) trips
  this even when the absolute bound still passes at test scale.
"""

from __future__ import annotations

import pytest

from europarl_crawler_spark.operators import diagnostics

SF_DIR = "/root/testdata/sf0.01"

# healthy r4 values at sf0.01 (500/250 rows), from the audit table: hamming
# ≈ 0.02, minhash ≈ 0.004, angular ≈ 0.46/0.48 at its 0.95 near-dup
# operating point (this synthetic embedding corpus is diffuse, so angular
# pruning is modest at ANY threshold — see diagnostics.candidate_report on
# why the wide catalog threshold 0.35 is not the guarded regime). Bounds
# carry headroom; they catch degradation-to-all-pairs, not noise.
ABS_BOUND = {
    "hamming_near_pairs": 0.15,
    "minhash_lsh_pairs": 0.10,
    "angular_candidates": 0.70,
}
SLACK = 1.5  # fraction may wobble with content, must not GROW with n


@pytest.fixture(scope="module")
def fractions(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    small_docs = docs.orderBy("doc_id").limit(250)
    small_emb = emb.orderBy("vec_id").limit(250)  # sf0.01 has 500 vectors
    return {
        "small": diagnostics.candidate_report(small_docs, small_emb),
        "large": diagnostics.candidate_report(docs, emb),
    }


@pytest.mark.parametrize("lane", sorted(ABS_BOUND))
def test_fraction_absolute_bound(fractions, lane):
    for size in ("small", "large"):
        frac = fractions[size][lane]
        assert 0.0 <= frac <= ABS_BOUND[lane], (
            f"{lane} candidate fraction {frac:.4f} at {size} exceeds "
            f"{ABS_BOUND[lane]} — blocking is degrading toward all-pairs"
        )


@pytest.mark.parametrize("lane", sorted(ABS_BOUND))
def test_fraction_does_not_grow_with_corpus(fractions, lane):
    small, large = fractions["small"][lane], fractions["large"][lane]
    assert large <= max(small, 1e-6) * SLACK, (
        f"{lane} candidate fraction grew {small:.4f} → {large:.4f} with "
        f"corpus size — candidate generation is losing concentration"
    )


def test_angular_fraction_on_clustered_corpus(spark):
    """r4 VERDICT next-round #4: the 0.46 fraction at the 0.95 operating
    point on the DIFFUSE synthetic corpus is sphere geometry, not a
    regression — but the operator's production claim is for clustered
    embeddings. Measure it on a clustered fixture (the separated-blob
    generator family from ann_kmeans_topk's recall test, widened to 16
    blobs so the clustered mass itself is 1/16): the fraction must be
    ≤ 0.1 AND the candidate set must stay lossless (every true ≥ 0.95
    pair present — the dual triangle bound's contract)."""
    import numpy as np

    from europarl_crawler_spark.operators import similarity

    n, dims, blobs = 512, 32, 16
    rows = []
    for i in range(n):
        c = i % blobs
        vec = [0.0] * dims
        vec[c] = 1.0
        for d in range(dims):
            vec[d] += ((i * 31 + d * 7) % 13 - 6) / 150.0
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cand = similarity.angular_candidates(emb, threshold=0.95, n=n)
    pairs = {
        (min(r.ida, r.idb), max(r.ida, r.idb))
        for r in cand.select("ida", "idb").collect()
    }
    frac = diagnostics.candidate_fraction(cand, n)
    assert frac <= 0.10, (
        f"angular candidate fraction {frac:.4f} on the clustered fixture — "
        "cell pruning is not concentrating on clustered data"
    )
    V = np.array([r[1] for r in rows])
    V = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = V @ V.T
    true_pairs = {
        (a, b) for a in range(n) for b in range(a + 1, n) if S[a, b] >= 0.95
    }
    assert true_pairs - pairs == set(), "lossless contract violated"
    assert len(true_pairs) > 1000  # the fixture genuinely has near-dups
