"""Candidate-fraction diagnostics for the blocked/banded pair lanes.

Every near-dup lane in this engine is sub-quadratic only because a
candidate-generation stage (banded hamming buckets, MinHash band buckets,
angular cells) prunes the O(n²) pair space before the exact verify. That
pruning is a TUNING property, not a correctness property: a band-width,
bucket, or blocking change can silently degrade candidate generation toward
all-pairs while every oracle row stays green — the failure only shows up as
a 100× bench (or cluster-bill) surprise. These helpers make the fraction a
first-class, CI-assertable number:

* ``candidate_fraction`` — |candidates| / C(n, 2) for any candidate frame.
* ``candidate_report`` — the fractions of the three guarded lanes
  (``hamming_candidates``, ``minhash_lsh_candidates``,
  ``angular_candidates``) over a given corpus, as a plain dict — logged into
  BENCH/PLAN_AUDIT.md by tools/audit_plans.py and asserted at two corpus
  sizes by tests/test_candidate_fraction.py (VERDICT r3 next-step #8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def candidate_fraction(cand: DataFrame, n_rows: int) -> float:
    """|cand| / C(n_rows, 2) — the fraction of the all-pairs space a blocked
    candidate join actually materializes. 1.0 means the blocking bought
    nothing (degraded to all-pairs); a healthy banded/blocked lane sits well
    below the bound the corpus's duplicate density implies."""
    n_pairs = n_rows * (n_rows - 1) // 2
    if n_pairs <= 0:
        return 0.0
    return cand.count() / n_pairs


def candidate_report(
    docs: DataFrame, emb: DataFrame | None = None, threshold: float = 0.95
) -> dict[str, float]:
    """Candidate fractions of the three guarded lanes over a documents frame
    (doc_id, text) and optionally an embeddings frame (vec_id, embedding).

    Banded hamming over the 64-bit simhash at max_hamming=3; MinHash
    k=64/bands=16 over 5-gram shingle hashes (df_cap=100); angular cells at
    ``threshold``. The angular default is 0.95 — a NEAR-DUP operating point
    where cell pruning is geometrically meaningful; at wide thresholds
    (e.g. the catalog lane's 0.35, θ_t ≈ 70°) most of the sphere is within
    θ_t of everything and the fraction approaches 1 BY GEOMETRY, not by
    regression (``angular_candidates`` docstring) — guard the regime the
    operator is built for."""
    from . import dedup, imagedup, similarity

    out: dict[str, float] = {}
    n_docs = docs.count()
    sig = dedup.simhash64(docs)
    out["hamming_near_pairs"] = candidate_fraction(
        imagedup.hamming_candidates(sig, max_hamming=3, hash_col="simhash"),
        n_docs,
    )
    sh = dedup.shingle_hashes(docs, 5, "text", "doc_id", 100)
    out["minhash_lsh_pairs"] = candidate_fraction(
        dedup.minhash_lsh_candidates(sh, k=64, bands=16), n_docs
    )
    if emb is not None:
        n_emb = emb.count()
        out["angular_candidates"] = candidate_fraction(
            similarity.angular_candidates(emb, threshold=threshold, n=n_emb),
            n_emb,
        )
    return out
