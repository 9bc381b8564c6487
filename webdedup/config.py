"""Pinned shingle/signature configuration (the "same shingle/signature config"
the north rule requires recall >= 0.99 against).

The reference has no such config object -- its equivalents are scattered
constants: ES top-k ``size`` (suricate/dbconnectors/esconnector.py:49),
vectorizer ``ngram_range`` (suricate/dftransformers/vectorizer.py:20-24),
pruning threshold 15 (tutorial/main/stepbystep/e2e.py:184-191).  Here every
knob that changes pair semantics lives in one frozen dataclass whose hash is
stamped into checkpoint manifests so a resumed run can prove it is resuming
the *same* pipeline.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class DedupConfig:
    # ---- shingling ----
    shingle_k: int = 2          # token shingle width
    min_tokens: int = 1         # docs with fewer tokens get a whole-doc shingle

    # ---- MinHash ----
    # r=3, b=42 -> LSH s-curve threshold (1/42)^(1/3) ~= 0.29 and detection
    # probability 1-(1-J^3)^42 >= 0.996 at J = jaccard_threshold = 0.5 —
    # sized so the blocking layer loses < 1% of the pairs the decision rule
    # would accept (the north rule's recall >= 0.99 at the pinned config).
    num_perm: int = 126         # signature length
    bands: int = 42             # LSH bands
    rows_per_band: int = 3      # num_perm == bands * rows_per_band
    minhash_seed: int = 97531   # seeds the (a, b) permutation params

    # ---- SimHash ----
    simhash_bits: int = 64
    simhash_blocks: int = 4     # prefix blocking: 4 x 16-bit blocks
    simhash_max_hamming: int = 3

    # ---- substring (suffix-anchor) pass ----
    # anchor width 40 (not 24): blocking only needs ONE selected window
    # inside a shared span (miss P = (7/8)^(L-39) ~ 2e-5 at L=120), but the
    # candidate junk rate is driven by random anchor collisions across
    # unrelated docs, which fall combinatorially with width.  Measured at a
    # 150k-page corpus: 24-char anchors produced 21.7M candidate pairs of
    # which 18.7M shared exactly one anchor (boilerplate/chance collisions),
    # flooding the gram-verify join with ~500 GB of array traffic; 40-char
    # anchors kill that tail at the source.
    anchor_len: int = 40        # char-gram anchor width
    anchor_stride: int = 8      # sample an anchor every `stride` chars
    anchor_max_docs: int = 64   # anchors shared by more docs are boilerplate -> dropped
    min_overlap_chars: int = 200  # planted-substring detection threshold

    # ---- candidate generation ----
    max_bucket_size: int = 256  # LSH buckets larger than this are capped (logged, not silent)
    salt_buckets: int = 16      # salting fan-out for the two-phase bucket-size aggregation
    # drop band-collision pairs whose MinHash-estimated Jaccard is below
    # this (2.7 sigma under nomatch_threshold at num_perm=126; kills the
    # boilerplate false-candidate tail before the SBS join, recall-neutral
    # at the jaccard_threshold decision boundary)
    minhash_prefilter: float = 0.12
    # in-join mini-sketch gate: the band self-join carries mini_perms
    # 31-bit-reduced minhash values per side and requires >= mini_min_agree
    # positional agreements before a pair may leave the join stage.  At 32
    # perms / >=5 agreements (est J >= 0.156): a true J=0.5 pair is lost
    # with P[Binom(32,0.5) <= 4] ~ 1e-6 (recall-neutral at the decision
    # boundary), while a J~0.08 boilerplate pair passes with
    # P[Binom(32,0.08) >= 5] ~ 0.14 — an ~7x cut of the quadratic junk-pair
    # tail before the (1 KB/pair) full-signature prefilter join.
    mini_perms: int = 32
    mini_min_agree: int = 5
    # bottom-k shingle sketch stored in the signature table: per-doc state
    # is CONSTANT-SIZE regardless of document length, so the per-pair
    # verification join hauls <= 2 KB of shingle data per side instead of
    # O(doc_len) (measured 29 KB/side at Common-Crawl-sized pages).  For
    # docs with < k shingles the sketch IS the full set and the jaccard is
    # exact (all pytest corpora and the sf0.01 oracle scale); above k it is
    # the standard unbiased bottom-k estimator, sigma <= 0.5/sqrt(k) ~ 0.031.
    shingle_sketch_k: int = 256

    # ---- verification / classification thresholds ----
    jaccard_threshold: float = 0.5   # exact (hashed-shingle) Jaccard to call a pair dup
    sure_threshold: float = 0.85     # triage: >= -> sure match (2)
    nomatch_threshold: float = 0.2   # triage: <  -> no match (0); between -> mixed (1)

    # ---- triage clustering (maps suricate KBinsCluster n_clusters=10/25) ----
    triage_bins: int = 10

    navalue_score: float = 0.0  # suricate/metrics/metrics.py:34

    def __post_init__(self) -> None:
        if self.num_perm != self.bands * self.rows_per_band:
            raise ValueError(
                f"num_perm ({self.num_perm}) must equal bands*rows_per_band "
                f"({self.bands}*{self.rows_per_band})"
            )

    def config_hash(self) -> str:
        """Stable hash of every semantic knob; stamped into stage manifests."""
        payload = json.dumps(asdict(self), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]


# String sentinels canonicalized to NULL before any scoring.
# Verbatim semantics of suricate/preutils/preprocessing.py:208-212 (navalues).
NAVALUES = [
    "#", "None", "-", "nan", "n.a.", " ", "", "#REF!", "#N/A",
    "#NAME?", "#DIV/0!", "#NUM!", "NaT", "NULL",
]
