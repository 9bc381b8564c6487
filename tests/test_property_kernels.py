"""Property-based tests (hypothesis) for the pure-numpy/python kernels —
SURVEY §5.2: unit tests against oracles implementing the exact formulas.

All Spark-free: these run the worker-side code paths directly.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from webdedup.features import _lcs_ratio_one
from webdedup.signatures import _mix64, _perm_params, minhash_block, simhash_block
from webdedup.substring import _window_hashes

# ---------------------------------------------------------------------------
# bit-parallel LCS ratio (fuzzywuzzy / python-Levenshtein semantics)
# ---------------------------------------------------------------------------


def _lcs_dp(a: str, b: str) -> int:
    """Quadratic DP oracle for LCS length."""
    m, n = len(a), len(b)
    prev = [0] * (n + 1)
    for i in range(m):
        cur = [0] * (n + 1)
        for j in range(n):
            cur[j + 1] = prev[j] + 1 if a[i] == b[j] else max(prev[j + 1], cur[j])
        prev = cur
    return prev[n]


_texts = st.text(alphabet="abcdef \n", max_size=60)


@given(_texts, _texts)
@settings(max_examples=200, deadline=None)
def test_lcs_ratio_matches_dp_oracle(a, b):
    got = _lcs_ratio_one(a, b, {})
    if not a or not b:
        assert got == 0.0
    else:
        assert got == 2.0 * _lcs_dp(a, b) / (len(a) + len(b))


@given(_texts, _texts)
@settings(max_examples=100, deadline=None)
def test_lcs_ratio_symmetric_and_bounded(a, b):
    cache: dict = {}
    r1, r2 = _lcs_ratio_one(a, b, cache), _lcs_ratio_one(b, a, cache)
    assert r1 == r2
    assert 0.0 <= r1 <= 1.0
    if a:
        assert _lcs_ratio_one(a, a, cache) == 1.0


# ---------------------------------------------------------------------------
# MinHash / SimHash blocks vs per-row naive oracles
# ---------------------------------------------------------------------------

_shingle_rows = st.lists(
    st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=20),
    min_size=1,
    max_size=8,
)


@given(_shingle_rows)
@settings(max_examples=50, deadline=None)
def test_minhash_block_matches_naive(rows):
    seeds = _perm_params(16, seed=7)
    got = minhash_block([np.asarray(r, dtype=np.int64) for r in rows], seeds, 16)
    for i, r in enumerate(rows):
        if not r:
            assert (got[i] == 0).all()
            continue
        x = np.asarray(r, dtype=np.int64).view(np.uint64)
        naive = np.array(
            [int(_mix64(x ^ s).min()) for s in seeds], dtype=np.uint64
        ).view(np.int64)
        assert (got[i] == naive).all()


@given(_shingle_rows)
@settings(max_examples=50, deadline=None)
def test_simhash_block_matches_naive(rows):
    got = simhash_block([np.asarray(r, dtype=np.int64) for r in rows], 64)
    for i, r in enumerate(rows):
        if not r:
            assert got[i] == 0
            continue
        hs = np.asarray(r, dtype=np.int64).view(np.uint64)
        sig = 0
        for j in range(64):
            bits = (hs >> np.uint64(j)) & np.uint64(1)
            if (2 * bits.astype(np.int64) - 1).sum() > 0:
                sig |= 1 << j
        want = sig - (1 << 64) if sig >= (1 << 63) else sig
        assert int(got[i]) == want


# ---------------------------------------------------------------------------
# rolling window hashes (substring anchors / verification grams)
# ---------------------------------------------------------------------------


@given(st.binary(min_size=0, max_size=200), st.integers(min_value=1, max_value=12))
@settings(max_examples=100, deadline=None)
def test_window_hashes_match_naive_rehash(data, g):
    """The O(n) invertible-base prefix-sum windows must equal hashing each
    g-byte window independently (the formula the docstring claims)."""
    got = set(_window_hashes(data, g, sel=1).tolist())
    want = set()
    for i in range(len(data) - g + 1):
        w = np.uint64(0)
        with np.errstate(over="ignore"):
            for t, byte in enumerate(data[i : i + g]):
                from webdedup.substring import _B

                w = w + np.uint64(byte) * (_B ** np.uint64(g - 1 - t))
        want.add(int(_mix64(np.array([w], dtype=np.uint64))[0].view(np.int64)))
    # _window_hashes returns int64 view
    want = {v - (1 << 64) if v >= (1 << 63) else v for v in want}
    assert got == {np.int64(v) for v in want} or got == want


@given(st.binary(min_size=30, max_size=120), st.binary(max_size=30), st.binary(max_size=30))
@settings(max_examples=60, deadline=None)
def test_window_hashes_alignment_invariant(span, pre, post):
    """Winnowing property: the selected hashes inside a shared span are
    offset-independent — every selected window fully inside `span` appears
    whether or not context surrounds it."""
    g, sel = 16, 4
    inner = set(_window_hashes(span, g, sel).tolist())
    outer = set(_window_hashes(pre + span + post, g, sel).tolist())
    assert inner <= outer
