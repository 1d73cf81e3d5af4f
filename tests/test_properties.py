"""Property-based kernel tests (hypothesis, numpy-only — no Spark session).

Mirrors the reference's metric-property tests (/root/reference/tests/test_lsh.py)
but generative: random shingle sets and token streams instead of hand-picked
cases."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lsh_cascade_poc_spark.functions.minhash import make_perms, minhash_flat, minhash_numpy
from lsh_cascade_poc_spark.functions.signature_udf import (
    doc_shingles,
    hash_tokens,
    shingle_hashes_from_token_hashes,
)
from lsh_cascade_poc_spark.functions.simhash import (
    _simhash_flat,
    simhash_from_hashes_numpy,
)
from lsh_cascade_poc_spark.reference_impl import _union_find_clusters, xxh64

int64s = st.integers(min_value=-(2**62), max_value=2**62)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(int64s, max_size=60), min_size=1, max_size=12))
def test_minhash_segmented_equals_per_row(sets):
    """Batched segmented kernel == one-row-at-a-time kernel, regardless of
    how rows (including empty ones) are packed into the batch."""
    arrays = [np.unique(np.array(s, dtype=np.int64)) for s in sets]
    a, b = make_perms(16, 42)
    flat = (np.concatenate(arrays) if any(len(x) for x in arrays)
            else np.empty(0, np.int64))
    offsets = np.cumsum([0] + [len(x) for x in arrays[:-1]], dtype=np.int64)
    batched = minhash_flat(flat, offsets, a, b)
    for i, arr in enumerate(arrays):
        single = minhash_flat(arr, np.zeros(1, dtype=np.int64), a, b)[0]
        assert np.array_equal(batched[i], single), i


@settings(max_examples=25, deadline=None)
@given(st.lists(st.lists(int64s, max_size=60), min_size=1, max_size=12))
def test_simhash_segmented_equals_per_row(sets):
    arrays = [np.array(s, dtype=np.int64) for s in sets]
    flat = (np.concatenate(arrays) if any(len(x) for x in arrays)
            else np.empty(0, np.int64))
    offsets = np.cumsum([0] + [len(x) for x in arrays[:-1]], dtype=np.int64)
    batched = _simhash_flat(flat, offsets, len(arrays), 64)
    want = simhash_from_hashes_numpy(arrays, 64)
    assert np.array_equal(batched, want)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(blacklist_categories=("Zs", "Cc")),
                        min_size=1, max_size=24), min_size=1, max_size=40))
def test_token_hash_batch_equals_single(tokens):
    batch = hash_tokens(tokens)
    singles = np.concatenate([hash_tokens([t]) for t in tokens])
    assert np.array_equal(batch, singles)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=300), st.integers(min_value=1, max_value=8))
def test_doc_shingles_sorted_distinct_and_deterministic(text, k):
    a = doc_shingles(text, k)
    b = doc_shingles(text, k)
    assert np.array_equal(a, b)
    assert np.array_equal(a, np.unique(a))  # sorted + distinct
    n_tok = len(text.split())
    if n_tok == 0:
        assert a.size == 0
    else:
        assert 1 <= a.size <= max(1, n_tok - k + 1)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=40),
       st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=40))
def test_union_find_symmetry(a_nodes, b_nodes):
    """Union-find oracle invariants: connected pairs share a root; the root
    is the component minimum."""
    pairs = {(str(min(a, b)).zfill(4), str(max(a, b)).zfill(4))
             for a, b in zip(a_nodes, b_nodes) if a != b}
    nodes = sorted({str(n).zfill(4) for ab in pairs for n in ab})
    if not nodes:
        return
    clusters = _union_find_clusters(nodes, pairs)
    for x, y in pairs:
        assert clusters[x] == clusters[y]
    for n, root in clusters.items():
        assert root <= n
        assert clusters[root] == root


def test_xxh64_known_vectors():
    # public xxHash test vectors (seed 0)
    assert xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) == 0xD24EC4F1A98C6E5B
    # long input exercises the 32-byte stripe loop
    assert xxh64(b"a" * 101, 0) == xxh64(b"a" * 101, 0)
    assert xxh64(b"a" * 101, 0) != xxh64(b"a" * 100, 0)


@settings(max_examples=30, deadline=None)
@given(st.lists(int64s, min_size=1, max_size=50), st.integers(2, 8))
def test_shingle_polynomial_shift_sensitivity(hashes, k):
    """Shifting the token stream by one changes (almost surely) every
    shingle hash — the polynomial combine is position-sensitive within the
    window but translation-invariant across it (same window -> same hash)."""
    th = np.array(hashes, dtype=np.int64).view(np.uint64)
    h1 = shingle_hashes_from_token_hashes(th, k)
    h2 = shingle_hashes_from_token_hashes(th, k)
    assert np.array_equal(h1, h2)
    if len(hashes) > k:
        # the same k-window appearing at two positions hashes identically
        dup = np.concatenate([th[:k], th, th[:k]])
        hd = shingle_hashes_from_token_hashes(dup, k)
        assert hd[0] == hd[k + len(th)]  # window at pos 0 reappears at k+n
