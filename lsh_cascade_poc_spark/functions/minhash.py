"""MinHash signatures — Arrow-vectorized pandas_udf over hashed shingle sets.

Reference analog: the 128-bit binary fingerprint pipeline
(/root/reference/src/lsh.py:234-263 batch SimHash; /root/reference/src/itq_lsh.py:130-161
ITQ transform). Like the reference we compute fingerprints with *batched numpy
kernels* (src/lsh.py:249-253 does one (bits, dim) @ (dim, n) matmul per batch);
here the batch arrives as an Arrow RecordBatch inside a pandas_udf, and the
kernel is a (n_perm, total_shingles) universal-hash + segmented min-reduce.

Universal hash family: h_i(x) = (a_i * fold32(x) + b_i) mod p, p = 2^61 - 1.
fold32 xor-folds the 64-bit shingle hash to 32 bits so a_i * x fits in uint64
with NO silent overflow — the kernel is exactly reproducible in pure numpy
(minhash_numpy), which is the test oracle for batch==reference parity
(mirrors /root/reference/tests/test_lsh.py:66-72 batch≡single).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import MERSENNE_P

_P = np.uint64(MERSENNE_P)
_MASK32 = np.uint64(0xFFFFFFFF)
_EMPTY_SENTINEL = np.int64(MERSENNE_P)  # signature lane for empty shingle sets


def make_perms(n_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameter vectors, uint64. a in [1, 2^31),
    b in [0, p). Derived from seed only — broadcast to executors by closure
    capture, like the reference ships its pickled hyperplane/ITQ params
    (src/itq_lsh.py:204-237)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_P, size=n_perm, dtype=np.uint64)
    return a, b


def _fold32(x: np.ndarray) -> np.ndarray:
    """xor-fold int64 shingle hashes to 32 bits (uint64 dtype, values < 2^32)."""
    u = x.astype(np.uint64, copy=False)
    return (u ^ (u >> np.uint64(32))) & _MASK32


def minhash_flat(
    flat: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    max_block_elems: int = 32_000_000,
) -> np.ndarray:
    """Core kernel: flat int64 shingle hashes + row offsets -> (n_rows, n_perm)
    int64 signature matrix. Segmented min via np.minimum.reduceat; permutation
    blocks sized to bound peak memory."""
    n_perm = len(a)
    n_rows = len(offsets)
    out = np.empty((n_rows, n_perm), dtype=np.int64)
    if flat.size == 0:
        out[:] = _EMPTY_SENTINEL
        return out

    x32 = _fold32(flat)
    lengths = np.diff(np.append(offsets, flat.size))
    empty_rows = lengths == 0
    # reduceat requires strictly valid indices; clamp empty-row offsets
    safe_offsets = np.minimum(offsets, flat.size - 1).astype(np.intp)

    block = max(1, min(n_perm, max_block_elems // max(1, flat.size)))
    for s in range(0, n_perm, block):
        e = min(n_perm, s + block)
        h = (a[s:e, None] * x32[None, :] + b[s:e, None]) % _P  # (blk, total)
        mins = np.minimum.reduceat(h, safe_offsets, axis=1)     # (blk, n_rows)
        out[:, s:e] = mins.T.astype(np.int64)
    out[empty_rows, :] = _EMPTY_SENTINEL
    return out


def minhash_numpy(shingle_sets: list[np.ndarray], n_perm: int, seed: int) -> np.ndarray:
    """Reference implementation over a list of per-doc shingle-hash arrays.
    Test oracle: must equal the pandas_udf output lane-for-lane."""
    a, b = make_perms(n_perm, seed)
    if not shingle_sets:
        return np.empty((0, n_perm), dtype=np.int64)
    flat = (
        np.concatenate([np.asarray(s, dtype=np.int64) for s in shingle_sets])
        if any(len(s) for s in shingle_sets)
        else np.empty(0, dtype=np.int64)
    )
    offsets = np.cumsum([0] + [len(s) for s in shingle_sets[:-1]], dtype=np.int64)
    return minhash_flat(flat, offsets, a, b)


def make_minhash_udf(n_perm: int, seed: int):
    """pandas_udf: array<long> shingle hashes -> array<long> signature.
    Iterator form so permutation params are materialized once per worker,
    not once per batch."""
    a, b = make_perms(n_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def minhash_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            arrays = [
                np.asarray(v, dtype=np.int64) if v is not None else np.empty(0, np.int64)
                for v in s
            ]
            lengths = np.fromiter((len(x) for x in arrays), dtype=np.int64, count=len(arrays))
            flat = np.concatenate(arrays) if arrays and lengths.sum() else np.empty(0, np.int64)
            offsets = np.zeros(len(arrays), dtype=np.int64)
            if len(arrays) > 1:
                np.cumsum(lengths[:-1], out=offsets[1:])
            sig = minhash_flat(flat, offsets, a, b)
            yield pd.Series(list(sig))

    return minhash_udf


def jaccard_estimate_from_signatures(sig_a: "F.Column", sig_b: "F.Column") -> "F.Column":
    """MinHash Jaccard estimate = fraction of agreeing lanes — pure built-ins
    (used as a cheap pre-verify prune; exact verify uses shingle sets)."""
    agree = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: (x == y).cast("int")), lambda v: v == 1)
    )
    return agree / F.size(sig_a)
