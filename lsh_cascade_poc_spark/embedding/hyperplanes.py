"""Hyperplane generation for vector SimHash (H1/H2/H3).

Reference parity:
  - generate_random_hyperplanes   /root/reference/src/lsh.py:29-43
  - generate_orthogonal_hyperplanes (BOLSH) /root/reference/src/lsh.py:46-71
  - generate_data_sampled_hyperplanes /root/reference/src/lsh.py:74-113

All driver-side numpy, seeded and deterministic; the small (n_planes, dim)
float32 matrices ship to executors by pandas_udf closure capture, the way the
reference ships pickled params (src/itq_lsh.py:204-237).
"""

from __future__ import annotations

import numpy as np


def generate_random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def generate_orthogonal_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """QR-orthonormalized planes; for n_planes > dim, stack independent
    orthonormal blocks (the reference caps at dim and re-draws per block)."""
    rng = np.random.default_rng(seed)
    blocks = []
    remaining = n_planes
    while remaining > 0:
        k = min(dim, remaining)
        m = rng.standard_normal((dim, k))
        q, _ = np.linalg.qr(m)
        blocks.append(q.T[:k])
        remaining -= k
    return np.vstack(blocks).astype(np.float32)


def generate_data_sampled_hyperplanes(
    sample: np.ndarray, n_planes: int, seed: int = 42
) -> np.ndarray:
    """Normalized differences of random data pairs — adapts planes to the
    data distribution. `sample` is a driver-side (m, dim) matrix obtained via
    df.sample(...).toPandas() (bounded, like the reference's <=10k fits)."""
    rng = np.random.default_rng(seed)
    m = sample.shape[0]
    idx_a = rng.integers(0, m, size=n_planes)
    idx_b = rng.integers(0, m, size=n_planes)
    same = idx_a == idx_b
    idx_b[same] = (idx_b[same] + 1) % m
    diff = sample[idx_a] - sample[idx_b]
    norms = np.linalg.norm(diff, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (diff / norms).astype(np.float32)
