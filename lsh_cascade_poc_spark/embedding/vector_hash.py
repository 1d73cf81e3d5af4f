"""Vector fingerprinting: SimHash over embeddings, packed into int64 lanes.

Reference parity:
  - SimHashGenerator.hash_batch  /root/reference/src/lsh.py:234-263
    (batch projection (bits, dim) @ (dim, n) -> sign bits -> packed ints)
  - chunk_hash banding           /root/reference/src/lsh.py:266-304
  - hamming_distance             /root/reference/src/lsh.py:307-320
  - multiprobe flips             /root/reference/src/lsh.py:116-146 (H8)

Fingerprints are ``array<long>`` lanes (n_bits/64 elements) — never Python
bigints or hex strings in executors (SURVEY.md §1.4). Hamming over lanes is
the codegen expression sum(bit_count(a[i] ^ b[i])).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def simhash_vectors_numpy(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, dim) x (n_bits, dim) -> (n, n_lanes) int64 lanes. Bit b of the
    fingerprint = sign(planes[b] . v); bit b lives in lane b//64, position
    b%64 — the same packing np.packbits+view would give, kept explicit."""
    n_bits = planes.shape[0]
    assert n_bits % 64 == 0
    proj = vectors.astype(np.float32) @ planes.T.astype(np.float32)  # (n, n_bits)
    bits = (proj > 0).astype(np.uint64)
    n_lanes = n_bits // 64
    lanes = np.zeros((vectors.shape[0], n_lanes), dtype=np.uint64)
    for lane in range(n_lanes):
        chunk = bits[:, lane * 64 : (lane + 1) * 64]
        lanes[:, lane] = (chunk << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64
        )
    return lanes.astype(np.int64)


def make_vector_simhash_udf(planes: np.ndarray):
    """pandas_udf: array<float> embedding -> array<long> fingerprint lanes.
    The plane matrix is captured once per worker (iterator form)."""
    p = planes.astype(np.float32)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def simhash_vec(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            mat = np.stack([np.asarray(v, dtype=np.float32) for v in s])
            lanes = simhash_vectors_numpy(mat, p)
            yield pd.Series(list(lanes))

    return simhash_vec


def hamming_lanes(a: Column, b: Column) -> Column:
    """Total Hamming distance across int64 lanes — pure built-ins:
    aggregate(zip_with(a, b, bit_count(xor)), sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def lane_band_key(lanes: Column, band_idx: int, band_bits: int) -> Column:
    """Extract band `band_idx` of `band_bits` bits from the lane array as a
    long key (chunk_hash analog; band_bits must divide 64)."""
    per_lane = 64 // band_bits
    lane = band_idx // per_lane
    shift = (band_idx % per_lane) * band_bits
    mask = (1 << band_bits) - 1
    return F.shiftrightunsigned(
        F.element_at(lanes, lane + 1), shift
    ).bitwiseAND(F.lit(mask))


def explode_lane_bands(df, lanes_col: str, n_bits: int, band_bits: int,
                       id_col: str = "vec_id"):
    """-> (id, band_id, band_key) exploded band table over a lane fingerprint."""
    n_bands = n_bits // band_bits
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[
                lane_band_key(F.col(lanes_col), b, band_bits) for b in range(n_bands)
            ])
        ).alias("band_id", "band_key"),
    )


def overlap_segment_key(lanes: Column, seg_idx: int, w: int, s: int) -> Column:
    """H18: segment `seg_idx` of the Overlap(w, s) family — the w-bit window
    starting at bit seg_idx*s of the lane-packed fingerprint (reference
    CASCADE_SEARCH_DESIGN.md:17-38: 8-bit windows, 4-bit stride, 31 segments
    over 128 bits; notebook 49). Windows may straddle a 64-bit lane boundary;
    all shifts are static per segment so this stays whole-stage codegen."""
    start = seg_idx * s
    lane, lo = start // 64, start % 64
    mask = (1 << w) - 1
    v = F.shiftrightunsigned(F.element_at(lanes, lane + 1), lo)
    if lo + w > 64:
        # straddle: low bits of the next lane shifted up (lo >= 1 here since
        # w <= 64, so the shift amount 64-lo is a valid 1..63)
        v = v.bitwiseOR(F.shiftleft(F.element_at(lanes, lane + 2), 64 - lo))
    return v.bitwiseAND(F.lit(mask))


def explode_overlap_segments(
    df, lanes_col: str, n_bits: int, w: int, s: int, id_col: str = "vec_id"
):
    """-> (id, band_id, band_key): the segment-index side table
    (CASCADE_SEARCH_DESIGN.md:57-66) as an exploded relation; OR-semantics
    candidate lookup is the same band equi-join as every other tier."""
    n_segs = (n_bits - w) // s + 1
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[
                overlap_segment_key(F.col(lanes_col), i, w, s) for i in range(n_segs)
            ])
        ).alias("band_id", "band_key"),
    )


def multiprobe_band_keys(key: Column, band_bits: int, max_flips: int = 1) -> Column:
    """H8: probe keys = the key plus all single-bit flips (and the key
    itself first). Returns array<long>; explode before the band join."""
    probes = [key]
    for bit in range(band_bits):
        probes.append(key.bitwiseXOR(F.lit(1 << bit)))
    if max_flips >= 2:
        for i in range(band_bits):
            for j in range(i + 1, band_bits):
                probes.append(key.bitwiseXOR(F.lit((1 << i) | (1 << j))))
    return F.array(*probes)
