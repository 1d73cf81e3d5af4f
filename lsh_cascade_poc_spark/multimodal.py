"""Multimodal column plumbing: opaque binary payloads + typed metadata.

No reference analog (the reference is text+vector only); this is the
training-data-pipeline extension the engine ships as first-class: image /
audio / video payloads travel as ``binary`` columns with a typed metadata
struct, and per-modality kernels (decode, feature-extract, resize,
frame-sample) run as Arrow-batched ``mapInPandas`` operators.

Codec reality, by modality (VERDICT r2 #8):
  audio  REAL decode via the stdlib ``wave`` module (WAV/PCM) — executable
         in this container and covered by tests/test_multimodal.py
  image  REAL decode via PIL when importable (env-gated test, skipped where
         PIL is absent), NotImplementedError otherwise
  video  stubbed: no public stdlib demuxer; NotImplementedError
With ``deterministic_fake=True`` (the default used by the synthetic corpus,
whose payloads are random bytes, not valid containers) kernels derive
features from the payload bytes via seeded hashing (stable, testable).
Everything Spark-side — schemas, batch iteration, partitioning, output
contracts — is identical on both paths.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),   # image | audio | video
    T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("codec", T.StringType(), True),
    ]), True),
])

FEATURE_DIM = 64


def _real_decode_to_array(payload: bytes, modality: str, n: int) -> np.ndarray:
    """Real decode per modality -> fixed-dim float32 feature (zero-padded
    sample/pixel prefix). Raises NotImplementedError exactly where a codec
    is genuinely unavailable on this host."""
    import io

    if payload is None:
        return np.zeros(n, dtype=np.float32)
    if modality == "audio":
        import wave

        with wave.open(io.BytesIO(bytes(payload))) as w:
            width = w.getsampwidth()
            raw = w.readframes(min(w.getnframes(), n))
        if width != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        samples = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        out = np.zeros(n, dtype=np.float32)
        out[: min(n, samples.size)] = samples[:n]
        return out
    if modality == "image":
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image codec (PIL) not available in this environment"
            ) from e
        img = Image.open(io.BytesIO(bytes(payload))).convert("L").resize((8, 8))
        px = np.asarray(img, dtype=np.float32).ravel() / 255.0
        out = np.zeros(n, dtype=np.float32)
        out[: min(n, px.size)] = px[:n]
        return out
    raise NotImplementedError(
        f"{modality} codec not available in this environment"
    )


def _fake_decode_to_array(payload: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in for a codec: expand payload bytes into a
    float32 array via counter-mode sha256 (stable across runs/partitions).

    Component i is (nibble_i - 7.5) / 8 over the digest's hex nibbles
    (counter-mode rehash past 64 components): every value is exactly
    representable in float32 (k/16 grid), so the feature — and the sign-bit
    SimHash over it — is reproducible in integer SQL, which is what lets
    q_media_dedup carry a hash-exact DuckDB oracle (r5; previously
    np.default_rng standard_normal, unpinnable cross-engine). A fake
    decoder's values are arbitrary by definition; this one is chosen to be
    cross-engine exact while keeping the distribution centered."""
    if payload is None:
        return np.zeros(n, dtype=np.float32)
    nibbles: list[int] = []
    digest = hashlib.sha256(bytes(payload)).hexdigest()
    counter = 0
    while len(nibbles) < n:
        nibbles.extend(int(c, 16) for c in digest)
        counter += 1
        if len(nibbles) < n:
            digest = hashlib.sha256(
                bytes(payload) + counter.to_bytes(4, "little")
            ).hexdigest()
    vals = (np.asarray(nibbles[:n], dtype=np.float64) - 7.5) / 8.0
    return vals.astype(np.float32)


def extract_features(
    media: DataFrame, deterministic_fake: bool = True, dim: int = FEATURE_DIM
) -> DataFrame:
    """media(media_id, modality, payload, meta) ->
    (media_id, modality, feature: array<float>). The real build would decode
    payload with the modality's codec and run a feature extractor; the Spark
    contract (Arrow batches in, fixed-dim float vector out) is identical."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if deterministic_fake:
                feats = [
                    list(map(float, _fake_decode_to_array(p, dim)))
                    for p in pdf["payload"]
                ]
            else:
                feats = [
                    list(map(float, _real_decode_to_array(p, m, dim)))
                    for p, m in zip(pdf["payload"], pdf["modality"])
                ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "feature": feats,
            })

    return media.select("media_id", "modality", "payload").mapInPandas(
        kernel, schema=out_schema
    )


def resize_images(
    media: DataFrame, target_w: int, target_h: int, deterministic_fake: bool = True
) -> DataFrame:
    """Image resize contract: binary in -> binary out + updated meta. The
    fake path re-stamps metadata and truncates/pads the payload to the
    target pixel budget so downstream size accounting is exercised."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ])
    budget = target_w * target_h

    def _real_resize(p):
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                "image codec (PIL) not available in this environment"
            ) from e
        import io

        img = Image.open(io.BytesIO(bytes(p))).resize((target_w, target_h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if deterministic_fake:
                payloads = [
                    (bytes(p)[:budget]).ljust(budget, b"\0") if p is not None else None
                    for p in pdf["payload"]
                ]
            else:
                payloads = [
                    _real_resize(p) if p is not None else None
                    for p in pdf["payload"]
                ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "width": target_w,
                "height": target_h,
            })

    return (
        media.filter(F.col("modality") == "image")
        .select("media_id", "payload")
        .mapInPandas(kernel, schema=out_schema)
    )


def sample_video_frames(
    media: DataFrame, every_n: int, deterministic_fake: bool = True
) -> DataFrame:
    """Frame-sample contract: one output row per kept frame (explode shape).
    Fake path slices the payload into n_frames equal chunks and keeps every
    n-th; a real build would demux with the container's codec."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("codec not available in this environment")
            ids, idxs, frames = [], [], []
            for mid, p, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                n_frames = (meta or {}).get("n_frames") or 0
                if not p or not n_frames:
                    continue
                b = bytes(p)
                step = max(1, len(b) // n_frames)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[fi * step : (fi + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return (
        media.filter(F.col("modality") == "video")
        .select("media_id", "payload", "meta")
        .mapInPandas(kernel, schema=out_schema)
    )


def media_dedup_pairs(media: DataFrame, hamming_tau: int = 6,
                      deterministic_fake: bool = True) -> DataFrame:
    """Embedding-cosine near-dup over media features: feature extraction ->
    sign-bit SimHash (identity hyperplanes) -> band join + Hamming filter.
    Reuses the text pipeline's banding machinery, proving the dedup engine is
    modality-agnostic once a feature column exists."""
    feats = extract_features(media, deterministic_fake)
    signbit = (
        "aggregate(sequence(0, 63), 0L,"
        " (acc, i) -> acc + IF(element_at(feature, i + 1) > 0.0F, shiftleft(1L, i), 0L))"
    )
    sigs = feats.select("media_id", F.expr(signbit).alias("h"))
    bands = sigs.select(
        "media_id", "h",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("h"), i * 16).bitwiseAND(F.lit(0xFFFF))
            for i in range(4)
        ])).alias("band_id", "band_key"),
    )
    a = bands.select("band_id", "band_key", F.col("media_id").alias("id_a"),
                     F.col("h").alias("h_a"))
    b = bands.select("band_id", "band_key", F.col("media_id").alias("id_b"),
                     F.col("h").alias("h_b"))
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= hamming_tau)
        .select("id_a", "id_b")
        .distinct()
    )


def synthetic_media(spark, n: int = 50, seed: int = 42,
                    dup_fraction: float = 0.2) -> DataFrame:
    """Deterministic fake media corpus with planted exact-payload duplicates."""
    rng = np.random.default_rng(seed)
    rows = []
    mid = 0
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8))
        meta = {
            "width": 640 if modality == "image" else None,
            "height": 480 if modality == "image" else None,
            "sample_rate": 16000 if modality == "audio" else None,
            "n_frames": 12 if modality == "video" else None,
            "codec": "fake",
        }
        rows.append((mid, modality, payload, meta))
        mid += 1
        if rng.random() < dup_fraction:
            rows.append((mid, modality, payload, meta))  # exact payload dup
            mid += 1
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
