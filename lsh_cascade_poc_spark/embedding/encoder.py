"""Multi-model embedding encoder plumbing (reference S3 companion).

Maps the reference's multi-model comparison loader
(``/root/reference/src/loader_comparison.py:12-141``: a model registry of
three sentence-transformers encoders with per-model dims and passage/query
prefixes, batched ``encode`` with L2-normalized float32 output) onto Spark:
the registry, prefix handling, batching, and output contract are real and
tested; only the neural forward pass itself is gated, per SURVEY §2.1's S3
scoping (model inference needs GPU-class weights that don't belong in a
data engine and aren't in this container).

Execution shape: ``encode_dataframe`` runs the encoder as an Arrow-batched
``mapInPandas`` over the text column — one model load per Python worker
(lazy, inside the iterator closure, exactly like the reference's
``_load_model``), then vectorized batch encodes. At cluster scale each
executor holds one resident model and streams Arrow batches through it; no
driver collect, no per-row Python.

Two encode paths, same Spark-side contract (mirrors ``multimodal.py``):
  real  ``sentence_transformers`` when importable; NotImplementedError
        otherwise (the library is not in this container)
  fake  ``deterministic_fake=True`` — counter-mode blake2b over the
        prefixed text expands to dim components on the (k-127.5)/128 grid,
        then exact L2 normalization; stable across runs, partitionings and
        batch sizes, so schema/partition/batch plumbing is testable here
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Registry mirrors the reference's MODELS table (loader_comparison.py:12-34);
# the three entries are public sentence-transformers model ids.
MODELS = {
    "e5-large": {
        "name": "intfloat/multilingual-e5-large",
        "dim": 1024,
        "passage_prefix": "passage: ",
        "query_prefix": "query: ",
    },
    "bge-m3": {
        "name": "BAAI/bge-m3",
        "dim": 1024,
        "passage_prefix": "",
        "query_prefix": "",
    },
    "jina-v3": {
        "name": "jinaai/jina-embeddings-v3",
        "dim": 1024,
        "passage_prefix": "",
        "query_prefix": "",
        # the reference's _load_model passes trust_remote_code=True for this
        # entry (loader_comparison.py): jina-v3 ships custom modeling code
        # and fails to load without it (ADVICE r5 #1)
        "trust_remote_code": True,
    },
}


@dataclass(frozen=True)
class EncoderConfig:
    model_name: str
    dim: int
    passage_prefix: str
    query_prefix: str
    deterministic_fake: bool = False
    fake_dim: int | None = None  # override dim on the fake path (test-size)
    trust_remote_code: bool = False  # jina-v3 needs it (reference _load_model)
    device: str | None = None        # forwarded to SentenceTransformer when set

    @property
    def out_dim(self) -> int:
        if self.deterministic_fake and self.fake_dim is not None:
            return self.fake_dim
        return self.dim


def get_encoder_config(
    model_name: str,
    deterministic_fake: bool = False,
    fake_dim: int | None = None,
    device: str | None = None,
) -> EncoderConfig:
    if model_name not in MODELS:
        raise ValueError(
            f"Unknown model: {model_name}. Choose from {list(MODELS)}"
        )
    cfg = MODELS[model_name]
    return EncoderConfig(
        model_name=model_name,
        dim=cfg["dim"],
        passage_prefix=cfg["passage_prefix"],
        query_prefix=cfg["query_prefix"],
        deterministic_fake=deterministic_fake,
        fake_dim=fake_dim,
        trust_remote_code=cfg.get("trust_remote_code", False),
        device=device,
    )


def list_models() -> list[str]:
    return list(MODELS)


def apply_prefix(texts: "pd.Series | list[str]", prefix: str):
    """Reference embed_passages/embed_query prefix rule
    (loader_comparison.py:95-98,118-120): prepend only when non-empty."""
    if not prefix:
        return texts
    if isinstance(texts, pd.Series):
        return prefix + texts.astype(str)
    return [f"{prefix}{t}" for t in texts]


def _fake_encode_batch(texts: list[str], model_name: str, dim: int) -> np.ndarray:
    """Deterministic stand-in for the neural forward pass: counter-mode
    blake2b keyed by (model, text) expands each text to `dim` byte-derived
    components on the (k - 127.5)/128 grid, then exact L2 normalization —
    matching the reference encoders' normalize_embeddings=True contract.
    A function of (model_name, prefixed text) only, so it is invariant to
    batch boundaries and partitioning, which is what the plumbing tests pin."""
    out = np.empty((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        seed = f"{model_name}\x00{t}".encode("utf-8", "surrogatepass")
        raw = bytearray()
        counter = 0
        while len(raw) < dim:
            raw.extend(hashlib.blake2b(seed + counter.to_bytes(4, "little"),
                                       digest_size=64).digest())
            counter += 1
        out[i] = (np.frombuffer(bytes(raw[:dim]), dtype=np.uint8)
                  .astype(np.float64) - 127.5) / 128.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (out / norms).astype(np.float32)


def _real_encode_batch(texts: list[str], cfg: EncoderConfig,
                       model_cache: dict) -> np.ndarray:
    try:
        from sentence_transformers import SentenceTransformer
    except ImportError as e:  # pragma: no cover - library absent here
        raise NotImplementedError(
            "sentence-transformers not available in this environment; "
            "use deterministic_fake=True for the plumbing path"
        ) from e
    if "model" not in model_cache:  # one lazy load per worker process
        kwargs = {}
        if cfg.trust_remote_code:
            # reference _load_model: jina-v3 ships custom modeling code and
            # cannot load without trust_remote_code (ADVICE r5 #1)
            kwargs["trust_remote_code"] = True
        if cfg.device is not None:
            kwargs["device"] = cfg.device
        model_cache["model"] = SentenceTransformer(
            MODELS[cfg.model_name]["name"], **kwargs
        )
    emb = model_cache["model"].encode(texts, normalize_embeddings=True)
    return np.asarray(emb, dtype=np.float32)


def encode_dataframe(
    df: DataFrame,
    cfg: EncoderConfig,
    text_col: str = "doc_text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    kind: str = "passage",
) -> DataFrame:
    """S3 encode stage: (id, text) -> (id, model, embedding) via an
    Arrow-batched mapInPandas. `kind` selects the reference's
    passage/query prefix."""
    if kind not in ("passage", "query"):
        raise ValueError("kind must be 'passage' or 'query'")
    prefix = cfg.passage_prefix if kind == "passage" else cfg.query_prefix
    dim = cfg.out_dim
    fake = cfg.deterministic_fake
    model_name = cfg.model_name
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("model", T.StringType(), False),
        T.StructField(out_col, T.ArrayType(T.FloatType()), False),
    ])

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            texts = list(apply_prefix(pdf[text_col].astype(str), prefix))
            if fake:
                vecs = _fake_encode_batch(texts, model_name, dim)
            else:
                # the CAPTURED cfg, not a per-batch get_encoder_config
                # re-derivation: re-deriving dropped every caller-side field
                # except model_name (ADVICE r5 #3)
                vecs = _real_encode_batch(texts, cfg, cache)
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "model": model_name,
                out_col: list(vecs),
            })

    # null text would otherwise be stringified to the literal 'None' and get
    # a plausible-looking embedding (ADVICE r5 #2); the reference loader
    # filters/normalizes text upstream, so drop nulls here too
    src = df.select(id_col, text_col).where(F.col(text_col).isNotNull())
    return src.mapInPandas(encode, schema=out_schema)


def compare_models(
    df: DataFrame,
    cfgs: list[EncoderConfig],
    text_col: str = "doc_text",
    id_col: str = "doc_id",
    sample_size: int = 1000,
    seed: int = 42,
) -> dict:
    """The comparison experiment the reference's loader exists for: encode
    the same corpus under each registered model and report per-model
    embedding-distribution stats (compute_embedding_stats, H16-b) keyed by
    model name. Runs each model as its own encode stage so executors hold
    one model at a time."""
    from lsh_cascade_poc_spark.embedding.itq import compute_embedding_stats

    out = {}
    for cfg in cfgs:
        enc = encode_dataframe(df, cfg, text_col=text_col, id_col=id_col)
        out[cfg.model_name] = compute_embedding_stats(
            enc, vec_col="embedding", id_col=id_col,
            sample_size=sample_size, seed=seed,
        )
    return out
