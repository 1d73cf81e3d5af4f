"""Multi-model encoder plumbing (S3 companion; reference
src/loader_comparison.py:12-141). The neural forward pass is gated (no
sentence-transformers here); everything Spark-side — registry, prefixes,
mapInPandas batching, schema, partition/batch invariance — is exercised on
the deterministic fake path, mirroring the multimodal codec strategy."""

from __future__ import annotations

import numpy as np
import pytest

from lsh_cascade_poc_spark.embedding.encoder import (
    MODELS,
    apply_prefix,
    compare_models,
    encode_dataframe,
    get_encoder_config,
    list_models,
    _fake_encode_batch,
)


def test_registry_matches_reference_surface():
    # loader_comparison.py:12-34 — three models, 1024-dim, e5 prefixed.
    assert list_models() == ["e5-large", "bge-m3", "jina-v3"]
    assert all(MODELS[m]["dim"] == 1024 for m in MODELS)
    cfg = get_encoder_config("e5-large")
    assert cfg.passage_prefix == "passage: " and cfg.query_prefix == "query: "
    assert get_encoder_config("bge-m3").passage_prefix == ""
    with pytest.raises(ValueError):
        get_encoder_config("nope")


def test_prefix_rule():
    assert apply_prefix(["a", "b"], "passage: ") == ["passage: a", "passage: b"]
    assert apply_prefix(["a", "b"], "") == ["a", "b"]


def test_fake_encode_normalized_and_deterministic():
    v1 = _fake_encode_batch(["hello", "world"], "e5-large", 32)
    v2 = _fake_encode_batch(["hello"], "e5-large", 32)
    assert v1.shape == (2, 32) and v1.dtype == np.float32
    # batch-boundary invariance + exact determinism
    assert np.array_equal(v1[0], v2[0])
    assert np.allclose(np.linalg.norm(v1, axis=1), 1.0, atol=1e-6)
    # model key separates encodings of the same text
    v3 = _fake_encode_batch(["hello"], "bge-m3", 32)
    assert not np.array_equal(v1[0], v3[0])


def _docs_df(spark, n=40):
    return spark.createDataFrame(
        [(i, f"doc text number {i} with shared tail") for i in range(n)],
        "doc_id long, doc_text string",
    )


def test_encode_dataframe_schema_and_partition_invariance(spark):
    df = _docs_df(spark)
    cfg = get_encoder_config("e5-large", deterministic_fake=True, fake_dim=16)
    enc = encode_dataframe(df, cfg).orderBy("doc_id").collect()
    assert [f.name for f in encode_dataframe(df, cfg).schema.fields] == [
        "doc_id", "model", "embedding"]
    assert len(enc) == 40
    assert all(r.model == "e5-large" and len(r.embedding) == 16 for r in enc)

    # repartitioning (different Arrow batch boundaries) -> identical vectors
    enc8 = encode_dataframe(df.repartition(8), cfg).orderBy("doc_id").collect()
    for a, b in zip(enc, enc8):
        assert a.doc_id == b.doc_id and a.embedding == b.embedding

    # prefix participates: query-kind differs from passage-kind for e5
    encq = encode_dataframe(df, cfg, kind="query").orderBy("doc_id").collect()
    assert enc[0].embedding != encq[0].embedding
    # ...but not for an unprefixed model
    cfg_b = get_encoder_config("bge-m3", deterministic_fake=True, fake_dim=16)
    assert (
        encode_dataframe(df, cfg_b).orderBy("doc_id").collect()[0].embedding
        == encode_dataframe(df, cfg_b, kind="query").orderBy("doc_id").collect()[0].embedding
    )


def test_real_path_gated(spark):
    df = _docs_df(spark, n=2)
    cfg = get_encoder_config("e5-large")  # real path, library absent here
    with pytest.raises(Exception) as ei:
        encode_dataframe(df, cfg).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_compare_models_stats(spark):
    df = _docs_df(spark, n=60)
    cfgs = [get_encoder_config(m, deterministic_fake=True, fake_dim=16)
            for m in ("e5-large", "bge-m3")]
    stats = compare_models(df, cfgs, sample_size=50)
    assert set(stats) == {"e5-large", "bge-m3"}
    for s in stats.values():
        assert s["n_vectors"] == 60 and s["dim"] == 16
        assert -1.0 <= s["cos_sim_min"] <= s["cos_sim_median"] <= s["cos_sim_max"] <= 1.0
    # different models -> different sampled distributions on the same corpus
    assert stats["e5-large"]["cos_sim_mean"] != stats["bge-m3"]["cos_sim_mean"]


def test_null_text_rows_dropped(spark):
    # ADVICE r5 #2: a null doc_text must be dropped, not stringified to the
    # literal 'None' and given a plausible-looking embedding
    df = spark.createDataFrame(
        [(1, "real text"), (2, None), (3, "more text")],
        "doc_id long, doc_text string",
    )
    cfg = get_encoder_config("e5-large", deterministic_fake=True, fake_dim=16)
    enc = encode_dataframe(df, cfg).orderBy("doc_id").collect()
    assert [r.doc_id for r in enc] == [1, 3]


def test_registry_trust_remote_code_carried():
    # ADVICE r5 #1: jina-v3 requires trust_remote_code at model load; the
    # registry entry must carry it into EncoderConfig so the real path can
    # forward it to SentenceTransformer
    assert get_encoder_config("jina-v3").trust_remote_code is True
    assert get_encoder_config("e5-large").trust_remote_code is False
    assert get_encoder_config("e5-large", device="cpu").device == "cpu"


_HAVE_ST = __import__("importlib.util", fromlist=["util"]).find_spec(
    "sentence_transformers") is not None


@pytest.mark.skipif(not _HAVE_ST, reason="sentence-transformers not installed")
def test_real_encode_smoke(spark):
    # exercised only where the library exists (VERDICT r5 #8): 3 strings in,
    # (3, dim) normalized float32 out
    df = _docs_df(spark, n=3)
    cfg = get_encoder_config("e5-large")
    enc = encode_dataframe(df, cfg).orderBy("doc_id").collect()
    assert len(enc) == 3 and all(len(r.embedding) == cfg.dim for r in enc)
    for r in enc:
        assert abs(float(np.linalg.norm(r.embedding)) - 1.0) < 1e-3
