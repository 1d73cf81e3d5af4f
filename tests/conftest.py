"""Shared fixtures — mirrors the reference's seeded-fixture style
(/root/reference/tests/conftest.py:9-42: seeded generators, tiny corpora,
in-memory DB). One session-scoped local SparkSession; seeded synthetic
transcript corpora at two sizes."""

from __future__ import annotations

import pytest

from lsh_cascade_poc_spark.datagen.transcripts import (
    SyntheticCorpus,
    corpus_to_spark,
    generate_corpus,
)
from lsh_cascade_poc_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus() -> SyntheticCorpus:
    """~50 base convs — the reference's 50-doc pipeline fixture scale
    (tests/test_pipeline.py:15-47)."""
    return generate_corpus(n_base=50, dup_fraction=0.4, seed=42)


@pytest.fixture(scope="session")
def small_corpus() -> SyntheticCorpus:
    """~300 base convs — oracle-level e2e."""
    return generate_corpus(n_base=300, dup_fraction=0.3, seed=7)


@pytest.fixture(scope="session")
def tiny_turns(spark, tiny_corpus):
    return corpus_to_spark(spark, tiny_corpus).cache()


@pytest.fixture(scope="session")
def small_turns(spark, small_corpus):
    return corpus_to_spark(spark, small_corpus).cache()
