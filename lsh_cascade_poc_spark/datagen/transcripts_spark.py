"""Distributed deterministic transcript generator (bench-scale corpora).

The pandas generator (transcripts.py) builds the whole corpus on the driver —
fine for tests (<=1M turns), not for multi-million-turn bench corpora. This
one expands `spark.range(n_base)` with mapInPandas: each base-conversation
index derives its own rng (seeded by (seed, index) only), generates the base
conversation AND its duplicate variants in place, so output is deterministic
under ANY partitioning and there are no cross-row dependencies.

Same corpus shape as transcripts.py: duplicate families (exact / edit /
substring / whitespace), boilerplate skew.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .transcripts import (
    _BOILERPLATE,
    _ROLES,
    _TOOLS,
    _VOCAB,
    _edit_tokens,
    _sentence,
    _whitespace_variant,
)

TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)

_EPOCH_US = int(datetime(2026, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)


def _gen_conv_rows(base_idx: int, seed: int, dup_fraction: float,
                   boilerplate_fraction: float, min_turns: int,
                   max_turns: int) -> list[tuple]:
    rng = np.random.default_rng((seed << 32) ^ base_idx)
    rows: list[tuple] = []

    def emit(conv_id: str, texts: list[str], minute: int) -> None:
        for i, txt in enumerate(texts):
            role = _ROLES[i % len(_ROLES)]
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else None
            ts_us = _EPOCH_US + minute * 60_000_000 + i * 30_000_000
            rows.append((conv_id, np.int32(i), role, txt, tool,
                         pd.Timestamp(ts_us, unit="us")))

    base_id = f"conv{base_idx:09d}"
    n_turns = int(rng.integers(min_turns, max_turns + 1))
    texts = []
    for _ in range(n_turns):
        if rng.random() < boilerplate_fraction:
            texts.append(_BOILERPLATE[int(rng.integers(0, len(_BOILERPLATE)))])
        else:
            texts.append(_sentence(rng, int(rng.integers(12, 60))))
    emit(base_id, texts, base_idx % 100_000 * 10)

    if rng.random() < dup_fraction:
        n_variants = int(rng.integers(1, 4))
        for v in range(n_variants):
            kind = ["exact", "edit", "substring", "whitespace"][int(rng.integers(0, 4))]
            var_id = f"{base_id}_dup{v}_{kind}"
            if kind == "exact":
                var_texts = list(texts)
            elif kind == "whitespace":
                var_texts = [_whitespace_variant(rng, t) for t in texts]
            elif kind == "edit":
                var_texts = [_edit_tokens(rng, t, edit_rate=0.015) for t in texts]
            else:
                longest = max(range(len(texts)), key=lambda i: len(texts[i]))
                var_texts = [
                    t if i == longest else _sentence(rng, int(rng.integers(12, 60)))
                    for i, t in enumerate(texts)
                ]
            emit(var_id, var_texts, base_idx % 100_000 * 10 + v + 1)
    return rows


def generate_corpus_distributed(
    spark: SparkSession,
    n_base: int,
    dup_fraction: float = 0.3,
    boilerplate_fraction: float = 0.25,
    seed: int = 42,
    min_turns: int = 2,
    max_turns: int = 10,
    n_partitions: int = 64,
) -> DataFrame:
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for base_idx in pdf["id"]:
                rows.extend(
                    _gen_conv_rows(int(base_idx), seed, dup_fraction,
                                   boilerplate_fraction, min_turns, max_turns)
                )
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.range(n_base).repartition(n_partitions)
        .mapInPandas(expand, schema=TURNS_SCHEMA)
    )
