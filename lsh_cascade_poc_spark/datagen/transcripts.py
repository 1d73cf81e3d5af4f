"""Deterministic synthetic transcript corpus with planted duplicate families.

The BASELINE.json input_hint fixes the input shape:
    conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp
No such table exists in /root/testdata, so tests and benches synthesize it
here — fully seeded, no wall-clock, no external data (FIXTURES.md §1).

Planted ground truth (FIXTURES.md §1 duplicate families):
  a) exact copy under a new conv_id
  b) light token edits (controls Jaccard ~0.85-0.99)
  c) copy sharing one long verbatim substring, rest rewritten
     (exercises the winnowing/suffix stage; overall Jaccard low)
  d) whitespace-only changes (exercises normalization)
Plus skew: a small set of boilerplate turn texts repeated across a large
fraction of conversations (hot-shingle/hot-band stress).

Outputs: turns_df, gt_pairs (conv_a, conv_b, kind), gt_clusters
(conv_id, cluster_id = lexicographically-min conv_id of the family).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

_VOCAB = [
    # deterministic wordlist: cheap fake of conversational/technical text
    f"tok{i:03d}" for i in range(400)
] + [
    "the", "a", "and", "is", "to", "of", "in", "run", "error", "fix",
    "table", "query", "join", "spark", "hash", "band", "shuffle", "turn",
    "agent", "tool", "call", "result", "ok", "retry", "plan", "step",
]

_BOILERPLATE = [
    "i am an automated assistant how can i help you today with your request",
    "thank you for contacting support your ticket has been received and logged",
    "please review the following output carefully before proceeding to the next step",
]

_ROLES = ["user", "assistant", "tool"]
_TOOLS = [None, "search", "exec", "browse"]

_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)


@dataclass
class SyntheticCorpus:
    turns: pd.DataFrame        # conv_id, turn_idx, role, text, tool, ts
    gt_pairs: pd.DataFrame     # conv_a, conv_b, kind (a<b lexicographically)
    gt_clusters: pd.DataFrame  # conv_id, cluster_id


def _sentence(rng: np.random.Generator, n_words: int) -> str:
    idx = rng.integers(0, len(_VOCAB), size=n_words)
    return " ".join(_VOCAB[i] for i in idx)


def _edit_tokens(rng: np.random.Generator, text: str, edit_rate: float) -> str:
    toks = text.split()
    out = []
    for t in toks:
        r = rng.random()
        if r < edit_rate * 0.5:
            continue  # delete
        if r < edit_rate:
            out.append(_VOCAB[int(rng.integers(0, len(_VOCAB)))])  # substitute
        else:
            out.append(t)
    return " ".join(out) if out else text


def _whitespace_variant(rng: np.random.Generator, text: str) -> str:
    toks = text.split()
    seps = ["  ", " \t ", "   ", " "]
    return "".join(
        t + seps[int(rng.integers(0, len(seps)))] for t in toks
    ).strip()


def generate_corpus(
    n_base: int = 300,
    dup_fraction: float = 0.3,
    boilerplate_fraction: float = 0.25,
    seed: int = 42,
    min_turns: int = 2,
    max_turns: int = 10,
) -> SyntheticCorpus:
    rng = np.random.default_rng(seed)
    rows: list[tuple] = []
    gt_pairs: list[tuple] = []
    families: dict[str, list[str]] = {}

    def emit_conv(conv_id: str, turn_texts: list[str], t0_minute: int) -> None:
        for i, txt in enumerate(turn_texts):
            role = _ROLES[i % len(_ROLES)]
            tool = _TOOLS[int(rng.integers(0, len(_TOOLS)))] if role == "tool" else None
            ts = _EPOCH + timedelta(minutes=t0_minute, seconds=30 * i)
            rows.append((conv_id, np.int32(i), role, txt, tool, ts))

    for b in range(n_base):
        base_id = f"conv{b:06d}"
        n_turns = int(rng.integers(min_turns, max_turns + 1))
        turn_texts = []
        for i in range(n_turns):
            if rng.random() < boilerplate_fraction:
                turn_texts.append(_BOILERPLATE[int(rng.integers(0, len(_BOILERPLATE)))])
            else:
                turn_texts.append(_sentence(rng, int(rng.integers(12, 60))))
        emit_conv(base_id, turn_texts, b * 10)
        family = [base_id]

        if rng.random() < dup_fraction:
            n_variants = int(rng.integers(1, 4))
            for v in range(n_variants):
                kind = ["exact", "edit", "substring", "whitespace"][int(rng.integers(0, 4))]
                var_id = f"{base_id}_dup{v}_{kind}"
                if kind == "exact":
                    var_texts = list(turn_texts)
                elif kind == "whitespace":
                    var_texts = [_whitespace_variant(rng, t) for t in turn_texts]
                elif kind == "edit":
                    # edit_rate 0.015: with k=5 shingles, expected shingle
                    # survival ≈ 0.985^5 ≈ 0.93 -> Jaccard ≈ 0.87, safely
                    # above the 0.8 decision threshold
                    var_texts = [_edit_tokens(rng, t, edit_rate=0.015) for t in turn_texts]
                else:  # substring: keep the longest turn verbatim, rewrite the rest
                    longest = max(range(len(turn_texts)), key=lambda i: len(turn_texts[i]))
                    var_texts = [
                        t if i == longest else _sentence(rng, int(rng.integers(12, 60)))
                        for i, t in enumerate(turn_texts)
                    ]
                emit_conv(var_id, var_texts, b * 10 + v + 1)
                if kind in ("exact", "edit", "whitespace"):
                    # high-similarity family: counted in dup-pair recall
                    family.append(var_id)
                a, c = sorted([base_id, var_id])
                gt_pairs.append((a, c, kind))
        families[base_id] = family

    gt_cluster_rows = []
    for fam in families.values():
        root = min(fam)
        for cid in fam:
            gt_cluster_rows.append((cid, root))

    turns = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    # shuffle row order so nothing downstream can rely on input order
    turns = turns.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    return SyntheticCorpus(
        turns=turns,
        gt_pairs=pd.DataFrame(gt_pairs, columns=["conv_a", "conv_b", "kind"]),
        gt_clusters=pd.DataFrame(gt_cluster_rows, columns=["conv_id", "cluster_id"]),
    )


TURNS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def corpus_to_spark(spark, corpus: SyntheticCorpus):
    turns = spark.createDataFrame(corpus.turns, schema=TURNS_SCHEMA)
    return turns
