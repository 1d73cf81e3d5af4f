"""Stateful streaming operators: cross-batch conversation assembly
(applyInPandasWithState) and watermarked windowed turn statistics.

streaming.py's foreachBatch dedup assumes complete conversations per
micro-batch. This module removes that assumption: turns for one conv_id may
arrive across MANY micro-batches (and late, within the watermark delay);
per-conversation state accumulates (turn_idx, payload) pairs and the
assembled document is emitted when the EVENT-TIME timeout fires — i.e. when
the watermark passes last_turn_ts + gap, the same session-gap semantics as
the batch q_sessionize operator.

Output rows are identical to the batch assembler's (operators/assemble.py):
turns sorted by turn_idx, role-prefixed, newline-joined — per-turn text
equality under stable turn ordering holds regardless of arrival order
(asserted in tests/test_streaming_state.py against assemble_conversations).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ASSEMBLED_SCHEMA = (
    "conv_id string, doc_text string, n_turns int, first_ts timestamp, "
    "last_ts timestamp"
)
# state: parallel arrays of turn payloads + tracking timestamps (epoch us)
_STATE_SCHEMA = (
    "turn_idxs array<int>, payloads array<string>, first_us long, last_us long"
)

_TURN_SEP = "\n"


def _assembled_row(conv_id: str, idxs: list, payloads: list,
                   first_us: int, last_us: int) -> pd.DataFrame:
    order = sorted(range(len(idxs)), key=lambda i: (idxs[i], payloads[i]))
    return pd.DataFrame({
        "conv_id": [conv_id],
        "doc_text": [_TURN_SEP.join(payloads[i] for i in order)],
        "n_turns": [len(idxs)],
        "first_ts": [pd.Timestamp(first_us, unit="us")],
        "last_ts": [pd.Timestamp(last_us, unit="us")],
    })


def make_assemble_state_fn(gap_seconds: int):
    """applyInPandasWithState function: accumulate turns per conv_id, emit
    the assembled document when the watermark passes last_ts + gap."""

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if state.hasTimedOut:
            idxs, payloads, first_us, last_us = state.get
            state.remove()
            yield _assembled_row(conv_id, list(idxs), list(payloads),
                                 first_us, last_us)
            return

        idxs: list = []
        payloads: list = []
        first_us = None
        last_us = None
        if state.exists:
            s_idxs, s_payloads, s_first, s_last = state.get
            idxs, payloads = list(s_idxs), list(s_payloads)
            first_us, last_us = s_first, s_last

        for pdf in pdfs:
            for _, row in pdf.iterrows():
                idxs.append(int(row["turn_idx"]))
                # concat_ws(': ', role, text) semantics (batch parity): nulls
                # are SKIPPED, not stringified — role-null yields bare text,
                # text-null yields bare role, both-null yields ""
                parts = [
                    str(v)
                    for v in (row["role"], row["text"])
                    if not (v is None or (isinstance(v, float) and pd.isna(v)))
                ]
                payloads.append(": ".join(parts))
                ts_us = int(pd.Timestamp(row["ts"]).value // 1000)
                first_us = ts_us if first_us is None else min(first_us, ts_us)
                last_us = ts_us if last_us is None else max(last_us, ts_us)

        state.update((idxs, payloads, first_us, last_us))
        # event-time timeout: fires when the WATERMARK (not wall clock)
        # passes last turn + gap — late turns within the watermark delay
        # still join their conversation
        state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        return
        yield  # pragma: no cover — makes fn a generator in the non-emit path

    return fn


def assemble_conversations_stream(
    turns_stream: DataFrame,
    gap_seconds: int = 60,
    watermark_delay: str = "10 seconds",
    max_turn_chars: int = 2048,
    min_doc_chars: int = 10,
) -> DataFrame:
    """turns readStream -> assembled-documents stream. One shuffle on
    conv_id; per-group state is O(turns of that conversation). Per-turn
    normalization runs as the SAME Spark expression as the batch assembler
    (operators/assemble.py) BEFORE the stateful operator, so batch and
    stream produce byte-identical doc_text for the same turns."""
    from .functions.text import is_valid_text, normalize_text

    prepared = turns_stream.select(
        "conv_id", "turn_idx", "role",
        normalize_text(F.col("text"), max_chars=max_turn_chars).alias("text"),
        "ts",
    )
    out = (
        prepared.withWatermark("ts", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            make_assemble_state_fn(gap_seconds),
            outputStructType=ASSEMBLED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return out.filter(is_valid_text(F.col("doc_text"), min_doc_chars))


def windowed_turn_stats(
    turns_stream: DataFrame,
    window: str = "1 minute",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (the task's 'windowed aggs
    for late data'): turns + distinct convs + chars per (window, role).
    Append mode: a window finalizes once the watermark passes its end."""
    return (
        turns_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window).alias("w"), F.col("role"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.approx_count_distinct("conv_id").alias("n_convs"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role", "n_turns", "n_convs",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )
