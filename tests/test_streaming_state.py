"""Stateful streaming assembly (applyInPandasWithState) + watermarked
windowed aggregation: turns arriving across micro-batches — including a LATE
turn within the watermark delay — assemble into documents byte-identical to
the batch assembler's output."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lsh_cascade_poc_spark.operators.assemble import assemble_conversations
from lsh_cascade_poc_spark.streaming import TURNS_DDL
from lsh_cascade_poc_spark.streaming_state import (
    assemble_conversations_stream,
    windowed_turn_stats,
)

T0 = pd.Timestamp("2026-01-01 10:00:00")


def _turn(conv, idx, role, text, sec):
    return (conv, idx, role, text, None,
            (T0 + pd.Timedelta(seconds=sec)).to_pydatetime())


BATCH_1 = [
    _turn("convA", 0, "user", "hello there how are you today", 0),
    _turn("convA", 1, "assistant", "doing great thanks for asking", 5),
    _turn("convB", 0, "user", "what is the capital of France", 2),
]
# convA turn 2 arrives LATE (event time 8s, after B1's max of 5s) but within
# the 10s watermark delay; convZ far in the future pushes the watermark past
# every conversation's gap timeout
BATCH_2 = [
    _turn("convA", 2, "user", "one more question about spark", 8),
    _turn("convB", 1, "assistant", "the capital of France is Paris", 10),
    _turn("convZ", 0, "user", "much later conversation to advance the watermark", 600),
]
# empty-ish batch far in the future: fires the remaining event-time timeouts
BATCH_3 = [
    _turn("convZ2", 0, "user", "even later to flush remaining state", 3600),
]


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, TURNS_DDL).coalesce(1) \
        .write.mode("overwrite").parquet(path)


def _run_stream(spark, src_glob, ckpt, out_dir):
    stream = spark.readStream.schema(TURNS_DDL).parquet(src_glob)
    assembled = assemble_conversations_stream(
        stream, gap_seconds=60, watermark_delay="10 seconds"
    )
    q = (
        assembled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stateful_assembly_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)

    # three restarts over a growing directory = three micro-batch rounds
    _write_batch(spark, BATCH_1, src + "/b1")
    _run_stream(spark, src + "/b*", ckpt, out)
    _write_batch(spark, BATCH_2, src + "/b2")
    _run_stream(spark, src + "/b*", ckpt, out)
    _write_batch(spark, BATCH_3, src + "/b3")
    _run_stream(spark, src + "/b*", ckpt, out)

    got = {
        r.conv_id: (r.doc_text, r.n_turns, r.first_ts, r.last_ts)
        for r in spark.read.parquet(out).collect()
    }
    # convA and convB timed out once the watermark passed last_ts + 60s
    assert "convA" in got and "convB" in got

    # parity: byte-identical to the batch assembler over the SAME turns,
    # even though convA's turn 2 arrived late in a later micro-batch
    batch_docs = {
        r.conv_id: (r.doc_text, r.n_turns, r.first_ts, r.last_ts)
        for r in assemble_conversations(
            spark.createDataFrame(BATCH_1 + BATCH_2, TURNS_DDL)
        ).collect()
    }
    for conv in ("convA", "convB"):
        assert got[conv] == batch_docs[conv], conv
    assert got["convA"][1] == 3  # the late turn made it in


def test_windowed_turn_stats(spark, tmp_path):
    src = str(tmp_path / "wsrc")
    os.makedirs(src)
    _write_batch(spark, BATCH_1 + BATCH_2, src + "/b1")
    stream = spark.readStream.schema(TURNS_DDL).parquet(src + "/b*")
    stats = windowed_turn_stats(stream, window="1 minute",
                                watermark_delay="10 seconds")
    q = (
        stats.writeStream.format("memory").queryName("winstats")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from winstats").collect()
    # windows are finalized only once the watermark passes their end: the
    # 10:00 window (5 turns) closes thanks to convZ at +600s; convZ's own
    # window stays open (no later data) and is NOT emitted in append mode
    by_role = {(r.window_start, r.role): r.n_turns for r in rows}
    assert sum(v for (w, _), v in by_role.items() if w == T0) == 5
    assert all(w == T0 for (w, _) in by_role)