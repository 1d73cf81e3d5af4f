"""Incremental (Structured Streaming) dedup: micro-batches discover the same
duplicate pairs the batch pipeline finds, across batch boundaries."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lsh_cascade_poc_spark.config import DedupConfig
from lsh_cascade_poc_spark.datagen.transcripts import generate_corpus
from lsh_cascade_poc_spark.streaming import TURNS_DDL, IncrementalDedup

CFG = DedupConfig(n_perm=32, coarse_n_bands=8, coarse_rows_per_band=4)


def test_incremental_matches_batchwise(spark, tmp_path):
    corpus = generate_corpus(n_base=30, dup_fraction=0.5, seed=11)
    turns = corpus.turns
    convs = sorted(turns.conv_id.unique())
    half = set(convs[: len(convs) // 2])

    src = str(tmp_path / "src")
    os.makedirs(src)
    # batch 1 files, then batch 2 files (complete conversations per file)
    spark.createDataFrame(turns[turns.conv_id.isin(half)], TURNS_DDL) \
        .coalesce(1).write.mode("overwrite").parquet(src + "/b1")

    inc = IncrementalDedup(spark, str(tmp_path / "index"), CFG)
    q = inc.start(src + "/b*", str(tmp_path / "ckpt"), trigger_once=True)
    q.awaitTermination(120)

    spark.createDataFrame(turns[~turns.conv_id.isin(half)], TURNS_DDL) \
        .coalesce(1).write.mode("overwrite").parquet(src + "/b2")
    q2 = inc.start(src + "/b*", str(tmp_path / "ckpt"), trigger_once=True)
    q2.awaitTermination(120)

    got_sigs = inc.signatures()
    assert got_sigs.count() == got_sigs.select("conv_id").distinct().count()

    id_map = {r.doc_id: r.conv_id for r in got_sigs.select("doc_id", "conv_id").collect()}
    got_pairs = {
        tuple(sorted((id_map[r.id_a], id_map[r.id_b])))
        for r in inc.dup_pairs().collect()
    }

    # cross-batch duplicate pairs must be found (exact copies land in
    # different batches whenever base/variant straddle the split)
    cross = [
        (a, b) for a, b in got_pairs
        if (a in half) != (b in half)
    ]
    gt_exact = {
        tuple(sorted((r.conv_a, r.conv_b)))
        for _, r in corpus.gt_pairs.iterrows()
        if r.kind in ("exact", "whitespace")
    }
    missing = {p for p in gt_exact if p not in got_pairs}
    assert not missing, f"streaming missed exact pairs: {missing}"
    if any((a in half) != (b in half) for a, b in gt_exact):
        assert cross, "no cross-batch pairs found despite straddling ground truth"


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """A micro-batch replayed after a crash (done-marker missing, partial or
    full data written) must NOT duplicate index rows: batch-scoped overwrite
    directories make the replay heal whatever the first attempt left."""
    corpus = generate_corpus(n_base=12, dup_fraction=0.5, seed=3)
    batch = spark.createDataFrame(corpus.turns, TURNS_DDL)

    inc = IncrementalDedup(spark, str(tmp_path / "index"), CFG)
    inc.process_batch(batch, 0)
    sigs1 = inc.signatures().count()
    pairs1 = {(r.id_a, r.id_b) for r in inc.dup_pairs().collect()}
    assert sigs1 > 0

    # simulate a crash AFTER the data writes but BEFORE the commit marker:
    # the marker is gone, so the stream replays batch 0 on restart
    os.remove(os.path.join(str(tmp_path / "index"), "_batch_0_done"))
    inc.process_batch(batch, 0)

    assert inc.signatures().count() == sigs1
    assert {(r.id_a, r.id_b) for r in inc.dup_pairs().collect()} == pairs1

    # and a marker-present replay is a no-op
    inc.process_batch(batch, 0)
    assert inc.signatures().count() == sigs1

    # crash mid-write: the first attempt left EXTRA rows (duplicated file)
    # in its own batch dir. The replay must neither keep them (overwrite
    # heals the dir) nor READ them as index state while recomputing
    # (_read_table excludes the replaying batch).
    import glob
    import shutil

    os.remove(os.path.join(str(tmp_path / "index"), "_batch_0_done"))
    sig_dir = os.path.join(str(tmp_path / "index"), "signatures", "batch_id=0")
    a_file = glob.glob(os.path.join(sig_dir, "*.parquet"))[0]
    shutil.copy(a_file, os.path.join(sig_dir, "part-dup-copy.parquet"))
    assert inc.signatures().count() > sigs1  # corruption is visible pre-replay
    inc.process_batch(batch, 0)
    assert inc.signatures().count() == sigs1
    assert {(r.id_a, r.id_b) for r in inc.dup_pairs().collect()} == pairs1
