"""Streaming-path throughput measurement (VERDICT r4 #6).

Ingests the cached bench corpus into IncrementalDedup as N sequential
micro-batches (complete conversations per batch, hash-partitioned) with
index COMPACTION enabled, and reports per-batch walls + end-to-end turns/s.
The claim under test: per-batch wall stays FLAT as the persistent index
grows — the probe-join (new docs x index) and the compacted file listing
must not degrade with stream history. Correctness of this path vs the batch
pipeline is pinned separately by tests/test_streaming.py.

Usage: python tools/stream_bench.py [n_batches] [corpus_dir]
Prints one JSON line: {"n_batches": ..., "walls": [...], "turns_per_sec": ...,
"first_half_mean": ..., "second_half_mean": ..., "n_dup_pairs": ...}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from lsh_cascade_poc_spark.session import get_spark  # noqa: E402
from lsh_cascade_poc_spark.streaming import IncrementalDedup  # noqa: E402


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    corpus = (
        sys.argv[2] if len(sys.argv) > 2
        else os.path.join(REPO, ".bench_cache", "turns_v2_n20000_seed42")
    )
    spark = get_spark(
        app_name="stream_bench", master="local[4]", shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    turns = spark.read.parquet(corpus)
    n_turns = turns.count()

    with tempfile.TemporaryDirectory(prefix="stream_bench_") as tmp:
        # compact_every=8: at 24 batches compaction fires inside the
        # measured window (twice), so its cost AND its file-listing benefit
        # are both in the recorded walls
        inc = IncrementalDedup(
            spark, os.path.join(tmp, "index"), compact_every=8,
        )
        walls: list[float] = []
        for b in range(n_batches):
            # batch materialized OUTSIDE the timed window: the wall measures
            # the incremental-dedup work, not the synthetic batch carving
            batch = turns.filter(
                F.pmod(F.xxhash64("conv_id"), F.lit(n_batches)) == b
            ).localCheckpoint(eager=True)
            t0 = time.perf_counter()
            inc.process_batch(batch, b)
            walls.append(round(time.perf_counter() - t0, 2))
            print(f"batch {b}: {walls[-1]}s", file=sys.stderr, flush=True)
        n_pairs = inc.dup_pairs().count()

    half = n_batches // 2
    out = {
        "n_batches": n_batches,
        "n_turns": n_turns,
        "walls": walls,
        "turns_per_sec": round(n_turns / sum(walls), 1),
        # flat-wall evidence: the second half of the stream (index 2x-4x
        # larger) must not be meaningfully slower than the first
        "first_half_mean": round(sum(walls[:half]) / half, 2),
        "second_half_mean": round(sum(walls[half:]) / (n_batches - half), 2),
        "n_dup_pairs": n_pairs,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
