"""Standalone runner for planted-family dup-pair recall (north-rule clause
1) — generates the deterministic synthetic corpus at the requested size,
runs the full cascade, and prints lsh_cascade_poc_spark/recall.py's report.

bench.py computes the same report untimed during its initial hi-level
pipeline phase; this tool exists for ad-hoc sweeps at other corpus sizes.

Usage: python tools/recall_probe.py [n_base] [cores]
"""

from __future__ import annotations

import json
import sys
import tempfile

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from lsh_cascade_poc_spark.checkpoint import StageStore
    from lsh_cascade_poc_spark.config import DedupConfig
    from lsh_cascade_poc_spark.datagen.transcripts_spark import (
        generate_corpus_distributed,
    )
    from lsh_cascade_poc_spark.pipeline import run_dedup
    from lsh_cascade_poc_spark.recall import recall_report
    from lsh_cascade_poc_spark.session import get_spark

    spark = get_spark(app_name="recall_probe", master=f"local[{cores}]",
                      shuffle_partitions=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    turns = generate_corpus_distributed(spark, n_base=n_base, dup_fraction=0.3,
                                        seed=42)
    cfg = DedupConfig()
    with tempfile.TemporaryDirectory(prefix="recall_probe_") as tmp:
        store = StageStore(spark=spark, work_dir=tmp, config_hash="probe")
        res = run_dedup(spark, turns, cfg=cfg, store=store,
                        enable_overlap_stage=True)
        rep = recall_report(res, cfg)
    rep["n_base"] = n_base
    print(json.dumps(rep, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
