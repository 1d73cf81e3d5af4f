"""Benchmark harness — prints ONE JSON line per the driver contract.

Measures:
  1. operator queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR (default
     /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
  2. the headline dedup cascade over a deterministic synthetic transcript
     corpus (~600k turns, cached as parquet under .bench_cache/), at TWO
     parallelism levels (N and N/4 cores) on identical input — the north
     rule's N->4N scaling-efficiency evidence (BASELINE.md: the reference
     publishes no multi-node numbers, so scaling is evidenced by two local
     parallelism levels; see also SURVEY.md §6).

Output: {"metric": "...", "value": total_sec, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "turns_per_sec_hi": ..., "turns_per_sec_lo": ...,
         "scaling_efficiency": ..., "cores_hi": N, "cores_lo": N/4}
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
# ~40k base convs -> ~385k turns / ~64k docs. r1 used 250k base (~2.4M turns)
# and blew the driver budget: 4 cascade runs (warm+cold x two parallelism
# levels) never finished. Sized so per-run compute dominates the fixed
# driver/scheduling constant (the scaling-efficiency comparison is
# meaningless when wall is all constant) while the whole bench lands in
# ~10 minutes; raise BENCH_N_BASE for ad-hoc larger runs.
BENCH_TURNS_BASE = int(os.environ.get("BENCH_N_BASE", "40000"))
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


def _mk_spark(cores: int):
    from lsh_cascade_poc_spark.session import get_spark

    # IDENTICAL shuffle partitioning at BOTH parallelism levels (keyed to the
    # hi level): the north rule's N->4N comparison varies EXECUTORS ONLY — a
    # real job's partitioning is fixed by the data, not re-tuned per cluster
    # size. Giving the lo level 4x-fewer/4x-bigger tasks would hand it a
    # per-task-overhead discount and corrupt the efficiency ratio.
    return get_spark(
        app_name=f"bench_{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(8, CPUS * 2),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _run_pipeline(spark, turns_path: str, warmup: bool = True) -> tuple[float, float, int, int]:
    """Full cascade -> (warm_wall_sec, cold_wall_sec, n_turns, n_clusters).

    Two runs per session: the first inflates this sandbox VM's ballooned
    memory (page first-touch is served by a serialized fault handler at
    ~6 MB/s, costing 300+ seconds REGARDLESS of core count — measured:
    signatures stage 316s at 32 cores vs 377s at 8 cores on identical input);
    the second run reuses worker/JVM memory pools and is the CPU-bound
    steady-state a real cluster sees. Throughput and scaling efficiency are
    reported from the warm run; the cold wall is reported alongside.
    """
    from lsh_cascade_poc_spark.config import DedupConfig
    from lsh_cascade_poc_spark.pipeline import run_dedup

    turns = spark.read.parquet(turns_path)
    n_turns = turns.count()
    cfg = DedupConfig()

    def once() -> tuple[float, int]:
        import gc

        t0 = time.perf_counter()
        res = run_dedup(spark, turns, cfg=cfg, enable_overlap_stage=True)
        n_clusters = res.clusters.select("cluster_id").distinct().count()
        wall = time.perf_counter() - t0
        # drop Python refs so ContextCleaner can release localCheckpoint
        # blocks; do NOT System.gc() — full GC uncommits G1 regions and
        # re-faulting them costs more than the blocks (run_dedup already
        # unpersists its heavy intermediates explicitly)
        del res
        gc.collect()
        return wall, n_clusters

    cold_wall, n_clusters = once()
    warm_wall = cold_wall
    if warmup:
        warm_wall, n_clusters2 = once()
        assert n_clusters2 == n_clusters, "pipeline nondeterministic across runs"
    return warm_wall, cold_wall, n_turns, n_clusters


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

    spark = _mk_spark(CPUS)
    turns_path = _ensure_corpus(spark)

    qmap = entrymod.queries()
    for name in BENCH_QUERIES:
        fn = qmap[name]
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        results[name] = round(time.perf_counter() - t0, 3)
        _ = n

    # headline: dedup cascade at full parallelism (warm = steady-state)
    wall_hi, cold_hi, n_turns, n_clusters_hi = _run_pipeline(spark, turns_path)
    results["dedup_pipeline"] = round(wall_hi, 3)
    results["dedup_pipeline_cold"] = round(cold_hi, 3)
    spark.stop()

    thr_hi = n_turns / wall_hi
    _emit(results, n_turns, {
        "n_clusters": n_clusters_hi,
        "turns_per_sec_hi": round(thr_hi, 1),
        "cores_hi": CPUS,
        "partial": True,  # lo-cores scaling run still pending
    })

    # scaling evidence: identical job at quarter parallelism
    lo_cores = max(2, CPUS // 4)
    spark_lo = _mk_spark(lo_cores)
    wall_lo, cold_lo, _, n_clusters_lo = _run_pipeline(spark_lo, turns_path)
    results[f"dedup_pipeline_c{lo_cores}"] = round(wall_lo, 3)
    results[f"dedup_pipeline_c{lo_cores}_cold"] = round(cold_lo, 3)
    spark_lo.stop()

    assert n_clusters_hi == n_clusters_lo, (
        f"cluster count differs across parallelism: {n_clusters_hi} vs {n_clusters_lo}"
    )

    thr_lo = n_turns / wall_lo
    efficiency = (thr_hi / thr_lo) / (CPUS / lo_cores)
    _emit(results, n_turns, {
        "n_clusters": n_clusters_hi,
        "turns_per_sec_hi": round(thr_hi, 1),
        "turns_per_sec_lo": round(thr_lo, 1),
        "cores_hi": CPUS,
        "cores_lo": lo_cores,
        "scaling_efficiency": round(efficiency, 3),
    })


if __name__ == "__main__":
    main()
