"""The end-to-end dedup pipeline: the reference's cascade, set-oriented.

Reference cascade (per query, /root/reference/src/pipeline.py:68-119):
    Stage 1 coarse LSH chunk filter -> Stage 2 Hamming rerank -> Stage 3 exact
    cosine rerank.
Our all-pairs restatement (SURVEY.md §7.1):
    Stage 0  assemble conversations -> documents (stable turn order) + exact
             md5 fingerprint tag (_root = min id per fingerprint group)
    Stage 1  signatures: hashed shingles + MinHash + SimHash — computed for
             fingerprint-group REPRESENTATIVES only (exact members collapse
             before any expensive kernel; star edges carry them to clusters)
    Stage 2a exact-dup pairs (the star edges — free recall for identical docs)
    Stage 2b COARSE band pass over all docs (high recall)   [tier 0]
    Stage 2c TIGHT band pass over tier-0 survivors only,
             min-match counting (the cascade tightening)     [tier 1]
    Stage 2d SimHash bit-sampling pass: band join + Hamming <= tau prune
    Stage 2e winnowing/substring pass: exact long-overlap pairs
    Stage 3  exact Jaccard verify on the unioned candidate set
    Stage 4  connected components -> cluster assignment
Every stage can be checkpointed through StageStore (resume skips committed
stages); metrics rows record per-stage row counts and wall time.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import StageStore
from .config import DedupConfig
from .functions.signature_udf import make_signature_udf
from .functions.simhash import hamming64, simhash_band_key
from .functions.text import fingerprint_md5
from .operators.assemble import assemble_conversations, with_doc_id
from .operators.bands import explode_bands, pairable_bands
from .operators.components import clusters_with_singletons, connected_components
from .operators.pairs import (
    pairs_from_bands,
    pairs_with_min_match,
    survivors,
    tag_exact_duplicates,
)
from .operators.suffix import overlap_candidates, verify_overlaps, winnow_fingerprints
from .operators.verify import verify_pairs_exact_jaccard


@dataclass
class DedupResult:
    docs: DataFrame        # (conv_id, doc_id, doc_text, n_turns, fingerprint, _root, ...)
    signatures: DataFrame  # (doc_id, shingles, minhash, simhash, fingerprint)
    #                        — exact-dup-group REPRESENTATIVES only (members
    #                        carry no signature; they re-attach via _root)
    dup_pairs: DataFrame   # (id_a, id_b, jaccard, source)
    clusters: DataFrame    # (doc_id, cluster_id) — all docs, singletons included


def build_signatures(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """One pass over documents computing every per-doc artifact the cascade
    needs: ONE fused Arrow kernel (tokenize -> shingle-hash -> MinHash ->
    SimHash, see functions/signature_udf.py for why shingling is NOT a JVM
    higher-order expression) plus the JVM-side md5 fingerprint (reused from
    the input when the docs stage already carries it)."""
    sig_udf = make_signature_udf(
        cfg.shingle_k, cfg.n_perm, cfg.minhash_seed, cfg.simhash_bits
    )
    fp = (
        F.col("fingerprint") if "fingerprint" in docs.columns
        # max_chars=0: the exact-dup key must cover the FULL assembled text
        # (a truncated key collapses prefix-sharing long docs — see
        # functions/text.py fingerprint_md5)
        else fingerprint_md5(F.col("doc_text"), max_chars=0)
    )
    # doc_text deliberately NOT carried: signatures are checkpointed and
    # re-joined repeatedly; the raw text stays in the docs table only
    out = docs.select(
        "conv_id",
        "doc_id",
        fp.alias("fingerprint"),
        sig_udf(F.col("doc_text")).alias("_sig"),
    ).select(
        "conv_id",
        "doc_id",
        "fingerprint",
        F.col("_sig.shingles").alias("shingles"),
        F.size("_sig.shingles").alias("n_shingles"),
        F.col("_sig.minhash").alias("minhash"),
        F.col("_sig.simhash").alias("simhash"),
    )
    if not cfg.store_shingles:
        # 100TB-scale mode: the persistent signature table carries only the
        # shingle COUNT; verify re-shingles survivor docs from text
        out = out.drop("shingles")
    return out


def minhash_candidate_pairs(
    signatures: DataFrame, cfg: DedupConfig,
    persist_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Tiers 0+1 of the banding cascade -> (candidate pairs, hot-band stats).
    Persisted intermediates are appended to `persist_registry` so the caller
    can unpersist them once downstream stages are materialized (leaked
    persists accumulate block-manager memory across repeated runs — measured
    as a 7x warm-run slowdown on this VM's ballooned memory)."""
    # tier 0: coarse, whole corpus. pairable_bands (not cap_hot_bands):
    # every consumer below is a pair self-join, so singleton buckets are
    # dead weight — gating them out shrank this stage ~3x (bands.py
    # measurement note)
    coarse = explode_bands(
        signatures, "minhash", tier=0,
        n_bands=cfg.coarse_n_bands, rows_per_band=cfg.coarse_rows_per_band,
    )
    coarse_kept, hot0 = pairable_bands(coarse, cfg.hot_band_cap,
                                       persist_registry=persist_registry)
    # persisted: referenced by the survivor gate AND the final AND-join —
    # without it the band self-join recomputes once per consumer
    coarse_pairs = pairs_from_bands(coarse_kept, cfg.pair_repartition).persist()
    if persist_registry is not None:
        persist_registry.append(coarse_pairs)

    # tier 1: tight bands computed only for tier-0 survivors (cascade gate);
    # min-match counting prunes candidates (src/dflsh.py:187-197 analog)
    surv = survivors(coarse_pairs)
    sigs_surv = signatures.join(surv, "doc_id", "left_semi")
    tight = explode_bands(
        sigs_surv, "minhash", tier=1,
        n_bands=cfg.tight_n_bands, rows_per_band=cfg.tight_rows_per_band,
    )
    tight_kept, hot1 = pairable_bands(tight, cfg.hot_band_cap,
                                      persist_registry=persist_registry)
    tight_pairs = pairs_with_min_match(tight_kept, cfg.tight_min_match).select(
        "id_a", "id_b"
    )

    # a candidate must be generated by the coarse tier AND confirmed by the
    # tight tier (the cascade's AND-tightening); when tight_min_match == 0 the
    # tight tier is bypassed.
    if cfg.tight_min_match > 0:
        cand = coarse_pairs.join(tight_pairs, ["id_a", "id_b"], "inner")
    else:
        cand = coarse_pairs
    hot = hot0.unionByName(hot1)
    return cand, hot


def simhash_candidate_pairs(
    signatures: DataFrame, cfg: DedupConfig,
    persist_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """SimHash bit-sampling pass: 16-bit chunk band join (chunk_hash analog)
    + Hamming <= tau prune (the reference's Stage-2 rerank as a filter).
    Returns (pairs, hot-band stats) like minhash_candidate_pairs."""
    n_bands = cfg.simhash_bits // cfg.simhash_band_bits
    banded = signatures.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[
                simhash_band_key(F.col("simhash"), i, cfg.simhash_band_bits)
                for i in range(n_bands)
            ])
        ).alias("band_id", "band_key"),
    ).withColumn("tier", F.lit(2))
    kept, hot = pairable_bands(banded, cfg.hot_band_cap,
                               persist_registry=persist_registry)
    a = kept.select("tier", "band_id", "band_key",
                    F.col("doc_id").alias("id_a"), F.col("simhash").alias("sim_a"))
    b = kept.select("tier", "band_id", "band_key",
                    F.col("doc_id").alias("id_b"), F.col("simhash").alias("sim_b"))
    pairs = (
        a.join(b, ["tier", "band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming64(F.col("sim_a"), F.col("sim_b")) <= cfg.simhash_hamming_tau)
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs, hot


def overlap_docs_gate(docs: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Docs shorter than min_overlap_chars BYTES (the kernel and verifier
    measure UTF-8 bytes) cannot appear in any reportable pair — a shared
    substring of length L requires both docs >= L — so they are gated out
    before the fingerprint kernel, shrinking the kernel input, the fp
    table and the self-join (narrow filters over the already-materialized
    docs checkpoint). Zero loss FOR THE EXCLUDED DOCS is exact; for the
    surviving corpus the gate shifts per-fp doc counts, so a fingerprint
    straddling the hot-cap boundary can change sides and perturb seed
    selection for surviving pairs — a hot-cap heuristic sensitivity the
    cap always had, not a property of this gate."""
    return docs.filter(
        F.octet_length(F.col("doc_text")) >= cfg.min_overlap_chars
    )


def overlap_pairs(docs: DataFrame, cfg: DedupConfig,
                  persist_registry: list | None = None,
                  fps: DataFrame | None = None) -> DataFrame:
    """Winnowing fingerprints -> seed candidates -> exact extension; emits
    pairs sharing an exact substring of >= min_overlap_chars.

    `fps`: pass the PRE-MATERIALIZED winnow fingerprint table (run_dedup
    checkpoints it as its own stage). The candidate gate counts the
    shared-fp set in a separate action to size-gate its broadcast
    (operators/suffix.py _shared_fp_gate); with a lazy fps plan that count
    would re-run the winnow kernel — the most expensive Arrow pass in the
    stage — a second time."""
    docs = overlap_docs_gate(docs, cfg)
    if fps is None:
        fps = winnow_fingerprints(docs, cfg.winnow_kgram_chars,
                                  cfg.winnow_window)
    cands = overlap_candidates(fps, hot_cap=cfg.overlap_hot_cap,
                               min_shared_fps=cfg.overlap_min_shared_fps,
                               persist_registry=persist_registry)
    return verify_overlaps(
        cands, docs, cfg.winnow_kgram_chars, cfg.min_overlap_chars
    ).select("id_a", "id_b")


def run_dedup(
    spark: SparkSession,
    turns: DataFrame,
    cfg: DedupConfig | None = None,
    store: StageStore | None = None,
    enable_overlap_stage: bool = True,
) -> DedupResult:
    cfg = cfg or DedupConfig()

    import os
    import sys
    import time as _time

    verbose = os.environ.get("DEDUP_STAGE_TIMING", "") == "1"

    def stage(name: str, factory, **kw):
        t0 = _time.perf_counter()
        if store is not None:
            out = store.materialize(name, factory, **kw)
        else:
            # no checkpoint store: localCheckpoint both materializes the stage
            # (multi-consumer stages would recompute otherwise) and TRUNCATES
            # the logical plan — without truncation each stage embeds every
            # upstream stage's expression tree and Catalyst analysis explodes
            out = factory().localCheckpoint(eager=True)
        if verbose:
            print(f"[dedup-stage] {name}: {_time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        return out

    # the docs stage carries the exact-dup tag: fingerprint (md5 of the
    # normalized text) + _root (min doc_id of the fingerprint group), computed
    # in the SAME materialization. Tagging here — on raw text — instead of on
    # the signature table means the window shuffle moves the ~1KB text rows
    # once and the expensive signature kernel (below) runs ONLY on group
    # representatives: an m-fold exact flood costs one kernel invocation, not
    # m, and the signatures stage needs no shuffle at all.
    docs = stage(
        "docs",
        lambda: tag_exact_duplicates(
            with_doc_id(
                assemble_conversations(
                    turns, max_turn_chars=cfg.max_turn_chars,
                    min_doc_chars=cfg.min_doc_chars,
                )
            ).withColumn(
                # max_chars=0: full-content exact key (see fingerprint_md5)
                "fingerprint", fingerprint_md5(F.col("doc_text"), max_chars=0)
            )
        ),
    )
    def _check_id_collisions() -> None:
        # doc_id = xxhash64(conv_id): detect 64-bit collisions (distinct
        # conv_ids sharing a doc_id would corrupt signatures/clusters) —
        # one aggregate over the already-materialized docs stage. Runs as a
        # third concurrent task next to the candidate chains (it reads only
        # the docs checkpoint and gates nothing until its result is checked),
        # so its ~full-pass barrier back-fills chain idle time instead of
        # serializing in front of everything.
        n_coll = (
            docs.groupBy("doc_id")
            .agg(F.countDistinct("conv_id").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        if n_coll:
            raise RuntimeError(
                f"{n_coll} doc_id collisions (xxhash64 of distinct conv_ids); "
                "re-run with salted ids or dedupe conv_ids"
            )
    # exact-duplicate collapse BEFORE any signature computation or banding:
    # representatives and star edges are NARROW filters over the docs
    # checkpoint (tagged above), the signature kernel runs over reps only,
    # and all LSH passes see one row per distinct text; members re-attach via
    # star edges in the clustering stage.
    persists: list = []

    def _release(dfs: list) -> None:
        # persisted intermediates die with the stage that consumed them:
        # holding them through later stages measurably slows THOSE stages
        # on this memory-balloon host (r5: verify ran 3x slower with the
        # three tiers' gate tables still cached)
        for df in dfs:
            try:
                df.unpersist()
            except Exception:
                pass
        dfs.clear()

    reps_docs = docs.filter(F.col("doc_id") == F.col("_root"))
    star_edges = docs.filter(F.col("doc_id") != F.col("_root")).select(
        F.col("_root").alias("id_a"), F.col("doc_id").alias("id_b")
    )
    exact_pairs = star_edges.withColumn("source", F.lit("exact"))

    # each candidate tier is its own materialization, NOT one fused write:
    # fusing them into a single job looked cheaper on paper (one Catalyst
    # analysis, overlapping shuffles) but tripled the stage's wall on this
    # host — three tiers' shuffles live simultaneously and the working set
    # blows past the VM's fault-handler comfort zone. Separate stages also
    # keep per-tier resume + A5 reduction metrics trivially.
    def _minhash_chain():
        """signatures -> minhash tiers -> simhash pass (one dependency
        chain; returns everything the join/verify phase needs)."""
        signatures = stage("signatures", lambda: build_signatures(reps_docs, cfg))
        band_persists: list = []
        mh_pairs_lazy, mh_hot = minhash_candidate_pairs(signatures, cfg,
                                                        band_persists)
        mh_pairs = stage(
            "pairs_minhash",
            lambda: mh_pairs_lazy.withColumn("source", F.lit("minhash")),
        )
        sh_pairs_lazy, sh_hot = simhash_candidate_pairs(signatures, cfg,
                                                        band_persists)
        sh_pairs = stage(
            "pairs_simhash",
            lambda: sh_pairs_lazy.withColumn("source", F.lit("simhash")),
        )
        # A5/ADVICE: dropped hot buckets are recorded, not silent — their own
        # stage row (count + per-bucket sizes) in the metrics/checkpoint
        # store. The per-bucket count tables were persisted while the pair
        # stages evaluated (pairable_bands persist_registry), so this is a
        # cheap filter, not a band-table re-scan. Only materialized when a
        # store is recording.
        if store is not None:
            stage("hot_band_drops", lambda: mh_hot.unionByName(sh_hot))
        # every band-tier persisted intermediate is now consumed
        _release(band_persists)
        return signatures, mh_pairs, sh_pairs

    def _overlap_chain():
        """overlap_fps -> pairs_overlap (independent of the signature
        chain: both consume only the materialized docs stage)."""
        # narrow filter, not a semi-join: reps are tagged on the docs rows
        docs_reps = docs.filter(F.col("doc_id") == F.col("_root"))
        # the fp table is its own materialization: the candidate gate's
        # broadcast-sizing count (suffix.py _shared_fp_gate) and the
        # candidate self-join both consume it — lazy, the winnow Arrow
        # kernel would run once per consumer
        ov_fps = stage(
            "overlap_fps",
            lambda: winnow_fingerprints(
                overlap_docs_gate(docs_reps, cfg),
                cfg.winnow_kgram_chars, cfg.winnow_window,
            ),
        )
        ov_persists: list = []
        ov_pairs = stage(
            "pairs_overlap",
            lambda: overlap_pairs(docs_reps, cfg,
                                  persist_registry=ov_persists, fps=ov_fps)
            .withColumn("source", F.lit("overlap")),
        )
        _release(ov_persists)
        return ov_pairs

    # The two chains share no data dependency (guide §2.6: actions are only
    # sequential because driver code calls them sequentially). Running them
    # from two driver threads lets each chain's tasks back-fill the idle
    # capacity the other leaves behind — stage-tail stragglers, AQE/commit
    # driver round-trips, the gate-count barriers — at BOTH parallelism
    # levels (at local[1] the single core is idle during every driver
    # round-trip too, so the lo level gains the same gap-fill). Stage
    # outputs, and therefore every downstream result, are bit-identical:
    # only the wall-clock interleaving changes. Set DEDUP_SEQUENTIAL_STAGES=1
    # to fall back to the serial order (e.g. on memory-starved hosts; the
    # A/B for this host is recorded in OPTIMIZATION_r06.md).
    sequential = os.environ.get("DEDUP_SEQUENTIAL_STAGES", "") == "1"
    if enable_overlap_stage and not sequential:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        # the id-collision check stays SERIAL in front of the chains: a
        # third concurrent task was measured 153.6-159.4s vs 149.2-150.2s
        # for check-first + two chains (its countDistinct aggregate competes
        # with the two Arrow kernels for cores exactly when they saturate
        # the machine, delaying both chains for no overlap gain)
        if cfg.check_id_collisions:
            _check_id_collisions()
        with ThreadPoolExecutor(max_workers=2) as pool:
            fut_mh = pool.submit(inheritable_thread_target(spark)(_minhash_chain))
            fut_ov = pool.submit(inheritable_thread_target(spark)(_overlap_chain))
            signatures, mh_pairs, sh_pairs = fut_mh.result()
            ov_pairs = fut_ov.result()
        sources = [exact_pairs, mh_pairs, sh_pairs, ov_pairs]
    else:
        if cfg.check_id_collisions:
            _check_id_collisions()
        signatures, mh_pairs, sh_pairs = _minhash_chain()
        sources = [exact_pairs, mh_pairs, sh_pairs]
        if enable_overlap_stage:
            sources.append(_overlap_chain())
    sig_reps = signatures

    # union + dedup BEFORE the expensive verify (the one barrier worth paying;
    # reference dedups candidates the same way, src/e2lsh.py:292-307).
    # sources are kept as a SET: a pair found by both minhash and overlap must
    # retain its overlap evidence even if it fails exact Jaccard (ADVICE r1).
    all_cands = sources[0]
    for s in sources[1:]:
        all_cands = all_cands.unionByName(s)
    cand_dedup = (
        all_cands.groupBy("id_a", "id_b").agg(F.collect_set("source").alias("sources"))
    ).persist()
    persists.append(cand_dedup)

    def _verify():
        # exact pairs are definitionally jaccard 1.0 — skip their verify join;
        # overlap pairs already passed an exact-substring check but still go
        # through Jaccard so dup_pairs carries a uniform score (they may fall
        # below threshold and be kept ONLY as overlap evidence -> keep them).
        is_exact = F.array_contains("sources", "exact")
        non_exact = cand_dedup.filter(~is_exact)
        shingle_provider = None
        if not cfg.store_shingles:
            from .functions.signature_udf import make_shingles_udf

            sh_udf = make_shingles_udf(cfg.shingle_k)
            shingle_provider = lambda ids: (  # noqa: E731
                docs.join(ids, "doc_id", "left_semi")
                .select("doc_id", sh_udf("doc_text").alias("shingles"))
            )
        # persisted: consumed by both the union and the overlap anti-join
        verified = verify_pairs_exact_jaccard(
            non_exact.select("id_a", "id_b"),
            sig_reps,
            threshold=cfg.jaccard_threshold,
            shingle_provider=shingle_provider,
        ).persist()
        persists.append(verified)
        exact = (
            cand_dedup.filter(is_exact)
            .select("id_a", "id_b")
            .withColumn("jaccard", F.lit(1.0))
        )
        overlap_kept = (
            cand_dedup.filter(F.array_contains("sources", "overlap") & ~is_exact)
            .select("id_a", "id_b")
            .join(verified.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
            .withColumn("jaccard", F.lit(-1.0))  # overlap-evidence-only marker
        )
        return verified.unionByName(exact).unionByName(overlap_kept) \
            .groupBy("id_a", "id_b").agg(F.max("jaccard").alias("jaccard"))

    dup_pairs = stage("dup_pairs", _verify)
    # dup_pairs is materialized: every persisted intermediate is now dead
    # weight in the block manager — release eagerly (repeat runs in one
    # session otherwise accumulate GBs and trigger this VM's balloon refaults)
    for df in persists:
        try:
            df.unpersist()
        except Exception:
            pass

    # overlap-evidence-only pairs (jaccard = -1) are excluded from clustering
    # unless cluster_on_overlap is set (see config.py rationale)
    cluster_edges = (
        dup_pairs if cfg.cluster_on_overlap
        else dup_pairs.filter(F.col("jaccard") >= 0)
    )
    clusters = stage(
        "clusters",
        lambda: clusters_with_singletons(
            connected_components(
                cluster_edges.select("id_a", "id_b"), cfg.cc_max_iterations
            ),
            docs,
        ),
    )
    return DedupResult(docs=docs, signatures=signatures, dup_pairs=dup_pairs,
                       clusters=clusters)
