"""Regenerate PLANS.md: annotated physical plans of the engine's headline
operators at sf0.001. Run from the repo root:

    python tools/dump_plans.py > PLANS.md

The assertions behind these plans live in tests/test_plans.py; this dump is
the human-readable companion (what the plan looks like and why it's the one
we want).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "simple") -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def main() -> None:
    from pyspark.sql import functions as F

    from lsh_cascade_poc_spark.config import DedupConfig
    from lsh_cascade_poc_spark.datagen.transcripts import (
        corpus_to_spark,
        generate_corpus,
    )
    from lsh_cascade_poc_spark.operators.assemble import (
        assemble_conversations,
        with_doc_id,
    )
    from lsh_cascade_poc_spark.operators.bands import cap_hot_bands, explode_bands
    from lsh_cascade_poc_spark.operators.components import _large_star, _canonical
    from lsh_cascade_poc_spark.operators.pairs import pairs_from_bands
    from lsh_cascade_poc_spark.pipeline import build_signatures
    from lsh_cascade_poc_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", master="local[4]",
                      shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    cfg = DedupConfig(n_perm=32, coarse_n_bands=4, coarse_rows_per_band=4)
    turns = corpus_to_spark(spark, generate_corpus(n_base=30, dup_fraction=0.3,
                                                   seed=3))
    docs = with_doc_id(assemble_conversations(turns))
    sigs = build_signatures(docs, cfg)

    # (title, commentary, df, explain-mode) — "formatted" for the small
    # plans where the node details carry the story, "simple" for the join
    # trees (their formatted details repeat the whole subtree per node)
    sections: list[tuple[str, str, object, str]] = []

    sections.append((
        "Parquet scan: pushdown + pruning",
        "The filter lands in `PushedFilters` and `ReadSchema` carries only "
        "the two referenced columns — `doc_text` (the multi-KB payload) is "
        "never read. At 100 TB this is the difference between scanning "
        "metadata-per-row and scanning the corpus.",
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .filter(F.col("lang") == "en").select("doc_id", "lang"),
        "formatted",
    ))

    sections.append((
        "Signature stage: ONE fused Arrow kernel",
        "A single `ArrowEvalPython` node computes shingles+MinHash+SimHash "
        "in one pass over the text (the md5 fingerprint stays JVM-side in "
        "the surrounding Project). Documents cross the JVM<->Python "
        "boundary exactly once; assembly below it is a partial-aggregated "
        "`collect_list` with `sort_array` for deterministic turn order (no "
        "window over a skewable key).",
        sigs,
        "formatted",
    ))

    # the real pipeline materializes the signatures stage and every later
    # stage reads it back from parquet — checkpoint here so the dumped band
    # plan matches the production shape (a lazy `sigs` would show the
    # signature kernel re-embedded once per join side, which run_dedup
    # never executes)
    sigs_ck = sigs.localCheckpoint(eager=True)
    bands = explode_bands(sigs_ck, "minhash", tier=0, n_bands=4,
                          rows_per_band=4)
    kept, _hot = cap_hot_bands(bands, cap=100)
    sections.append((
        "Band self-join: equi-join on (tier, band_id, band_key)",
        "The cascade's dominant shuffle. Band keys are `xxhash64` over "
        "signature slices — computed in whole-stage codegen, no Python. "
        "The self-join is an EQUI-join (test_plans.py pins 'never "
        "nested-loop'; broadcast at this toy scale, shuffle join at real "
        "scale under the 8MB threshold); the hot-band cap's count+anti-join "
        "guards the quadratic bucket blowup before it, and `id_a < id_b` + "
        "`distinct` dedups pairs across bands BEFORE the expensive verify. "
        "Both sides read the checkpointed signature stage, mirroring "
        "run_dedup's stage materialization.",
        pairs_from_bands(kept),
        "simple",
    ))

    sections.append((
        "Connected components: one large-star round",
        "groupBy(min) + join per round — partial aggregation (map-side "
        "combine) handles hot roots; per-round `localCheckpoint` (lazy) "
        "truncates lineage so round N's plan does not embed rounds 1..N-1.",
        _large_star(_canonical(
            pairs_from_bands(kept).select(
                F.col("id_a"), F.col("id_b")
            )
        )),
        "simple",
    ))

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    sections.append((
        "Relational: broadcast dim join (orders x customer)",
        "The dimension side is broadcast (hinted; at 100 TB the fact side "
        "shuffles nothing for this join) and the revenue measure is "
        "pre-quantized to integer milli-units inside the partial aggregate "
        "— order-independent sums, exact cross-engine.",
        qmap["orders_by_segment"](spark, SF_DIR),
        "simple",
    ))

    sections.append((
        "Production band keys (oracle-exact coarse tier)",
        "The flagship cascade's per-doc arithmetic as one narrow plan: a "
        "single fused ArrowEvalPython (the tokenize->shingle->MinHash->"
        "SimHash kernel crosses to Python exactly once) followed by "
        "JVM-side xxhash64 band keys + posexplode inside codegen — the "
        "banding itself never leaves Tungsten. This exact arithmetic is "
        "hash-checked against a DuckDB HUGEINT reproduction "
        "(oracle `prod_band_keys`).",
        qmap["prod_band_keys"](spark, SF_DIR),
        "simple",
    ))

    sections.append((
        "Relational: fact-fact sort-merge join + ROLLUP",
        "lineitem x orders pinned sort-merge (merge hint — both sides are "
        "large at warehouse scale; AQE would broadcast the toy-scale side "
        "and hide the shape). The shipdate predicate lands in "
        "`PushedFilters` on the lineitem scan; `expand` implements the "
        "rollup grouping sets over the already-aggregated rows.",
        qmap["revenue_rollup"](spark, SF_DIR),
        "simple",
    ))

    print("# PLANS — physical plans of the headline operators\n")
    print("Generated by `python tools/dump_plans.py` (sf0.001, local[4], "
          "AQE on; `AdaptiveSparkPlan isFinalPlan=false` is pre-execution "
          "form). Plan-shape regressions are pinned by `tests/test_plans.py`; "
          "this file is the annotated companion.\n")
    for title, why, df, mode in sections:
        print(f"## {title}\n")
        print(why + "\n")
        print("```")
        print(plan_of(df, mode).rstrip())
        print("```\n")
    spark.stop()


if __name__ == "__main__":
    main()
