"""Physical-plan shape regression tests.

The engine's 100TB story rests on plan properties, not constants: filters
reach the parquet scan, projections prune columns, the banded self-joins are
hash joins (never nested-loop/cartesian), the signature kernel is ONE fused
Arrow pass, and the hot expression paths stay inside WholeStageCodegen.
These tests pin those properties so a refactor that silently degrades the
plan (e.g. a lost pushdown or an accidental BroadcastNestedLoopJoin) fails
CI even though results stay correct.

Reference analog: the reference checks operator *output* only (its planner
is DuckDB's); plan assertions are the Spark-native equivalent of its
reduction-rate checks (/root/reference/src/cascade_search.py:292-299).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def plan_of(df, mode: str = "formatted") -> str:
    exec_ = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return exec_.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_filter_and_projection_reach_parquet_scan(spark):
    """Predicate pushdown + column pruning on a raw parquet scan."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    q = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan, plan
    # ReadSchema must carry only the two referenced columns, not doc_text
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "doc_text" not in read_schema[0], read_schema


def test_band_self_join_is_hash_join_not_nested_loop(spark, tiny_turns):
    """The cascade's dominant join must be an equi-join on the band key.

    A regression that drops the join keys (e.g. a renamed column yielding a
    trivially-true condition) would silently become a nested-loop cross
    product — quadratic at corpus scale."""
    from lsh_cascade_poc_spark.config import DedupConfig
    from lsh_cascade_poc_spark.operators.assemble import (
        assemble_conversations,
        with_doc_id,
    )
    from lsh_cascade_poc_spark.operators.bands import explode_bands
    from lsh_cascade_poc_spark.operators.pairs import pairs_from_bands
    from lsh_cascade_poc_spark.pipeline import build_signatures

    cfg = DedupConfig(n_perm=32, coarse_n_bands=4, coarse_rows_per_band=4)
    docs = with_doc_id(assemble_conversations(tiny_turns))
    sigs = build_signatures(docs, cfg)
    bands = explode_bands(sigs, "minhash", tier=0, n_bands=4, rows_per_band=4)
    plan = plan_of(pairs_from_bands(bands))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan


def test_signature_kernel_is_one_fused_arrow_pass(spark, tiny_turns):
    """build_signatures must evaluate exactly ONE Python/Arrow UDF node:
    shingle+minhash+simhash are fused into a single kernel. Two+ nodes mean
    the text is shipped through Arrow (and re-tokenized) more than once."""
    from lsh_cascade_poc_spark.config import DedupConfig
    from lsh_cascade_poc_spark.operators.assemble import (
        assemble_conversations,
        with_doc_id,
    )
    from lsh_cascade_poc_spark.pipeline import build_signatures

    docs = with_doc_id(assemble_conversations(tiny_turns))
    # "simple" mode: one line per node ("formatted" repeats each node in the
    # detail section, double-counting)
    plan = plan_of(build_signatures(docs, DedupConfig(n_perm=32)), mode="simple")
    n_arrow_nodes = plan.count("ArrowEvalPython")
    assert n_arrow_nodes == 1, f"{n_arrow_nodes} Arrow UDF nodes:\n{plan}"


def test_hot_expressions_stay_in_codegen(spark):
    """Band keys, Hamming distance, and the Jaccard arithmetic are JVM
    expressions inside WholeStageCodegen — no Python in the hot path."""
    from lsh_cascade_poc_spark.functions.simhash import hamming64

    df = spark.range(1000).select(
        F.col("id"), F.xxhash64(F.lit(0), F.col("id")).alias("h")
    )
    q = df.select(hamming64(F.col("id"), F.col("h")).alias("d")).filter("d < 20")
    # "*(n)" prefixes mark WholeStageCodegen stages in simple mode (the
    # formatted tree hides them under a not-yet-final AdaptiveSparkPlan)
    plan = plan_of(q, mode="simple")
    assert "*(1)" in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    assert "bit_count" in plan, plan  # hamming64 compiled to the JVM builtin


def test_semijoin_fetch_pushes_id_filter(spark):
    """The id semi-join fetch (R5) must not degrade to a full-scan join on
    the fact side when the id set is small: broadcast of the SMALL side only."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    ids = spark.range(5).select(F.col("id").alias("doc_id"))
    q = docs.join(F.broadcast(ids), "doc_id", "left_semi")
    plan = plan_of(q)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


@pytest.mark.parametrize("query", ["exact_dup_groups", "lsh_band_pairs"])
def test_entry_queries_avoid_cartesian(spark, query):
    """Headline oracle queries must contain no cartesian/nested-loop joins.
    (cosine/hamming brute-force oracles are cartesian BY SPEC and excluded.)"""
    import __spark_entry__ as entrymod

    df = entrymod.queries()[query](spark, SF_DIR)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_relational_join_strategies(spark):
    """VERDICT r2 #6: the relational queries pin the two canonical join
    shapes — dim join broadcast (orders x customer) and fact-fact
    sort-merge (lineitem x orders) — plus shipdate pushdown to the scan."""
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()

    seg = plan_of(qmap["orders_by_segment"](spark, SF_DIR))
    assert "BroadcastHashJoin" in seg, seg
    assert "SortMergeJoin" not in seg, seg

    roll = plan_of(qmap["revenue_rollup"](spark, SF_DIR))
    assert "SortMergeJoin" in roll, roll
    # the shipdate predicate reaches the lineitem parquet scan
    assert "PushedFilters" in roll and "l_shipdate" in roll.split(
        "PushedFilters", 1)[1][:200], roll

    q1 = plan_of(qmap["pricing_summary"](spark, SF_DIR))
    assert "PushedFilters" in q1 and "l_shipdate" in q1.split(
        "PushedFilters", 1)[1][:200], q1
    # ReadSchema pruned: the untouched l_comment-ish wide columns stay out
    read_schema = [ln for ln in q1.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_partkey" not in read_schema[0], read_schema


def test_training_pipeline_query_plans(spark):
    """Round-3 training-pipeline queries pin their scale shapes:
    repetition_stats must be a pure map over the scan (its per-doc stats
    are within-row higher-order functions — any Exchange means the bigram
    groupBy shape crept back in); contamination_overlap must broadcast the
    (small by construction) benchmark side, never shuffle-join the corpus."""
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()

    rep = plan_of(qmap["repetition_stats"](spark, SF_DIR))
    assert "Exchange" not in rep, rep
    assert "ArrowEvalPython" not in rep and "BatchEvalPython" not in rep, rep

    cont = plan_of(qmap["contamination_overlap"](spark, SF_DIR))
    assert "BroadcastHashJoin" in cont, cont
    assert "SortMergeJoin" not in cont, cont
    assert "CartesianProduct" not in cont, cont

    dfq = plan_of(qmap["doc_frequency"](spark, SF_DIR))
    # vocab-sized partial agg before the single-reducer top-k window
    assert "HashAggregate" in dfq, dfq
