"""Oracle-SQL edge-class parity tests (VERDICT r4 #7).

The r4 audit (PLANS.md "Oracle SQL audit") documented cross-engine edge
classes the driver corpora never exercise. Each test here synthesizes a
corpus that FORCES one class and asserts Spark == DuckDB on it, so a future
oracle edit cannot silently regress a class the gate corpora don't contain:

  * short-doc     — documents at the scope/threshold fenceposts (95/96-char
                    scope gate, 95/96-char overlap threshold, 9/10-char
                    assembled-doc minimum).
  * late-position — covered by test_prod_oracle.py::
                    test_overlap_pairs_oracle_late_positions (r4).
  * space-boundary truncation — covered by test_prod_oracle.py::
                    test_dedup_oracle_space_boundary_truncation (r5).
  * hot-cap-boundary — a winnow fingerprint shared by exactly hot_cap
                    (kept) and hot_cap + 1 (dropped) documents: the
                    oracle's [2, hot_cap] gate must bind identically.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest


def _overlap_parity(spark, sf_dir: str):
    import __spark_entry__ as entry

    got = sorted(
        (r.id_a, r.id_b, r.overlap_chars)
        for r in entry.queries()["overlap_pairs"](spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    want = sorted(con.execute(entry.oracle_sql()["overlap_pairs"]).fetchall())
    return got, want


def _write_docs(spark, tmp_path, texts: dict[int, str]) -> str:
    docs = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    )
    sf = tmp_path / "sf"
    sf.mkdir(exist_ok=True)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(sf / "documents.parquet")
    )
    return str(sf)


def _filler(rng: random.Random, n_chars: int, tag: str) -> str:
    out = []
    while sum(len(w) + 1 for w in out) < n_chars:
        out.append(f"{tag}{rng.randrange(10**9)}")
    return " ".join(out)[:n_chars].rstrip()


def test_overlap_oracle_short_doc_fenceposts(spark, tmp_path):
    """Scope gate (>= 96 chars) and report threshold (olen >= 96) at their
    exact fenceposts: a 95-char doc is out of scope, a 96-char doc is in; a
    pair overlapping exactly 96 chars reports, exactly 95 does not. Both
    engines must apply every fencepost identically — a one-off in either
    direction shifts per-fp doc counts AND the reported pair set."""
    rng = random.Random(9696)
    p96 = ("the exact ninety six character shared passage body text here x"
           + "y" * 96)[:96]
    assert len(p96) == 96
    p95 = p96[:95]
    texts = {
        # pair (1, 2): shares exactly 96 chars -> one reported row
        1: p96 + " " + _filler(rng, 140, "aa"),
        2: p96 + " " + _filler(rng, 140, "bb"),
        # pair (3, 4): shares exactly 95 chars — they diverge at char 96
        # (no common separator after the passage), so no report
        3: p95 + "Q" + _filler(rng, 140, "cc"),
        4: p95 + "Z" + _filler(rng, 140, "dd"),
        # 5: 95 chars total -> OUT of scope (even though it contains p95)
        5: p95,
        # 6: 96 chars total -> IN scope (shares p96's first 96... itself)
        6: p96,
        # 7: non-ASCII -> out of scope in both engines
        7: p96 + " café " + _filler(rng, 120, "ee"),
    }
    sf = _write_docs(spark, tmp_path, texts)
    got, want = _overlap_parity(spark, sf)
    assert got == want
    pair_ids = {(a, b) for a, b, _ in got}
    assert (1, 2) in pair_ids
    assert (3, 4) not in pair_ids  # 95-char overlap is below threshold
    assert all(5 not in p and 7 not in p for p in pair_ids)
    # doc 6 IS the passage prefix of docs 1/2 -> overlap 96 reported
    assert (1, 6) in pair_ids and (2, 6) in pair_ids


@pytest.mark.slow
def test_overlap_oracle_hot_cap_boundary(spark, tmp_path):
    """The [2, hot_cap=200] shared-fp gate at its exact boundary: passage A
    is planted in exactly 200 docs (its interior fingerprint sits AT the
    cap -> kept -> C(200,2) reported pairs), passage B in exactly 201 docs
    (one past the cap -> its interior fingerprint is dropped; only
    context-dependent edge fingerprints — shared by whatever smaller doc
    subsets the winnow selection yields — can still pair B-docs). The test
    is pure PARITY on a corpus where the cap provably binds; which B-pairs
    survive is deterministic but not prescribed."""
    rng = random.Random(200)
    # interior-window determinism needs length >= 2*(w + k - 1) = 110 at
    # the q_overlap_pairs config (k=24, w=32); 160 gives margin
    pa = _filler(random.Random(1), 160, "passA")
    pb = _filler(random.Random(2), 160, "passB")
    texts: dict[int, str] = {}
    for i in range(200):
        texts[1000 + i] = pa + " " + _filler(rng, 60, f"fa{i}x")
    for i in range(201):
        texts[3000 + i] = pb + " " + _filler(rng, 60, f"fb{i}y")
    sf = _write_docs(spark, tmp_path, texts)

    # non-vacuity: the cap genuinely binds — some fp is shared by exactly
    # 200 docs (kept) and some by exactly 201 (dropped)
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from lsh_cascade_poc_spark.operators.suffix import winnow_fingerprints

    docs = (
        entry._docs_normalized(spark, sf)
        .select("doc_id", F.col("norm_text").alias("doc_text"))
        .filter(F.col("doc_text").rlike("^[ -~]*$") & (F.length("doc_text") >= 96))
    )
    counts = (
        winnow_fingerprints(docs, k=24, w=32)
        .groupBy("fp").agg(F.countDistinct("doc_id").alias("n"))
        .groupBy("n").count().collect()
    )
    by_n = {r.n: r["count"] for r in counts}
    assert by_n.get(200, 0) > 0, "no fp at exactly hot_cap"
    assert by_n.get(201, 0) > 0, "no fp at exactly hot_cap + 1"

    got, want = _overlap_parity(spark, sf)
    assert got == want
    a_pairs = [(a, b) for a, b, _ in got if a < 3000 and b < 3000]
    assert len(a_pairs) == 200 * 199 // 2  # the at-cap group fully pairs


def test_dedup_oracle_min_doc_chars_fencepost(spark, tmp_path):
    """min_doc_chars (10) at its fencepost on the ASSEMBLED doc: 'user: abc'
    is 9 chars -> dropped before the cascade, 'user: abcd' is 10 -> kept as
    a singleton cluster. Both the Spark assembly and the oracle's adocs CTE
    must gate on the identical length."""
    import __spark_entry__ as entry

    texts = {
        1: "abc",          # assembled 'user: abc' = 9 chars -> dropped
        2: "abcd",         # assembled 'user: abcd' = 10 chars -> kept
        3: "hello world document body",   # ordinary doc
    }
    sf = _write_docs(spark, tmp_path, texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS"
        f" SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    got = sorted(
        (r.conv_id, r.cluster_conv)
        for r in entry.queries()["dedup_clusters"](spark, sf).collect()
    )
    want = sorted(con.execute(entry.oracle_sql()["dedup_clusters"]).fetchall())
    assert got == want
    ids = {c for c, _ in got}
    assert "doc1" not in ids and {"doc2", "doc3"} <= ids
