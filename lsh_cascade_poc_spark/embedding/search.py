"""Set-oriented cascade search over embeddings (R1-R6, F6, A1, A7).

The reference processes queries one at a time (CascadeSearcher.search,
/root/reference/src/cascade_search.py:124-199; batch loop :201-242). The
Spark restatement processes the WHOLE query batch as one DataFrame program —
the central re-architecture (SURVEY.md §2.4 R6): every stage is a join/window
over (query_id, doc_id) pairs, so 1 query and 10^6 queries run the same plan.

Stages (mirroring the 3-stage pipeline, src/pipeline.py:68-119):
  1. coarse candidate generation: band equi-join (or skipped = brute force)
  2. Hamming rerank: bit_count(xor) over fingerprint lanes, window top-N
  3. exact cosine rerank: dot product on the candidate set, window top-k

Pivot pre-filter (F6, notebook 52): precomputed Hamming distances to P
pivots; triangle inequality |d(q,p) - d(x,p)| <= t prunes before Stage 2 —
pure Catalyst range predicates that push down to the scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .vector_hash import hamming_lanes


def cosine_expr(a: str, b: str) -> F.Column:
    """Exact cosine as built-ins (sequential fold, no UDF)."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm_a = F.sqrt(F.aggregate(
        F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    norm_b = F.sqrt(F.aggregate(
        F.transform(F.col(b), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))
    return dot / (norm_a * norm_b)


def hamming_topn(
    docs: DataFrame, queries: DataFrame, n: int,
    lanes_col: str = "lanes", id_col: str = "vec_id", query_id_col: str = "query_id",
) -> DataFrame:
    """R1/R2: full (or pre-filtered) Hamming rerank, top-N per query.
    docs(id, lanes) x queries(query_id, lanes) -> (query_id, doc_id, hamming).
    The query side is broadcast (small), so this is a map-side loop over the
    corpus — the distributed analog of the reference's vectorized full-corpus
    Hamming scan (src/cascade_search.py:162-167)."""
    q = queries.select(F.col(query_id_col), F.col(lanes_col).alias("q_lanes"))
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(lanes_col).alias("d_lanes"))
    scored = (
        d.crossJoin(F.broadcast(q))
        .withColumn("hamming", hamming_lanes(F.col("q_lanes"), F.col("d_lanes")))
        .select(query_id_col, "doc_id", "hamming")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("hamming"), F.col("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def cosine_topk(
    docs: DataFrame, queries: DataFrame, k: int,
    vec_col: str = "embedding", id_col: str = "vec_id", query_id_col: str = "query_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """R3: exact cosine rerank, top-k per query. With `candidates`
    (query_id, doc_id) the rerank touches only survivors (the cascade's
    Stage-3 semi-join fetch, R5); without, it is the brute-force oracle R4."""
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("q_vec"))
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("d_vec"))
    if candidates is not None:
        pairs = candidates.join(F.broadcast(q), query_id_col).join(d, "doc_id")
    else:
        pairs = d.crossJoin(F.broadcast(q))
    scored = pairs.withColumn("cosine", cosine_expr("q_vec", "d_vec")).select(
        query_id_col, "doc_id", "cosine"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def band_candidates(
    doc_bands: DataFrame, query_bands: DataFrame,
) -> DataFrame:
    """F1/F2: coarse filter = equi-join of exploded band tables on
    (band_id, band_key) -> distinct (query_id, doc_id). The reference's
    `WHERE list_has_any(...)` scan (src/db.py:148-169) restated as the join
    Catalyst can hash-partition."""
    return (
        doc_bands.join(
            F.broadcast(query_bands.withColumnRenamed("vec_id", "query_id")),
            ["band_id", "band_key"],
        )
        .select("query_id", F.col("vec_id").alias("doc_id"))
        .distinct()
    )


def cascade_search(
    docs_with_lanes: DataFrame,
    queries_with_lanes: DataFrame,
    doc_bands: DataFrame,
    query_bands: DataFrame,
    stage1_limit: int,
    top_k: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """The full 3-stage cascade for a query batch:
    band join -> Hamming top-S1 -> exact cosine top-k (src/pipeline.py:68-119
    restated set-oriented). Returns (query_id, doc_id, cosine, rank)."""
    cands = band_candidates(doc_bands, query_bands)

    # Stage 2: Hamming rerank over candidates only
    q = queries_with_lanes.select(
        F.col("vec_id").alias("query_id"), F.col("lanes").alias("q_lanes")
    )
    d = docs_with_lanes.select(
        F.col("vec_id").alias("doc_id"), F.col("lanes").alias("d_lanes")
    )
    scored = (
        cands.join(F.broadcast(q), "query_id")
        .join(d, "doc_id")
        .withColumn("hamming", hamming_lanes(F.col("q_lanes"), F.col("d_lanes")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("hamming"), F.col("doc_id"))
    survivors = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= stage1_limit)
        .select("query_id", "doc_id")
    )

    # Stage 3: exact cosine on survivors
    return cosine_topk(
        docs_with_lanes, queries_with_lanes.withColumnRenamed("vec_id", "query_id"),
        top_k, vec_col=vec_col, candidates=survivors,
    )


# --- pivots (F6 + A7) --------------------------------------------------------

def select_pivots_furthest_first(lanes: np.ndarray, n_pivots: int, seed: int = 42) -> np.ndarray:
    """A7: greedy max-min Hamming pivot selection on a driver-side sample of
    fingerprint lanes (notebook 52 cell 6)."""
    rng = np.random.default_rng(seed)
    u = lanes.astype(np.uint64)

    def ham(a, b):
        x = a ^ b
        return np.array([bin(int(v)).count("1") for v in x.reshape(-1)]).reshape(x.shape).sum(axis=-1)

    idx = [int(rng.integers(0, len(u)))]
    for _ in range(n_pivots - 1):
        dists = np.min(
            np.stack([ham(u, u[i][None, :]) for i in idx]), axis=0
        )
        idx.append(int(np.argmax(dists)))
    return lanes[idx]


def with_pivot_distances(df: DataFrame, lanes_col: str, pivots: np.ndarray) -> DataFrame:
    """Add P integer columns pd_0..pd_{P-1}: Hamming distance to each pivot.
    Pure expressions — at scale these become range-prunable scan columns."""
    out = df
    for i, pivot in enumerate(pivots):
        lit_arr = F.array(*[F.lit(int(v)) for v in pivot])
        out = out.withColumn(f"pd_{i}", hamming_lanes(F.col(lanes_col), lit_arr))
    return out


def pivot_filter(
    docs_with_pd: DataFrame, query_pd: list[int], threshold: int
) -> DataFrame:
    """F6: conjunctive triangle-inequality range predicates —
    keep doc iff for all i, |pd_i(doc) - pd_i(q)| <= t."""
    cond = F.lit(True)
    for i, qd in enumerate(query_pd):
        cond = cond & (F.abs(F.col(f"pd_{i}") - F.lit(qd)) <= threshold)
    return docs_with_pd.filter(cond)


def combined_band_pivot_candidates(
    doc_bands: DataFrame,
    query_bands: DataFrame,
    docs_with_pd: DataFrame,
    queries_with_pd: DataFrame,
    n_pivots: int,
    threshold: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage filter composition (reference combined_band_pivot_filter,
    src/dflsh.py:460-519): Stage 1 band equi-join candidates (the query band
    table may already be a confidence-multiprobe expansion — composition is
    free because both are (id, band_id, band_key) relations); Stage 2 pivot
    triangle-inequality prune on the candidate pairs only. Set-oriented: one
    plan for the whole query batch."""
    cands = band_candidates(doc_bands, query_bands)
    qd = queries_with_pd.select(
        F.col(id_col).alias("query_id"),
        *[F.col(f"pd_{i}").alias(f"qpd_{i}") for i in range(n_pivots)],
    )
    dd = docs_with_pd.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(f"pd_{i}") for i in range(n_pivots)],
    )
    joined = cands.join(F.broadcast(qd), "query_id").join(dd, "doc_id")
    cond = F.lit(True)
    for i in range(n_pivots):
        cond = cond & (F.abs(F.col(f"pd_{i}") - F.col(f"qpd_{i}")) <= threshold)
    return joined.filter(cond).select("query_id", "doc_id")


# --- evaluation (A1) ---------------------------------------------------------

def recall_at_k(predicted: DataFrame, ground_truth: DataFrame, k: int) -> float:
    """A1: mean over queries of |GT ∩ pred| / k, both as (query_id, doc_id)
    rank<=k tables — computed as one semi-join + aggregation."""
    hits = predicted.join(
        ground_truth, ["query_id", "doc_id"], "left_semi"
    ).groupBy("query_id").agg(F.count(F.lit(1)).alias("hits"))
    n_queries = ground_truth.select("query_id").distinct().count()
    if n_queries == 0:
        return 0.0
    total_hits = hits.agg(F.coalesce(F.sum("hits"), F.lit(0))).collect()[0][0]
    return float(total_hits) / (n_queries * k)
