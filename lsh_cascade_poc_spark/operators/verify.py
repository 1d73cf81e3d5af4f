"""Verification stage: exact Jaccard on candidate pairs (cascade Stage 3).

Reference analog: the exact cosine rerank over Stage-2 survivors
(/root/reference/src/pipeline.py:170-203) — the expensive, exact metric runs
only on the tiny candidate set. Here the exact metric is Jaccard over the
stored hashed-shingle sets; the cheap prune before it is the MinHash
signature-agreement estimate (lane-agreement fraction), mirroring the
reference's Hamming rerank (src/pipeline.py:135-168).

Both sides of each pair need their shingle arrays: two joins against the
signature table. The pair table is orders of magnitude smaller than the
corpus after banding (the reference measures ~6x Stage-1 reduction,
CASCADE_SEARCH_DESIGN.md:185-199; banding at our thresholds reduces far
more), so these are fine-grained shuffle joins on doc_id; the signature
table is pre-partitioned on doc_id by the pipeline to make them co-located.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.minhash import jaccard_estimate_from_signatures
from ..functions.shingles import jaccard_on_shingle_arrays


def attach_pair_sides(
    pairs: DataFrame,
    signatures: DataFrame,
    cols: list[str],
    id_col: str = "doc_id",
) -> DataFrame:
    """pairs(id_a, id_b, ...) + signatures(doc_id, *cols) ->
    pairs + {c}_a + {c}_b for each requested column."""
    sig_a = signatures.select(
        F.col(id_col).alias("id_a"), *[F.col(c).alias(f"{c}_a") for c in cols]
    )
    sig_b = signatures.select(
        F.col(id_col).alias("id_b"), *[F.col(c).alias(f"{c}_b") for c in cols]
    )
    return pairs.join(sig_a, "id_a").join(sig_b, "id_b")


def verify_pairs_exact_jaccard(
    pairs: DataFrame,
    signatures: DataFrame,
    threshold: float,
    estimate_prefilter: float | None = None,
    shingles_col: str = "shingles",
    minhash_col: str = "minhash",
) -> DataFrame:
    """-> dup_pairs(id_a, id_b, jaccard). Optional cheap lane-agreement
    prefilter (estimate_prefilter, e.g. threshold - 0.15) drops pairs before
    the exact set intersection — the cascade's Hamming-rerank analog."""
    cols = [shingles_col] + ([minhash_col] if estimate_prefilter is not None else [])
    sided = attach_pair_sides(pairs, signatures, cols)
    if estimate_prefilter is not None:
        est = jaccard_estimate_from_signatures(
            F.col(f"{minhash_col}_a"), F.col(f"{minhash_col}_b")
        )
        sided = sided.filter(est >= estimate_prefilter)
    jac = jaccard_on_shingle_arrays(
        F.col(f"{shingles_col}_a"), F.col(f"{shingles_col}_b")
    )
    return (
        sided.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
