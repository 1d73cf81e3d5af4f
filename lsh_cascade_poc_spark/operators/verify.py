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
    estimate_margin: float | None = 0.1,
    shingles_col: str = "shingles",
    minhash_col: str = "minhash",
    shingle_provider=None,
) -> DataFrame:
    """-> dup_pairs(id_a, id_b, jaccard), verified in three widening joins so
    the wide shingle arrays shuffle only for near-final survivors (the
    cascade principle applied to the verify stage itself):

      1. size-ratio prune (16-byte join): J >= t implies
         min(|A|,|B|)/max(|A|,|B|) >= t — EXACT, zero recall loss.
      2. MinHash lane-agreement estimate (1KB join): drop pairs whose
         estimate < t - estimate_margin. The estimate is Binomial(n_perm, J)/
         n_perm, so at n_perm=128 and margin=0.1 the false-drop probability
         for a true J >= t pair is ~Phi(-0.1/0.035) < 0.3% — and the numpy
         reference applies the IDENTICAL rule, so parity is exact.
      3. exact Jaccard on shingle sets (wide join) >= t.

    Set estimate_margin=None to skip stage 2.

    `shingle_provider` (store_shingles=False mode): a callable mapping a
    (doc_id) DataFrame of stage-1/2 SURVIVOR ids to (doc_id, shingles) — the
    signature table then needs only the slim `n_shingles` int column, and the
    wide shingle arrays exist transiently for the pruned pair set (at 10^12
    docs the persistent signature table must not carry a corpus of shingles).
    """
    if "n_shingles" in signatures.columns:
        # prefer the slim precomputed count: F.size(shingles) would make the
        # size-prune joins read the WIDE shingle-array column for every doc
        # (the dominant column of the signature table) just to measure it —
        # the int column prunes the scan to doc_id + n_shingles (guide §2.3
        # "project before the exchange" / §6 column pruning)
        sizes = signatures.select(
            F.col("doc_id"), F.col("n_shingles").alias("n_sh")
        )
    else:
        sizes = signatures.select(
            F.col("doc_id"), F.size(shingles_col).alias("n_sh")
        )
    p = (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "id_a", "n_sh": "n_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "n_sh": "n_b"}), "id_b")
        .filter(
            F.least("n_a", "n_b").cast("double")
            >= F.lit(threshold) * F.greatest("n_a", "n_b").cast("double")
        )
        .select("id_a", "id_b")
    )

    if estimate_margin is not None:
        mh = signatures.select("doc_id", minhash_col)
        p = (
            p.join(mh.withColumnsRenamed({"doc_id": "id_a", minhash_col: "mh_a"}), "id_a")
            .join(mh.withColumnsRenamed({"doc_id": "id_b", minhash_col: "mh_b"}), "id_b")
            .filter(
                jaccard_estimate_from_signatures(F.col("mh_a"), F.col("mh_b"))
                >= F.lit(threshold - estimate_margin)
            )
            .select("id_a", "id_b")
        )

    if shingle_provider is not None:
        ids = (
            p.select(F.col("id_a").alias("doc_id"))
            .unionAll(p.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        shingle_src = shingle_provider(ids)
    else:
        shingle_src = signatures.select("doc_id", shingles_col)
    sided = attach_pair_sides(p, shingle_src, [shingles_col])
    jac = jaccard_on_shingle_arrays(
        F.col(f"{shingles_col}_a"), F.col(f"{shingles_col}_b")
    )
    return (
        sided.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
