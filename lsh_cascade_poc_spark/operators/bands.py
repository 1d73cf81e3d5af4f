"""LSH banding: signatures -> exploded (tier, band_id, band_key, doc_id) rows.

Reference analog: chunk_hash splits the 128-bit fingerprint into k prefixed
tokens (/root/reference/src/lsh.py:266-304) stored as an array column and
matched with `list_has_any` (src/db.py:148-169); the designed segment index
explodes them into a side table (CASCADE_SEARCH_DESIGN.md:57-66). At Spark
scale the *only* sane layout is the exploded form: the band table is the join
input, repartitioned on the band key, and the "c{i}_ prefix" trick becomes the
band_id column participating in the join key.

Band keys are computed JVM-side: xxhash64(tier, band_id, slice(signature)) —
Spark's xxhash64 hashes array elements recursively, so no Python is involved
after the signature UDF.

Hot-band capping: a band key shared by m docs yields m(m-1)/2 pairs; one
boilerplate bucket with 10^6 docs is 5*10^11 pairs. AQE splits skewed
partitions but cannot fix a single quadratic key (SURVEY.md §4 item 2), so
buckets above `hot_band_cap` are dropped and *recorded* (count + sample) in
the stage metrics; recall for such boilerplate is recovered by the exact
fingerprint (md5) pass which groups identical docs without pair explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_keys_column(sig_col: str, tier: int, n_bands: int, rows_per_band: int,
                     lane_offset: int = 0) -> F.Column:
    """array<long> of n_bands keys; band b = xxhash64(tier, b, lanes[b*r : b*r+r]).
    `lane_offset` lets tiers use disjoint signature regions."""
    keys = [
        F.xxhash64(
            F.lit(tier),
            F.lit(b),
            F.slice(F.col(sig_col), lane_offset + b * rows_per_band + 1, rows_per_band),
        )
        for b in range(n_bands)
    ]
    return F.array(*keys)


def explode_bands(
    signatures: DataFrame,
    sig_col: str,
    tier: int,
    n_bands: int,
    rows_per_band: int,
    id_col: str = "doc_id",
    lane_offset: int = 0,
) -> DataFrame:
    """-> (doc_id, tier, band_id, band_key). posexplode keeps the band index,
    mirroring the segment_id column of the reference's segment index."""
    return (
        signatures.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                band_keys_column(sig_col, tier, n_bands, rows_per_band, lane_offset)
            ).alias("band_id", "band_key"),
        )
        .withColumn("tier", F.lit(tier))
    )


def band_index_stats(bands: DataFrame) -> DataFrame:
    """A6: one-row stats of a band/segment index — row count, distinct
    buckets, max/mean bucket size (the reference's get_stats +
    query_with_stats counters, src/cascade_search.py:292-299,
    src/e2lsh.py:321-369, as ONE aggregate instead of per-query dicts)."""
    per_bucket = bands.groupBy("tier", "band_id", "band_key").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return per_bucket.agg(
        F.sum("n_docs").alias("n_rows"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n_docs").alias("max_bucket"),
        F.avg("n_docs").alias("mean_bucket"),
    )


def cap_hot_bands(
    bands: DataFrame, cap: int,
    persist_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the band table into (kept, dropped_bucket_stats).

    dropped_bucket_stats(tier, band_id, band_key, n_docs) — written to the
    metrics table so the drop is observable, not silent. The frequency
    pre-pass is one partial-aggregated groupBy (map-side combine), cheap
    relative to the self-join it protects.

    When `persist_registry` is given, the per-bucket count table (small:
    one row per distinct bucket) is persisted and appended to it, so a
    caller that later materializes the `hot` side for metrics reuses the
    aggregation instead of re-scanning the full band table.
    """
    counts = bands.groupBy("tier", "band_id", "band_key").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    if persist_registry is not None:
        counts = counts.persist()
        persist_registry.append(counts)
    hot = counts.filter(F.col("n_docs") > cap)
    # hot keys are OUTLIER buckets, so the anti-join build side is normally
    # tiny — but its COUNT is bounded only by rows/cap, so a forced
    # F.broadcast hint would be an unbounded driver collect on a
    # boilerplate-heavy corpus (millions of distinct over-cap keys at
    # warehouse scale). The hot side sits directly below an aggregation
    # (= an AQE query-stage boundary), so AQE sees its ACTUAL size at
    # runtime and converts the anti-join to broadcast whenever it is under
    # the threshold; adversarial hot sets degrade to a shuffle join instead
    # of an OOM.
    kept = bands.join(
        hot.select("tier", "band_id", "band_key"),
        ["tier", "band_id", "band_key"],
        "left_anti",
    )
    return kept, hot


# broadcast cap for the pairable-bucket gate set — same rationale as
# operators/suffix.py _GATE_BROADCAST_MAX_FPS (the one relation class where
# a bigger-than-session-threshold broadcast measurably pays; falls back to
# a shuffle join on its own when the corpus outgrows it)
_PAIRABLE_BROADCAST_MAX = 8_000_000


def pairable_bands(
    bands: DataFrame, cap: int,
    persist_registry: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split the band table into (pairable, dropped_bucket_stats) where
    pairable = rows whose bucket holds 2..cap docs.

    Strictly stronger than cap_hot_bands for SELF-JOIN consumers: a
    singleton bucket can never produce a pair, and at this corpus shape
    most buckets are singletons, so the self-join's sort/probe input
    shrinks several-fold (measured on the 3.84M-turn bench corpus,
    local[4], interleaved draws: the full coarse+tight minhash candidate
    stage fell from 23.1-32.0s to 6.7-9.3s with identical 121,724 output
    pairs). Do NOT use it for band tables that feed a persistent INDEX —
    the streaming index must keep singleton buckets, because a future
    batch's doc may collide with them (cap_hot_bands remains that path).

    The gate set is counted and broadcast iff small; past
    _PAIRABLE_BROADCAST_MAX rows it degrades to a shuffle join — the
    100TB-safe fallback. The count action is cheap only when `bands`
    derives from a MATERIALIZED table (explode over the signatures
    checkpoint) — don't feed it an expensive lazy plan."""
    counts = bands.groupBy("tier", "band_id", "band_key").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).persist()
    if persist_registry is not None:
        persist_registry.append(counts)
    hot = counts.filter(F.col("n_docs") > cap)
    pairable = counts.filter(
        (F.col("n_docs") >= 2) & (F.col("n_docs") <= cap)
    ).select("tier", "band_id", "band_key")
    gate = (
        F.broadcast(pairable)
        if pairable.count() <= _PAIRABLE_BROADCAST_MAX else pairable
    )
    kept = bands.join(gate, ["tier", "band_id", "band_key"])
    return kept, hot
