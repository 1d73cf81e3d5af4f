"""F5 confidence multiprobe, H13 E2LSH multiprobe, H18 overlap segments,
S10 model save/load — parity vs numpy references + recall-improvement."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lsh_cascade_poc_spark.embedding.confidence import (
    confidence_probes_numpy,
    explode_confidence_probes,
    make_simhash_confidence_udf,
)
from lsh_cascade_poc_spark.embedding.e2lsh import (
    e2lsh_buckets_numpy,
    e2lsh_candidate_pairs,
    e2lsh_query_candidates,
    explode_e2lsh_buckets,
    explode_e2lsh_probe_buckets,
    load_e2lsh_params,
    make_e2lsh_params,
    make_e2lsh_udf,
    multiprobe_buckets_numpy,
    save_e2lsh_params,
)
from lsh_cascade_poc_spark.embedding.hyperplanes import generate_random_hyperplanes
from lsh_cascade_poc_spark.embedding.itq import (
    fit_itq_on_dataframe,
    itq_fit,
    itq_transform_numpy,
    load_itq_model,
    load_whiten_model,
    make_itq_udf,
    save_itq_model,
    save_whiten_model,
    whitening_fit,
    whitening_transform_numpy,
)
from lsh_cascade_poc_spark.embedding.vector_hash import (
    explode_overlap_segments,
    simhash_vectors_numpy,
)

N_BITS = 128
BAND_BITS = 8
DIM = 32


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(7)
    return rng.standard_normal((40, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def planes():
    return generate_random_hyperplanes(DIM, N_BITS, seed=3)


def _vec_df(spark, vecs):
    pdf = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [v for v in vecs],
    })
    return spark.createDataFrame(pdf)


def test_confidence_probe_parity(spark, vecs, planes):
    """Spark probe table == numpy reference probe set, per vector."""
    df = _vec_df(spark, vecs)
    udf = make_simhash_confidence_udf(planes)
    coded = df.select(
        "vec_id", udf("embedding").alias("c")
    ).select("vec_id", F.col("c.lanes").alias("lanes"), F.col("c.proj").alias("proj"))
    coded = coded.localCheckpoint(eager=True)

    probes = explode_confidence_probes(
        coded, "lanes", "proj", N_BITS, BAND_BITS, max_probes=4
    ).collect()
    got: dict[int, set] = {}
    for r in probes:
        got.setdefault(r.vec_id, set()).add((r.band_id, r.band_key))

    proj = vecs @ planes.T.astype(np.float32)
    lanes = simhash_vectors_numpy(vecs, planes)
    for i in range(len(vecs)):
        want = confidence_probes_numpy(lanes[i], proj[i], BAND_BITS, max_probes=4)
        assert got[i] == want, f"vec {i}: {got[i] ^ want}"


def test_confidence_probes_superset_and_recall(spark, vecs, planes):
    """Multiprobe candidates are a superset of plain-band candidates; with
    planted near-neighbours the probe pass recovers pairs banding misses."""
    # plant near-duplicates: vector i+0.05*noise for the first 10
    rng = np.random.default_rng(11)
    near = vecs[:10] + 0.08 * rng.standard_normal((10, DIM)).astype(np.float32)
    allv = np.vstack([vecs, near])
    df = _vec_df(spark, allv)
    udf = make_simhash_confidence_udf(planes)
    coded = df.select("vec_id", udf("embedding").alias("c")).select(
        "vec_id", F.col("c.lanes").alias("lanes"), F.col("c.proj").alias("proj")
    ).localCheckpoint(eager=True)

    base = explode_confidence_probes(coded, "lanes", "proj", N_BITS, BAND_BITS, 0)
    multi = explode_confidence_probes(coded, "lanes", "proj", N_BITS, BAND_BITS, 6)
    doc_bands = base  # docs are indexed with plain keys

    def cands(qp):
        return {
            (r.query_id, r.doc_id)
            for r in doc_bands.join(
                qp.withColumnRenamed("vec_id", "query_id"), ["band_id", "band_key"]
            ).filter(F.col("query_id") != F.col("vec_id"))
            .select("query_id", F.col("vec_id").alias("doc_id"))
            .distinct().collect()
        }

    c_base, c_multi = cands(base), cands(multi)
    assert c_base <= c_multi
    # every planted pair (i, 40+i) should be found by SOME tier; multiprobe
    # must not lose any and typically adds coverage
    planted = {(i, 40 + i) for i in range(10)}
    assert len(planted & c_multi) >= len(planted & c_base)


def test_e2lsh_probe_parity_and_superset(spark, vecs):
    params = make_e2lsh_params(DIM, k=3, n_tables=4, w=1.5, seed=5)
    df = _vec_df(spark, vecs)
    buckets = df.select("vec_id", make_e2lsh_udf(params)("embedding").alias("b"))
    buckets = buckets.localCheckpoint(eager=True)

    # parity: the Spark probe table's bucket keys == xxhash64 of the numpy
    # probe tuples (base + perturbations), hashed through the same JVM expr
    n_probes = 4
    got = {
        (r.vec_id, r.table_id, r.bucket_key)
        for r in explode_e2lsh_probe_buckets(buckets, "b", k=3, n_probes=n_probes).collect()
    }
    bk = e2lsh_buckets_numpy(vecs, params)  # (n, L, k)
    expected_rows = []
    for i in range(len(vecs)):
        for t in range(params.n_tables):
            base = bk[i, t]
            for probe in [base] + multiprobe_buckets_numpy(base, n_probes):
                expected_rows.append((i, t, list(map(int, probe))))
    edf = spark.createDataFrame(
        expected_rows, "vec_id long, table_id int, bucket array<int>"
    ).select("vec_id", "table_id", F.xxhash64("table_id", "bucket").alias("bucket_key"))
    want = {(r.vec_id, r.table_id, r.bucket_key) for r in edf.collect()}
    assert got == want

    # superset: multiprobe candidates contain the plain bucket-join candidates
    doc_b = explode_e2lsh_buckets(buckets, "b")
    plain = {
        (r.id_a, r.id_b) for r in e2lsh_candidate_pairs(doc_b).collect()
    }
    qp = explode_e2lsh_probe_buckets(buckets, "b", k=3, n_probes=n_probes)
    multi = {
        tuple(sorted((r.query_id, r.doc_id)))
        for r in e2lsh_query_candidates(doc_b, qp).collect()
    }
    assert plain <= multi


def test_overlap_segment_parity(spark, vecs, planes):
    """H18 segment keys == numpy sliding-window extraction, INCLUDING windows
    that straddle the 64-bit lane boundary (128-bit code, w=8, s=4)."""
    lanes = simhash_vectors_numpy(vecs, planes)  # (n, 2) lanes
    pdf = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "lanes": [row for row in lanes],
    })
    df = spark.createDataFrame(pdf)
    w, s = 8, 4
    got = {
        (r.vec_id, r.band_id, r.band_key)
        for r in explode_overlap_segments(df, "lanes", N_BITS, w, s).collect()
    }
    # numpy reference: unpack bits lane-wise little-endian, read windows
    want = set()
    for i, row in enumerate(lanes.astype(np.uint64)):
        bits = np.zeros(N_BITS, dtype=np.uint64)
        for ln in range(N_BITS // 64):
            bits[ln * 64:(ln + 1) * 64] = (row[ln] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        for seg in range((N_BITS - w) // s + 1):
            window = bits[seg * s: seg * s + w]
            key = int((window << np.arange(w, dtype=np.uint64)).sum())
            want.add((i, seg, key))
    assert got == want


def test_model_save_load_roundtrip(tmp_path, vecs, spark):
    """S10: persisted ITQ / whitening / E2LSH params reproduce codes exactly
    (reference save/load: src/itq_lsh.py:204-237, src/whitening.py:115-140,
    src/dflsh.py:264-289)."""
    itq = itq_fit(vecs, 32, n_iter=10, seed=9)
    save_itq_model(itq, str(tmp_path / "itq.npz"))
    itq2 = load_itq_model(str(tmp_path / "itq"))
    assert np.array_equal(itq_transform_numpy(vecs, itq), itq_transform_numpy(vecs, itq2))

    wm = whitening_fit(vecs)
    save_whiten_model(wm, str(tmp_path / "wm.npz"))
    wm2 = load_whiten_model(str(tmp_path / "wm"))
    assert np.array_equal(
        whitening_transform_numpy(vecs, wm), whitening_transform_numpy(vecs, wm2)
    )

    ep = make_e2lsh_params(DIM, k=3, n_tables=2, w=2.0, seed=1)
    save_e2lsh_params(ep, str(tmp_path / "e2lsh.npz"))
    ep2 = load_e2lsh_params(str(tmp_path / "e2lsh"))
    assert np.array_equal(e2lsh_buckets_numpy(vecs, ep), e2lsh_buckets_numpy(vecs, ep2))
    assert ep2.w == ep.w


def test_fit_itq_deterministic_across_partitionings(spark, vecs):
    df1 = _vec_df(spark, vecs).repartition(7)
    df2 = _vec_df(spark, vecs).repartition(2).sortWithinPartitions("embedding")
    m1 = fit_itq_on_dataframe(df1, "embedding", 32, sample_rows=25, n_iter=5)
    m2 = fit_itq_on_dataframe(df2, "embedding", 32, sample_rows=25, n_iter=5)
    assert np.array_equal(m1.mean, m2.mean)
    assert np.array_equal(m1.pca, m2.pca)
    assert np.array_equal(m1.rotation, m2.rotation)


def test_combined_band_pivot_filter(spark, vecs, planes):
    """Composition parity (reference combined_band_pivot_filter,
    src/dflsh.py:460-519): output == band-join candidates pruned by the
    numpy triangle-inequality mask."""
    from lsh_cascade_poc_spark.embedding.search import (
        combined_band_pivot_candidates,
        with_pivot_distances,
    )
    from lsh_cascade_poc_spark.embedding.vector_hash import explode_lane_bands

    lanes = simhash_vectors_numpy(vecs, planes)
    pdf = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "lanes": [row for row in lanes],
    })
    df = spark.createDataFrame(pdf).localCheckpoint(eager=True)
    pivots = lanes[:3]
    with_pd = with_pivot_distances(df, "lanes", pivots).localCheckpoint(eager=True)

    bands = explode_lane_bands(df, "lanes", N_BITS, band_bits=8)
    queries = df.filter(F.col("vec_id") < 5)
    q_bands = explode_lane_bands(queries, "lanes", N_BITS, band_bits=8)
    threshold = 6
    got = {
        (r.query_id, r.doc_id)
        for r in combined_band_pivot_candidates(
            bands, q_bands, with_pd, with_pd, n_pivots=3, threshold=threshold
        ).filter(F.col("query_id") != F.col("doc_id")).collect()
    }

    # numpy reference
    u = lanes.astype(np.uint64)

    def ham(a, b):
        return sum(int(x ^ y).bit_count() for x, y in zip(a, b))

    pd_mat = np.array([[ham(row, p) for p in pivots.astype(np.uint64)] for row in u])
    want = set()
    n_bands = N_BITS // 8
    for q in range(5):
        for d in range(len(vecs)):
            if d == q:
                continue
            share = any(
                (int(u[q][b * 8 // 64]) >> (b * 8 % 64)) & 0xFF
                == (int(u[d][b * 8 // 64]) >> (b * 8 % 64)) & 0xFF
                for b in range(n_bands)
            )
            if share and all(
                abs(pd_mat[d][i] - pd_mat[q][i]) <= threshold for i in range(3)
            ):
                want.add((q, d))
    assert got == want


def test_ivf_assign_parity_and_full_probe_recall(spark, vecs):
    """IVF: Spark cell assignment == numpy argmax; probing ALL cells
    recovers exactly the brute-force top-k; model save/load roundtrip."""
    from lsh_cascade_poc_spark.embedding.ivf import (
        assign_cells,
        fit_ivf_on_dataframe,
        ivf_fit,
        ivf_search,
        load_ivf_model,
        save_ivf_model,
    )
    from lsh_cascade_poc_spark.embedding.search import cosine_topk

    df = _vec_df(spark, vecs).localCheckpoint(eager=True)
    model = ivf_fit(vecs, n_cells=4, n_iter=10, seed=1)

    with_cells = assign_cells(df, model)
    got = {r.vec_id: r.cell_id for r in with_cells.collect()}
    n = np.linalg.norm(vecs, axis=1, keepdims=True)
    want = np.argmax((vecs / n) @ model.centroids.T, axis=1)
    assert got == {i: int(want[i]) for i in range(len(vecs))}

    queries = df.filter(F.col("vec_id") < 4)
    full = ivf_search(with_cells, queries, model, top_k=5, nprobe=4)
    brute = cosine_topk(
        df, queries.withColumnRenamed("vec_id", "query_id"), 5
    ).filter(F.col("query_id") != F.col("doc_id"))
    got_pairs = {(r.query_id, r.doc_id) for r in full.collect()}
    # brute force includes self-matches at rank 1 which ivf_search excludes;
    # recompute brute without self for a fair set comparison
    brute2 = cosine_topk(
        df.filter(F.col("vec_id") >= 0), queries.withColumnRenamed("vec_id", "query_id"),
        6
    ).filter(F.col("query_id") != F.col("doc_id")) \
        .filter(F.col("rank") <= 6)
    want_pairs = set()
    per_q: dict = {}
    for r in sorted(brute2.collect(), key=lambda r: (r.query_id, r.rank)):
        per_q.setdefault(r.query_id, [])
        if len(per_q[r.query_id]) < 5:
            per_q[r.query_id].append(r.doc_id)
            want_pairs.add((r.query_id, r.doc_id))
    assert got_pairs == want_pairs

    # nprobe=1 candidates are a subset; recall still positive
    one = ivf_search(with_cells, queries, model, top_k=5, nprobe=1)
    assert 0 < one.count() <= full.count()


def test_ivf_model_roundtrip(tmp_path, vecs):
    from lsh_cascade_poc_spark.embedding.ivf import (
        ivf_fit, load_ivf_model, save_ivf_model,
    )

    m = ivf_fit(vecs, n_cells=4, n_iter=5, seed=7)
    save_ivf_model(m, str(tmp_path / "ivf.npz"))
    m2 = load_ivf_model(str(tmp_path / "ivf"))
    assert np.array_equal(m.centroids, m2.centroids)
