"""Banding + pair generation semantics (F1/F4 analogs) and hot-key capping."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from lsh_cascade_poc_spark.operators.bands import cap_hot_bands, explode_bands
from lsh_cascade_poc_spark.operators.pairs import (
    collapse_exact_duplicates,
    pairs_from_bands,
    pairs_with_min_match,
    survivors,
)


def _sig_df(spark, sigs: dict[int, list[int]]):
    pdf = pd.DataFrame(
        {"doc_id": list(sigs), "minhash": [list(v) for v in sigs.values()]}
    )
    return spark.createDataFrame(pdf, schema="doc_id long, minhash array<long>")


def test_identical_signatures_collide_in_all_bands(spark):
    sig = list(range(16))
    df = _sig_df(spark, {1: sig, 2: sig, 3: list(range(100, 116))})
    bands = explode_bands(df, "minhash", tier=0, n_bands=4, rows_per_band=4)
    assert bands.count() == 12
    pairs = pairs_from_bands(bands).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
    mm = pairs_with_min_match(bands, 4).collect()
    assert [(r.id_a, r.id_b, r.n_bands) for r in mm] == [(1, 2, 4)]


def test_partial_band_match(spark):
    a = list(range(16))
    b = list(range(8)) + list(range(200, 208))  # shares bands 0,1 only
    df = _sig_df(spark, {1: a, 2: b})
    bands = explode_bands(df, "minhash", tier=0, n_bands=4, rows_per_band=4)
    mm2 = pairs_with_min_match(bands, 2).collect()
    assert [(r.id_a, r.id_b, r.n_bands) for r in mm2] == [(1, 2, 2)]
    mm3 = pairs_with_min_match(bands, 3).count()
    assert mm3 == 0


def test_band_id_participates_in_key(spark):
    # same 4 lanes at different band positions must NOT collide
    # (the reference's "c{i}_" prefix trick, src/lsh.py:266-304)
    a = [7, 7, 7, 7] + [1, 2, 3, 4]
    b = [5, 5, 5, 5] + [7, 7, 7, 7]
    df = _sig_df(spark, {1: a, 2: b})
    bands = explode_bands(df, "minhash", tier=0, n_bands=2, rows_per_band=4)
    assert pairs_from_bands(bands).count() == 0


def test_tier_participates_in_key(spark):
    df = _sig_df(spark, {1: [1, 2, 3, 4]})
    b0 = explode_bands(df, "minhash", tier=0, n_bands=1, rows_per_band=4)
    b1 = explode_bands(df, "minhash", tier=1, n_bands=1, rows_per_band=4)
    k0 = b0.collect()[0].band_key
    k1 = b1.collect()[0].band_key
    assert k0 != k1


def test_hot_band_cap_drops_and_records(spark):
    sig = [1, 2, 3, 4]
    df = _sig_df(spark, {i: sig for i in range(10)})
    bands = explode_bands(df, "minhash", tier=0, n_bands=1, rows_per_band=4)
    kept, hot = cap_hot_bands(bands, cap=5)
    assert kept.count() == 0
    hrows = hot.collect()
    assert len(hrows) == 1 and hrows[0].n_docs == 10
    kept2, hot2 = cap_hot_bands(bands, cap=100)
    assert kept2.count() == 10 and hot2.count() == 0


def test_survivors_and_exact_pairs(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    surv = sorted({r.doc_id for r in survivors(pairs).collect()})
    assert surv == [1, 2, 3]  # set-wise: survivors() may emit duplicates

    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "z")],
        "doc_id long, fingerprint string",
    )
    reps, star = collapse_exact_duplicates(docs)
    ep = sorted((r.id_a, r.id_b) for r in star.collect())
    # star topology: every member pairs with the group min
    assert ep == [(1, 2), (1, 3)]
    assert sorted(r.doc_id for r in reps.collect()) == [1, 4, 5]
