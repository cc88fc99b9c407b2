"""Hex k-ring kNN (operators/knn_hex.py): bit-parity with the broadcast
window twin, forced escalation, margin/tie discipline, edge cases."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from osm2garmin_spark.operators.knn import knn_broadcast
from osm2garmin_spark.operators.knn_hex import (
    knn_hex_kring, tune_res, MIN_RES, MAX_KNN_RES,
)


def _df(spark, ids, lat, lon, prefix):
    return spark.createDataFrame(pd.DataFrame({
        f"{prefix}_id": ids,
        f"{prefix}_lat": np.asarray(lat, float),
        f"{prefix}_lon": np.asarray(lon, float)}))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_broadcast_random(spark):
    rng = np.random.default_rng(11)
    nq, nn = 300, 2500
    q = _df(spark, np.arange(nq), rng.uniform(-60, 60, nq),
            rng.uniform(-120, 120, nq), "q")
    n = _df(spark, np.arange(nn), rng.uniform(-60, 60, nn),
            rng.uniform(-120, 120, nn), "n")
    got = knn_hex_kring(q, n, k=3, res=6)
    want = knn_broadcast(q, n, k=3)
    assert _rows(got) == _rows(want)


def test_matches_broadcast_clustered_with_escalation(spark):
    # a dense metro + a sparse tail; a fine forced res guarantees many
    # queries escalate several levels before their flower holds k=5
    rng = np.random.default_rng(12)
    metro_n = np.stack([rng.normal(40.7, 0.05, 2000),
                        rng.normal(-74.0, 0.05, 2000)], axis=1)
    tail_n = np.stack([rng.uniform(-80, 80, 150),
                       rng.uniform(-170, 170, 150)], axis=1)
    alln = np.concatenate([metro_n, tail_n])
    q_pts = np.stack([rng.uniform(-80, 80, 250),
                      rng.uniform(-170, 170, 250)], axis=1)
    q = _df(spark, np.arange(len(q_pts)), q_pts[:, 0], q_pts[:, 1], "q")
    n = _df(spark, np.arange(len(alln)), alln[:, 0], alln[:, 1], "n")
    got = knn_hex_kring(q, n, k=5, res=9)     # very fine: forces escalation
    want = knn_broadcast(q, n, k=5)
    assert _rows(got) == _rows(want)


def test_boundary_ties_resolve_by_id(spark):
    # two neighbors exactly equidistant: the smaller n_id must win rank;
    # and a neighbor on the flower boundary must not be silently dropped
    q = _df(spark, [0], [0.0], [0.0], "q")
    n = _df(spark, [7, 3, 9], [1.0, -1.0, 0.0], [0.0, 0.0, 2.0], "n")
    got = _rows(knn_hex_kring(q, n, k=2, res=4))
    assert got == [(0, 3, 1), (0, 7, 2)]


def test_k_exceeds_neighbor_count(spark):
    rng = np.random.default_rng(13)
    q = _df(spark, np.arange(20), rng.uniform(-10, 10, 20),
            rng.uniform(-10, 10, 20), "q")
    n = _df(spark, np.arange(4), rng.uniform(-10, 10, 4),
            rng.uniform(-10, 10, 4), "n")
    got = knn_hex_kring(q, n, k=9, res=5)
    want = knn_broadcast(q, n, k=9)
    assert _rows(got) == _rows(want)
    assert got.count() == 20 * 4


def test_empty_sides(spark):
    schema_q = "q_id long, q_lat double, q_lon double"
    schema_n = "n_id long, n_lat double, n_lon double"
    q = _df(spark, [1], [0.0], [0.0], "q")
    empty_n = spark.createDataFrame([], schema_n)
    assert knn_hex_kring(q, empty_n, k=3, res=5).count() == 0
    empty_q = spark.createDataFrame([], schema_q)
    n = _df(spark, [1], [0.0], [0.0], "n")
    assert knn_hex_kring(empty_q, n, k=3, res=5).count() == 0


def test_auto_res_small_dispatches_bruteforce(spark):
    # small neighbor table + res=None -> broadcast numpy kernel, same rows
    rng = np.random.default_rng(14)
    q = _df(spark, np.arange(50), rng.uniform(-30, 30, 50),
            rng.uniform(-30, 30, 50), "q")
    n = _df(spark, np.arange(500), rng.uniform(-30, 30, 500),
            rng.uniform(-30, 30, 500), "n")
    got = knn_hex_kring(q, n, k=3)
    want = knn_broadcast(q, n, k=3)
    assert _rows(got) == _rows(want)


def test_tune_res_monotone_in_density():
    # denser corpus -> finer resolution; bounds respected
    sparse = tune_res(10_000, -60, 60, -120, 120, k=3)
    dense = tune_res(100_000_000, -60, 60, -120, 120, k=3)
    assert dense > sparse
    assert MIN_RES <= sparse <= dense <= MAX_KNN_RES
    assert tune_res(0, 0, 0, 0, 0, k=3) == 5
    # astronomic density clamps at the packing-safe max
    assert tune_res(10**14, 0, 1, 0, 1, k=1) == MAX_KNN_RES


def test_identical_points_all_stack_one_cell(spark):
    # pathological skew: every neighbor at one point; ties break by id
    q = _df(spark, [0, 1], [5.0, -5.0], [5.0, -5.0], "q")
    n = _df(spark, np.arange(10), np.full(10, 5.0), np.full(10, 5.0), "n")
    got = knn_hex_kring(q, n, k=3, res=8)
    want = knn_broadcast(q, n, k=3)
    assert _rows(got) == _rows(want)


def test_never_collects_neighbors(spark, monkeypatch):
    """The k-ring path (explicit res) must not collect the neighbor
    table regardless of size — only the 1-row aggregates run."""
    import osm2garmin_spark.operators.knn as knn_mod
    rng = np.random.default_rng(15)
    q = _df(spark, np.arange(40), rng.uniform(-20, 20, 40),
            rng.uniform(-20, 20, 40), "q")
    n = _df(spark, np.arange(3000), rng.uniform(-20, 20, 3000),
            rng.uniform(-20, 20, 3000), "n")

    def boom(*a, **kw):
        raise AssertionError("bruteforce (neighbor collect) must not run")

    monkeypatch.setattr(knn_mod, "knn_bruteforce_np", boom)
    import osm2garmin_spark.operators.knn_hex as hexknn_mod
    monkeypatch.setattr(hexknn_mod, "knn_bruteforce_np", boom)
    got = knn_hex_kring(q, n, k=3, res=6)
    want = knn_broadcast(q, n, k=3)
    assert _rows(got) == _rows(want)
