"""Fixed-radius near-neighbor join (operators/range_join.py):
brute-force parity, dateline wrap, rigorous-bound cell sizing, plan
shape (hash equi-join on cells, never cartesian), input guards."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from osm2garmin_spark.operators.range_join import (
    R_EARTH, _cell_sizes_deg, haversine_km, range_join_within,
)


def _hav_np(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = np.radians(lat2 - lat1)
    dl = np.radians(lon2 - lon1)
    a = (np.sin(dp / 2) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2)
    return 2 * R_EARTH * np.arcsin(np.sqrt(np.minimum(a, 1.0)))


def _mkdf(spark, ids, lat, lon, idname):
    rows = [(int(i), float(la), float(lo)) for i, la, lo in zip(ids, lat, lon)]
    return spark.createDataFrame(rows, f"{idname} long, lat double, lon double")


def test_cell_sizes_are_rigorous_bounds():
    cell_lat, cell_lon = _cell_sizes_deg(150.0, 85.1)
    # lat: exactly degrees(R/R_E)
    assert cell_lat == pytest.approx(math.degrees(150.0 / R_EARTH))
    # lon: any pair within 150 km at |lat| <= 85.1 must differ by < cell_lon
    # (sample extremes near the cap)
    lat = np.full(1000, 85.1)
    dlon = np.linspace(0, cell_lon * 1.5, 1000)
    d = _hav_np(lat, np.zeros(1000), lat, dlon)
    assert (d[dlon > cell_lon] > 150.0).all()


def test_degenerate_grids_raise():
    with pytest.raises(ValueError, match="radius"):
        _cell_sizes_deg(0.0, 85.0)
    with pytest.raises(ValueError, match="s2"):
        _cell_sizes_deg(5000.0, 89.0)   # lon cells span the globe


def test_matches_brute_force(spark):
    rng = np.random.default_rng(17)
    na, nb = 150, 900
    alat = rng.uniform(-80, 80, na)
    alon = rng.uniform(-180, 180, na)
    blat = rng.uniform(-80, 80, nb)
    blon = rng.uniform(-180, 180, nb)
    r = 400.0
    a = _mkdf(spark, range(na), alat, alon, "a_id")
    b = _mkdf(spark, range(nb), blat, blon, "b_id")
    got = sorted((x["a_id"], x["b_id"]) for x in
                 range_join_within(a, b, r, max_abs_lat=80.5).collect())
    d = _hav_np(alat[:, None], alon[:, None], blat[None, :], blon[None, :])
    want = sorted((i, j) for i, j in zip(*np.nonzero(d <= r)))
    assert got == [(int(i), int(j)) for i, j in want]


def test_dateline_pairs_found(spark):
    a = _mkdf(spark, [0], [10.0], [179.95], "a_id")
    b = _mkdf(spark, [0, 1], [10.0, 10.0], [-179.95, 0.0], "b_id")
    got = range_join_within(a, b, 50.0, max_abs_lat=20.0).collect()
    assert [(r["a_id"], r["b_id"]) for r in got] == [(0, 0)]


def test_dateline_residual_cell_regression(spark):
    """ADVICE r5 repro: with ceil()-sized fixed-width cells the residual
    cell before the seam was narrower than cell_lon, so (10, 179.737)
    and (10, -179.99) — 20.2 km apart at radius 50 — landed 2 cells
    apart (mod n_x) and were dropped. The uniform ring (floor + scaled
    index) must find the pair."""
    a = _mkdf(spark, [0], [10.0], [179.737], "a_id")
    b = _mkdf(spark, [0], [10.0], [-179.99], "b_id")
    got = range_join_within(a, b, 50.0, max_abs_lat=20.0).collect()
    assert [(r["a_id"], r["b_id"]) for r in got] == [(0, 0)]


def test_dateline_seam_sweep_matches_brute_force(spark):
    """Property sweep across the seam: points packed into the last few
    degrees on both sides of +-180 at several radii (several ring
    widths) — pair sets must equal the numpy brute force exactly."""
    rng = np.random.default_rng(23)
    n = 120
    lat = rng.uniform(5.0, 15.0, n)
    lon = np.where(rng.random(n) < 0.5,
                   rng.uniform(176.0, 180.0, n),
                   rng.uniform(-180.0, -176.0, n))
    a = _mkdf(spark, range(n), lat, lon, "a_id")
    b = _mkdf(spark, range(n), lat, lon, "b_id")
    for r in (25.0, 50.0, 150.0, 400.0):
        got = sorted((x["a_id"], x["b_id"]) for x in
                     range_join_within(a, b, r, max_abs_lat=20.0).collect())
        d = _hav_np(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
        want = sorted((int(i), int(j)) for i, j in zip(*np.nonzero(d <= r)))
        assert got == want, r


def test_nan_rows_drop_out_silently(spark):
    """ADVICE r5: Spark orders NaN above every double, so an unguarded
    abs(NaN) > cap fired the raise_error guard and killed the job. NaN
    coordinates must instead get NULL keys and vanish from the inner
    join, exactly like NULLs; finite out-of-cap rows must still raise."""
    a = _mkdf(spark, [0, 1], [10.0, float("nan")], [10.0, 10.0], "a_id")
    b = _mkdf(spark, [0, 1], [10.1, 10.1], [10.1, float("nan")], "b_id")
    got = range_join_within(a, b, 50.0, max_abs_lat=20.0).collect()
    assert [(r["a_id"], r["b_id"]) for r in got] == [(0, 0)]
    bad = _mkdf(spark, [0], [89.0], [0.0], "a_id")
    with pytest.raises(Exception, match="max_abs_lat"):
        range_join_within(bad, b, 50.0, max_abs_lat=20.0).collect()


def test_distance_column_and_no_duplicates(spark):
    rng = np.random.default_rng(5)
    n = 120
    lat = rng.uniform(-30, 30, n)
    lon = rng.uniform(-40, 40, n)
    a = _mkdf(spark, range(n), lat, lon, "a_id")
    b = _mkdf(spark, range(n), lat, lon, "b_id")
    out = range_join_within(a, b, 300.0, max_abs_lat=35.0,
                            dist_col="dist_km").collect()
    pairs = [(r["a_id"], r["b_id"]) for r in out]
    assert len(pairs) == len(set(pairs))           # each pair exactly once
    # self pairs present at distance 0
    selfs = [r for r in out if r["a_id"] == r["b_id"]]
    assert len(selfs) == n and all(r["dist_km"] == 0.0 for r in selfs)
    # reported distance equals the numpy haversine
    for r in out[:50]:
        want = _hav_np(lat[r["a_id"]], lon[r["a_id"]],
                       lat[r["b_id"]], lon[r["b_id"]])
        assert r["dist_km"] == pytest.approx(float(want), rel=1e-12)


def test_polar_input_raises(spark):
    a = _mkdf(spark, [0], [89.0], [0.0], "a_id")
    b = _mkdf(spark, [0], [10.0], [0.0], "b_id")
    with pytest.raises(Exception, match="max_abs_lat"):
        range_join_within(a, b, 50.0, max_abs_lat=80.0).collect()


def test_plan_is_hash_equi_join_no_cartesian(spark):
    rng = np.random.default_rng(9)
    n = 200
    a = _mkdf(spark, range(n), rng.uniform(-60, 60, n),
              rng.uniform(-180, 180, n), "a_id")
    b = _mkdf(spark, range(n), rng.uniform(-60, 60, n),
              rng.uniform(-180, 180, n), "b_id")
    plan = range_join_within(a, b, 200.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan and "_ix" in plan

def test_radius_bounded_knn_semantics(spark):
    """Geofenced kNN: per-query ranks are 1..min(k, in-range count) and a
    query with nothing in range is absent (no escalation)."""
    from pyspark.sql import Window

    rng = np.random.default_rng(3)
    # one isolated query far from every neighbor
    alat = np.append(rng.uniform(-20, 20, 30), 60.0)
    alon = np.append(rng.uniform(-20, 20, 30), 150.0)
    blat = rng.uniform(-20, 20, 300)
    blon = rng.uniform(-20, 20, 300)
    a = _mkdf(spark, range(31), alat, alon, "a_id")
    b = _mkdf(spark, range(300), blat, blon, "b_id")
    r = 500.0
    pairs = range_join_within(a, b, r, max_abs_lat=61.0, dist_col="d")
    w = Window.partitionBy("a_id").orderBy(F.col("d").asc(), F.col("b_id").asc())
    out = pairs.withColumn("rnk", F.row_number().over(w)) \
        .filter(F.col("rnk") <= 3).collect()
    got = {}
    for row in out:
        got.setdefault(row["a_id"], []).append((row["rnk"], row["b_id"], row["d"]))
    assert 30 not in got                      # isolated query: no rows
    d = _hav_np(alat[:30, None], alon[:30, None], blat[None, :], blon[None, :])
    for q, rows in got.items():
        rows.sort()
        assert [r_[0] for r_ in rows] == list(range(1, len(rows) + 1))
        in_range = np.nonzero(d[q] <= r)[0]
        order = in_range[np.lexsort((in_range, d[q][in_range]))]
        want = [int(i) for i in order[:3]]
        assert [r_[1] for r_ in rows] == want, q
