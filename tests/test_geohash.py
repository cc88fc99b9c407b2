"""Geohash (geo/geohash.py): published anchor, prefix property,
numpy/Catalyst/SQL three-implementation agreement, precision guard."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from osm2garmin_spark.geo.geohash import (
    ALPHABET, geohash_col, geohash_np, geohash_sql_ctes,
)


def test_published_anchor():
    # the classic example: (57.64911, 10.40744) -> u4pruydqqvj8
    gh = geohash_np(np.array([57.64911]), np.array([10.40744]), 12)
    assert gh[0] == "u4pruydqqvj8"
    gh6 = geohash_np(np.array([57.64911]), np.array([10.40744]), 6)
    assert gh6[0] == "u4pruy"
    # equator/greenwich sits at the s/7 boundary cell
    assert geohash_np(np.array([0.0]), np.array([0.0]), 2)[0] == "s0"


def test_prefix_property_exact():
    rng = np.random.default_rng(31)
    lat = rng.uniform(-90, 90, 2000)
    lon = rng.uniform(-180, 180, 2000)
    g8 = geohash_np(lat, lon, 8)
    g4 = geohash_np(lat, lon, 4)
    assert all(a.startswith(b) for a, b in zip(g8, g4))


def test_precision_validation():
    with pytest.raises(ValueError, match="precision"):
        geohash_np(np.array([0.0]), np.array([0.0]), 7)
    with pytest.raises(ValueError, match="precision"):
        geohash_np(np.array([0.0]), np.array([0.0]), 14)


def test_alphabet_is_the_published_one():
    assert ALPHABET == "0123456789bcdefghjkmnpqrstuvwxyz"
    assert len(set(ALPHABET)) == 32
    for banned in "ailo":
        assert banned not in ALPHABET


def test_catalyst_and_sql_twins_match_numpy(spark):
    rng = np.random.default_rng(41)
    lat = rng.uniform(-90, 90, 500)
    lon = rng.uniform(-180, 180, 500)
    want = list(geohash_np(lat, lon, 8))

    rows = [(int(i), float(la), float(lo))
            for i, (la, lo) in enumerate(zip(lat, lon))]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = df.select("id", geohash_col(F.col("lat"), F.col("lon"), 8)
                    .alias("gh")).orderBy("id").collect()
    assert [r["gh"] for r in got] == want

    con = duckdb.connect()
    con.register("pts", pd.DataFrame(
        {"id": range(len(lat)), "lat": lat, "lon": lon}))
    ctes = geohash_sql_ctes("pts", "id", "lat", "lon", 8)
    res = con.execute(
        f"WITH {ctes} SELECT id, geohash FROM ghf ORDER BY id").fetchall()
    assert [r[1] for r in res] == want

def test_neighbors_geometric_and_symmetric():
    from osm2garmin_spark.geo.geohash import neighbors_np, decode_int_np, geohash_int_np
    rng = np.random.default_rng(13)
    for _ in range(30):
        la = float(rng.uniform(-80, 80))
        lo = float(rng.uniform(-179, 179))
        gh = geohash_np(np.array([la]), np.array([lo]), 6)[0]
        ns = neighbors_np(gh)
        assert len(ns) == 8 and gh not in ns
        # nudge one cell east/west/north/south: the nudged hash must be
        # self or a neighbor (nudge = one cell width in each axis)
        for dla, dlo in ((0, 360 / 2**15), (0, -360 / 2**15),
                         (180 / 2**15, 0), (-180 / 2**15, 0)):
            gh2 = geohash_np(np.array([la + dla]), np.array([lo + dlo]), 6)[0]
            assert gh2 == gh or gh2 in ns, (gh, gh2)
        # symmetry
        for m in ns:
            assert gh in neighbors_np(m)


def test_neighbors_wrap_and_poles():
    from osm2garmin_spark.geo.geohash import neighbors_np
    east = geohash_np(np.array([10.0]), np.array([179.999]), 4)[0]
    west = geohash_np(np.array([10.0]), np.array([-179.999]), 4)[0]
    assert west in neighbors_np(east)
    # top-row cell: only 5 neighbors (nothing above the pole)
    top = geohash_np(np.array([89.999]), np.array([0.0]), 4)[0]
    assert len(neighbors_np(top)) == 5


def test_cover_rect_exact_and_plan_broadcast(spark):
    from osm2garmin_spark.geo.geohash import cover_rect_np
    from osm2garmin_spark.queries import geohash_cover_filter
    import io, contextlib

    # exactness both ways at a coarse precision: inside covered, a point
    # one full cell outside the rect is NOT covered
    cov = set(cover_rect_np(10.0, 20.0, -10.0, 10.0, 2))
    inside = geohash_np(np.array([15.0]), np.array([0.0]), 2)[0]
    outside = geohash_np(np.array([40.0]), np.array([60.0]), 2)[0]
    assert inside in cov and outside not in cov
    with pytest.raises(ValueError, match="antimeridian"):
        cover_rect_np(0.0, 1.0, 170.0, -170.0, 2)

    df = geohash_cover_filter(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "Broadcast" in line, f"fact-side shuffle leaked: {line}"
