"""Web-Mercator slippy tiles / quadkeys (geo/webmercator.py):
anchors, clamps, pyramid prefix property, decode containment,
numpy/Catalyst/SQL three-implementation agreement."""

import math

import duckdb
import numpy as np

from pyspark.sql import functions as F

from osm2garmin_spark.geo.webmercator import (
    MAX_LAT, quadkey_col, quadkey_np, quadkey_sql,
    slippy_center_latlon_np, slippy_x_col, slippy_x_sql, slippy_xy_np,
    slippy_y_col, slippy_y_sql,
)


def _sample(n=500, seed=47):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-89.0, 89.0, n)
    lon = rng.uniform(-180.0, 180.0, n)
    return lat, lon


def test_anchor_tiles():
    # Greenwich equator: the south-east tile of every zoom's center cross.
    lat = np.array([0.0, 0.0, 40.0, -33.9])
    lon = np.array([0.0, 0.0, -74.0, 151.2])
    x1, y1 = slippy_xy_np(lat[:2], lon[:2], 1)
    assert list(x1) == [1, 1] and list(y1) == [1, 1]
    # NYC: west + north hemispheres at zoom 1 -> (0, 0);
    # Sydney: east + south -> (1, 1)
    x, y = slippy_xy_np(lat[2:], lon[2:], 1)
    assert list(x) == [0, 1] and list(y) == [0, 1]


def test_quadkey_hand_computed():
    qk = quadkey_np(np.array([3]), np.array([5]), 3)
    assert qk[0] == "213"
    qk0 = quadkey_np(np.array([0]), np.array([0]), 4)
    assert qk0[0] == "0000"


def test_clamps():
    z = 8
    n = 1 << z
    x, y = slippy_xy_np(np.array([89.9, -89.9, 0.0, 0.0]),
                        np.array([0.0, 0.0, -180.0, 179.999999]), z)
    assert y[0] == 0 and y[1] == n - 1
    assert x[2] == 0 and x[3] == n - 1
    # exactly +-MAX_LAT stays in range
    x, y = slippy_xy_np(np.array([MAX_LAT, -MAX_LAT]),
                        np.array([0.0, 0.0]), z)
    assert 0 <= y[0] <= n - 1 and 0 <= y[1] <= n - 1


def test_pyramid_prefix_property():
    lat, lon = _sample()
    x12, y12 = slippy_xy_np(lat, lon, 12)
    x5, y5 = slippy_xy_np(lat, lon, 5)
    # parent tile = child >> (dz) in both axes
    assert (x5 == (x12 >> 7)).all()
    assert (y5 == (y12 >> 7)).all()
    # quadkey at z5 is the 5-char prefix of the z12 quadkey
    q12 = quadkey_np(x12, y12, 12)
    q5 = quadkey_np(x5, y5, 5)
    assert all(a.startswith(b) for a, b in zip(q12, q5))


def test_decode_center_reencodes_to_same_tile():
    lat, lon = _sample(300, seed=11)
    for z in (3, 9, 15):
        x, y = slippy_xy_np(lat, lon, z)
        clat, clon = slippy_center_latlon_np(x, y, z)
        x2, y2 = slippy_xy_np(clat, clon, z)
        assert (x2 == x).all() and (y2 == y).all()


def test_scalar_reference_parity():
    # independent per-point scalar implementation (math module, the
    # published OSM wiki formula verbatim)
    lat, lon = _sample(200, seed=3)
    z = 13
    n = 1 << z
    xs, ys = [], []
    for la, lo in zip(lat, lon):
        la = max(-MAX_LAT, min(MAX_LAT, la))
        xs.append(min(n - 1, max(0, int(math.floor((lo + 180.0) / 360.0 * n)))))
        lr = math.radians(la)
        ys.append(min(n - 1, max(0, int(math.floor(
            (1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr)) / math.pi)
            / 2.0 * n)))))
    x, y = slippy_xy_np(lat, lon, z)
    assert list(x) == xs and list(y) == ys


def test_catalyst_and_sql_twins_match_numpy(spark):
    lat, lon = _sample(400, seed=29)
    z = 12
    xs, ys = slippy_xy_np(lat, lon, z)
    qk = quadkey_np(xs, ys, z)

    rows = [(int(i), float(la), float(lo))
            for i, (la, lo) in enumerate(zip(lat, lon))]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = (df.select(
        "id",
        slippy_x_col(F.col("lon"), z).alias("x"),
        slippy_y_col(F.col("lat"), z).alias("y"))
        .withColumn("qk", quadkey_col(F.col("x"), F.col("y"), z))
        .orderBy("id").collect())
    assert [r["x"] for r in got] == list(xs)
    assert [r["y"] for r in got] == list(ys)
    assert [r["qk"] for r in got] == list(qk)

    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame(
        {"id": range(len(lat)), "lat": lat, "lon": lon}))
    sql = f"""
    WITH t AS (
      SELECT id, {slippy_x_sql('lon', z)} AS x, {slippy_y_sql('lat', z)} AS y
      FROM pts)
    SELECT id, x, y, {quadkey_sql('x', 'y', z)} AS qk FROM t ORDER BY id
    """
    res = con.execute(sql).fetchall()
    assert [r[1] for r in res] == list(xs)
    assert [r[2] for r in res] == list(ys)
    assert [r[3] for r in res] == list(qk)


def test_tile_webcover_bridge_invariant(spark):
    """Assignment ⊆ cover: a point inside a Garmin tile's (raw) map-unit
    rect must land in a web tile that tile_webcover enumerated for it."""
    from osm2garmin_spark.queries import (
        _FIXED_TILES, _WEBCOVER_ZOOM, _event_points, tile_webcover)
    from osm2garmin_spark.geo.units import to_map_unit

    cover = {(r["tile_id"], r["web_x"], r["web_y"])
             for r in tile_webcover(spark, "/root/testdata/sf0.001").collect()}
    pts = _event_points(spark, "/root/testdata/sf0.001").limit(2000).collect()
    lat = np.array([r["lat"] for r in pts])
    lon = np.array([r["lon"] for r in pts])
    lat_mu = to_map_unit(lat)
    lon_mu = to_map_unit(lon)
    x, y = slippy_xy_np(lat, lon, _WEBCOVER_ZOOM)
    checked = 0
    for t in _FIXED_TILES:
        inside = ((lat_mu >= t.min_lat) & (lat_mu <= t.max_lat)
                  & (lon_mu >= t.min_long) & (lon_mu <= t.max_long))
        for xi, yi in zip(x[inside], y[inside]):
            assert (t.map_id, int(xi), int(yi)) in cover
            checked += 1
    assert checked > 800


def test_quadkey_zoom0_fails_identically_in_all_twins():
    """ADVICE r5 low: quadkey_col raised for zoom < 1 while quadkey_sql
    rendered invalid SQL ('' join of zero digits) and quadkey_np
    silently returned empty strings. All three twins must now fail the
    same way."""
    import pytest
    from pyspark.sql import functions as F
    from osm2garmin_spark.geo.webmercator import (
        quadkey_col, quadkey_np, quadkey_sql)

    for fn, args in ((quadkey_col, (F.lit(0), F.lit(0), 0)),
                     (quadkey_sql, ("x", "y", 0)),
                     (quadkey_np, (np.array([0]), np.array([0]), 0))):
        with pytest.raises(ValueError, match="zoom >= 1"):
            fn(*args)
