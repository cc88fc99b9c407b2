"""Hierarchical cell codec: numpy / Catalyst / SQL implementations agree;
prefix & ring properties hold."""

import numpy as np
import duckdb
import pytest
from pyspark.sql import functions as F

from osm2garmin_spark.geo.cells import (
    cell_id_np, cell_id_col, cell_id_sql, cell_xy_np, parent_np, k_ring_np,
)
from osm2garmin_spark.geo.units import to_map_unit


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(21)
    lat = rng.uniform(-84, 84, 500)
    lon = rng.uniform(-179, 179, 500)
    return to_map_unit(lat), to_map_unit(lon)


def test_three_impls_agree(spark, sample):
    lat_mu, lon_mu = sample
    import pandas as pd
    pdf = pd.DataFrame({"lat_mu": lat_mu, "lon_mu": lon_mu})
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    for res in (5, 7, 9, 13):
        want = cell_id_np(lat_mu, lon_mu, res)
        got_col = np.array([r["c"] for r in df.select(
            cell_id_col(F.col("lat_mu"), F.col("lon_mu"), res).alias("c")).collect()])
        got_sql = con.execute(
            f"SELECT {cell_id_sql('lat_mu', 'lon_mu', res)} AS c FROM t"
        ).df()["c"].to_numpy()
        assert (want == got_col).all(), res
        assert (want == got_sql).all(), res


def test_parent_prefix_property(sample):
    lat_mu, lon_mu = sample
    child = cell_id_np(lat_mu, lon_mu, 9)
    parent = cell_id_np(lat_mu, lon_mu, 8)
    assert (parent_np(child, 1) == parent).all()
    gp = cell_id_np(lat_mu, lon_mu, 5)
    assert (parent_np(child, 4) == gp).all()


def test_distinct_cells_reasonable(sample):
    lat_mu, lon_mu = sample
    c5 = len(set(cell_id_np(lat_mu, lon_mu, 5).tolist()))
    c9 = len(set(cell_id_np(lat_mu, lon_mu, 9).tolist()))
    assert c5 < c9 <= 500
    assert c5 > 50  # 500 uniform points over a 32×32 grid


def test_k_ring():
    cx, cy = 10, 10
    ring0 = k_ring_np(cx, cy, 7, 0)
    ring1 = k_ring_np(cx, cy, 7, 1)
    assert len(ring0) == 1 and len(ring1) == 9
    assert set(ring0).issubset(set(ring1))
    # corner clamp
    assert len(k_ring_np(0, 0, 7, 1)) == 4


def test_cell_xy_bounds():
    cx, cy = cell_xy_np(np.array([to_map_unit(89.0)]), np.array([to_map_unit(179.9)]), 7)
    assert 0 <= cx[0] < 128 and 0 <= cy[0] < 128


def test_hilbert_bijective_and_contiguous():
    """Full grid at res 4: the Hilbert position is a bijection onto
    [0, 4^res) and CONSECUTIVE positions are always grid neighbors
    (|dx|+|dy| == 1) — the locality property Z-order lacks (S2's reason
    for using the Hilbert curve)."""
    import numpy as np
    from osm2garmin_spark.geo.cells import hilbert_d_np

    res = 4
    n = 1 << res
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = hilbert_d_np(xs.ravel(), ys.ravel(), res)
    assert sorted(d.tolist()) == list(range(n * n))     # bijection
    order = np.argsort(d)
    ox, oy = xs.ravel()[order], ys.ravel()[order]
    steps = np.abs(np.diff(ox)) + np.abs(np.diff(oy))
    assert np.all(steps == 1)                           # contiguity


def test_hilbert_id_from_map_units():
    import numpy as np
    from osm2garmin_spark.geo.cells import hilbert_id_np, cell_xy_np, hilbert_d_np
    from osm2garmin_spark.geo.units import to_map_unit

    lat = np.array([0.0, 45.0, -45.0, 84.9])
    lon = np.array([0.0, 90.0, -90.0, 179.9])
    mu_lat, mu_lon = to_map_unit(lat), to_map_unit(lon)
    got = hilbert_id_np(mu_lat, mu_lon, 7)
    cx, cy = cell_xy_np(mu_lat, mu_lon, 7)
    assert np.array_equal(got, hilbert_d_np(cx, cy, 7))
    assert np.all((got >= 0) & (got < 4 ** 7))
