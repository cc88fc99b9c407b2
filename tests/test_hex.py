"""Aperture-7 hex index (geo/hex.py): unique digit decomposition,
hierarchy algebra, k-ring/disk combinatorics, and 4-way implementation
parity (numpy / Arrow UDF / Catalyst columns / generated SQL)."""

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from osm2garmin_spark.geo.hex import (
    MAX_RES, BASE_SCALE_DEG, DIGIT_I, DIGIT_J,
    apothem_deg, attach_hex_id, basis, cell_center, children_ids,
    circumradius_deg, contains, decode, disk_offsets, hex_cell_udf,
    hex_distance, hex_id_np, hex_ij_cols, hex_ij_np, hex_parent_col,
    hex_sql_ctes, parent_id, res_of, ring_offsets, spacing_deg, t_pow,
)


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(53)
    lat = rng.uniform(-89.0, 89.0, 700)
    lon = rng.uniform(-180.0, 180.0, 700)
    return lat, lon


def test_digit_coset_is_a_bijection():
    # (i - 2j) mod 7 over the 7 child offsets hits each code exactly once
    codes = sorted((int(DIGIT_I[c] - 2 * DIGIT_J[c]) % 7) for c in range(7))
    assert codes == list(range(7))
    # and the table is self-consistent: code c's offset has coset c
    for c in range(7):
        assert (DIGIT_I[c] - 2 * DIGIT_J[c]) % 7 == c


def test_parent_decomposition_unique_and_exact():
    # every res-r cell decomposes into (parent, digit) and recomposes
    rng = np.random.default_rng(7)
    i = rng.integers(-10000, 10000, 500)
    j = rng.integers(-10000, 10000, 500)
    c = (i - 2 * j) % 7
    i2, j2 = i - DIGIT_I[c], j - DIGIT_J[c]
    assert ((3 * i2 + j2) % 7 == 0).all() and ((-i2 + 2 * j2) % 7 == 0).all()
    ip, jp = (3 * i2 + j2) // 7, (-i2 + 2 * j2) // 7
    # recompose: child = parent-center-in-child-coords + digit offset
    assert (2 * ip - jp + DIGIT_I[c] == i).all()
    assert (ip + 3 * jp + DIGIT_J[c] == j).all()


def test_encode_roundtrip_and_res(sample):
    lat, lon = sample
    for res in (0, 3, 5, 9, MAX_RES):
        ids = hex_id_np(lat, lon, res)
        assert (res_of(ids) == res).all()
        i, j, r = decode(ids)
        assert r == res
        assert (hex_ij_np(lat, lon, res)[0] == i).all()
        assert (hex_ij_np(lat, lon, res)[1] == j).all()
        # center re-encodes to the same cell
        clat, clon = cell_center(ids)
        assert (hex_id_np(clat, clon, res) == ids).all()


def test_parent_algebra_and_containment(sample):
    lat, lon = sample
    fine = hex_id_np(lat, lon, 9)
    for pres in (0, 2, 5, 8):
        p = parent_id(fine, pres)
        assert (res_of(p) == pres).all()
        assert contains(p, fine).all()
        assert contains(p, p).all()
        # nested truncation composes
        assert (parent_id(parent_id(fine, 7), pres if pres <= 7 else 7)
                == parent_id(fine, min(pres, 7))).all()
        # a different parent never contains
        other = np.roll(fine, 1)
        mask = parent_id(other, pres) != p
        assert (~contains(p, other)[mask]).all()
    # child ids enumerate back to the parent
    par = hex_id_np(lat[:50], lon[:50], 4)
    ch = children_ids(par)
    assert ch.shape == (50, 7)
    for col in range(7):
        assert (parent_id(ch[:, col], 4) == par).all()
        assert contains(par, ch[:, col]).all()


def test_hierarchy_is_h3_style_approximate(sample):
    """Like H3: digit truncation is the authoritative hierarchy; a point
    near a parent boundary may DIRECT-encode at the coarse res into a
    different cell (children stick out of parents), but descendant
    CENTERS stay within the geometric-series offset bound
    sum_k spacing(k) < spacing(parent)/(sqrt(7)-1) of the ancestor
    center (one-step child centers are strictly inside the parent:
    offset = spacing(child) = 0.378*spacing < apothem = 0.5*spacing)."""
    lat, lon = sample
    fine = hex_id_np(lat, lon, 9)
    trunc = parent_id(fine, 5)
    direct = hex_id_np(lat, lon, 5)
    agree = (trunc == direct).mean()
    assert agree > 0.7            # mostly identical...
    # ...and the disagreeing points are an expected fact of aperture-7
    # (exactly the H3 behavior); child centers are ALWAYS contained:
    clat, clon = cell_center(fine)
    assert (parent_id(fine, 5) == parent_id(hex_id_np(clat, clon, 9), 5)).all()
    # one-step child centers are strictly inside their parent
    mid = parent_id(fine, 8)
    mlat, mlon = cell_center(mid)
    clat8, clon8 = cell_center(parent_id(fine, 9))
    d1 = np.hypot(clat8 - mlat, clon8 - mlon)
    assert (d1 < apothem_deg(8) * (1 + 1e-9)).all()
    # multi-step: geometric-series bound on the accumulated offset
    plat, plon = cell_center(trunc)
    d = np.hypot(clat - plat, clon - plon)
    bound = spacing_deg(5) / (np.sqrt(7.0) - 1.0)
    assert (d < bound * (1 + 1e-9)).all()


def test_disk_and_ring_combinatorics():
    for k in (0, 1, 2, 5):
        d = disk_offsets(k)
        assert len(d) == 1 + 3 * k * (k + 1)
        assert (hex_distance(d[:, 0], d[:, 1]) <= k).all()
        r = ring_offsets(k)
        assert len(r) == (1 if k == 0 else 6 * k)
        assert (hex_distance(r[:, 0], r[:, 1]) == k).all()
    # disk(k) = union of rings 0..k, disjoint
    dk = {tuple(x) for x in disk_offsets(3)}
    rs = [{tuple(x) for x in ring_offsets(k)} for k in range(4)]
    assert dk == set().union(*rs)
    assert sum(len(s) for s in rs) == len(dk)


def test_min_center_distance_at_hex_distance_m():
    """The kNN margin rests on: centers at hex distance m are >=
    m * sqrt(3) * apothem apart (tight along the diagonal)."""
    m0 = basis(6)
    a = apothem_deg(6)
    for m in (1, 2, 3, 4):
        offs = ring_offsets(m).astype(np.float64)
        x = offs[:, 0] * m0[0, 0] + offs[:, 1] * m0[0, 1]
        y = offs[:, 0] * m0[1, 0] + offs[:, 1] * m0[1, 1]
        dist = np.hypot(x, y)
        bound = m * np.sqrt(3.0) * a
        assert (dist >= bound * (1 - 1e-12)).all()
        if m % 2 == 0:
            # tight exactly on the (1,1)-diagonal cells (even rings only)
            assert dist.min() == pytest.approx(bound, rel=1e-9)


def test_spacing_shrinks_by_sqrt7_and_basis_consistent():
    for res in (0, 1, 5, 9):
        assert spacing_deg(res + 1) == pytest.approx(
            spacing_deg(res) / np.sqrt(7.0), rel=1e-12)
        m = basis(res)
        # |A| == |B| == spacing, 60 degrees apart
        na = np.hypot(m[0, 0], m[1, 0])
        nb = np.hypot(m[0, 1], m[1, 1])
        assert na == pytest.approx(spacing_deg(res), rel=1e-9)
        assert nb == pytest.approx(spacing_deg(res), rel=1e-9)
        cosang = (m[0, 0] * m[0, 1] + m[1, 0] * m[1, 1]) / (na * nb)
        assert cosang == pytest.approx(0.5, abs=1e-9)
        assert circumradius_deg(res) == pytest.approx(
            spacing_deg(res) / np.sqrt(3.0), rel=1e-12)


def test_t_pow_negative_res_inverse():
    # T^r @ T^-r == I (float) — the negative-res (coarser than base)
    # lattice the kNN escalation uses
    for r in (1, 4, 8):
        prod = t_pow(r) @ t_pow(-r)
        assert np.allclose(prod, np.eye(2), atol=1e-9)


def test_catalyst_cols_match_numpy(spark, sample):
    import pandas as pd
    lat, lon = sample
    df = spark.createDataFrame(pd.DataFrame(
        {"rid": np.arange(len(lat)), "lat": lat, "lon": lon}))
    for res in (5, 9, -2):
        i_c, j_c = hex_ij_cols(F.col("lat"), F.col("lon"), res)
        rows = df.select("rid", i_c.alias("i"), j_c.alias("j")) \
            .orderBy("rid").collect()
        gi = np.array([r["i"] for r in rows])
        gj = np.array([r["j"] for r in rows])
        wi, wj = hex_ij_np(lat, lon, res)
        assert (gi == wi).all() and (gj == wj).all(), res


def test_four_way_id_parity(spark, sample):
    """numpy == pandas UDF == Catalyst expression == DuckDB SQL."""
    import pandas as pd
    lat, lon = sample
    want9 = hex_id_np(lat, lon, 9)
    want5 = hex_id_np(lat, lon, 5)

    pdf = pd.DataFrame({"rid": np.arange(len(lat)), "lat": lat, "lon": lon})
    df = spark.createDataFrame(pdf)
    df = df.withColumn("u9", hex_cell_udf(9)(F.col("lat"), F.col("lon")))
    df = attach_hex_id(df, F.col("lat"), F.col("lon"), 9, "c9")
    df = attach_hex_id(df, F.col("lat"), F.col("lon"), 5, "c5")
    rows = (df.withColumn("p5", hex_parent_col(F.col("c9"), 9, 5))
              .orderBy("rid").collect())
    u9 = np.array([r["u9"] for r in rows])
    c9 = np.array([r["c9"] for r in rows])
    c5 = np.array([r["c5"] for r in rows])
    p5 = np.array([r["p5"] for r in rows])
    assert (u9 == want9).all()
    assert (c9 == want9).all()
    assert (c5 == want5).all()
    assert (p5 == parent_id(want9, 5)).all()

    con = duckdb.connect()
    con.register("t", pdf)
    chain = hex_sql_ctes("t", "rid", "lat", "lon", 9, out_levels=[9, 5])
    got = con.execute(
        f"WITH {chain} SELECT hex_r9, hex_r5 FROM hexf ORDER BY rid").df()
    assert (got["hex_r9"].to_numpy() == want9).all()
    # the SQL level-5 id comes from the SAME digit walk => equals the
    # TRUNCATION parent (the id algebra), not the direct coarse encode
    assert (got["hex_r5"].to_numpy() == parent_id(want9, 5)).all()


def test_extreme_coordinates():
    lat = np.array([90.0, -90.0, 0.0, 0.0, 89.999999, -89.999999])
    lon = np.array([180.0, -180.0, 180.0, -180.0, 179.999999, -179.999999])
    for res in (0, 5, MAX_RES):
        ids = hex_id_np(lat, lon, res)
        assert (res_of(ids) == res).all()
        i, j, _ = decode(ids)
        wi, wj = hex_ij_np(lat, lon, res)
        assert (i == wi).all() and (j == wj).all()


def test_cover_rect_complete_and_tight():
    from osm2garmin_spark.geo.hex import cover_rect, spacing_deg
    rng = np.random.default_rng(54)
    lat_lo, lat_hi, lon_lo, lon_hi = 12.5, 38.0, -20.0, 31.0
    for res in (3, 5):
        cov = {tuple(c) for c in cover_rect(lat_lo, lat_hi,
                                            lon_lo, lon_hi, res)}
        # completeness: every point in the rect lands in a covered cell
        lat = rng.uniform(lat_lo, lat_hi, 3000)
        lon = rng.uniform(lon_lo, lon_hi, 3000)
        i, j = hex_ij_np(lat, lon, res)
        assert all((int(a), int(b)) in cov for a, b in zip(i, j))
        # rect corners and edges included
        ce_lat = np.array([lat_lo, lat_lo, lat_hi, lat_hi, lat_lo])
        ce_lon = np.array([lon_lo, lon_hi, lon_lo, lon_hi, lon_hi])
        ic, jc = hex_ij_np(ce_lat, ce_lon, res)
        assert all((int(a), int(b)) in cov for a, b in zip(ic, jc))
        # tightness: covered-cell count within a small factor of
        # rect area / cell area (the circumradius rim is the overhead)
        cell_area = 2 * np.sqrt(3.0) * (spacing_deg(res) / 2.0) ** 2
        expect = (lat_hi - lat_lo) * (lon_hi - lon_lo) / cell_area
        assert expect * 0.9 <= len(cov) <= expect * 2.0


def test_cover_rect_guards():
    from osm2garmin_spark.geo.hex import cover_rect
    with pytest.raises(ValueError):
        cover_rect(10, 5, 0, 1, 4)              # empty rect
    with pytest.raises(ValueError):
        cover_rect(-80, 80, -170, 170, 12)      # way too fine: cell cap


def test_res_bounds_rejected():
    with pytest.raises(ValueError):
        hex_id_np([0.0], [0.0], MAX_RES + 1)
    with pytest.raises(ValueError):
        hex_id_np([0.0], [0.0], -1)
    with pytest.raises(ValueError):
        parent_id(hex_id_np([0.0], [0.0], 3), 5)
    with pytest.raises(ValueError):
        hex_cell_udf(MAX_RES + 1)


def test_udf_null_coordinates_yield_null(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "rid": [0, 1, 2],
        "lat": [10.0, float("nan"), None],
        "lon": [20.0, 30.0, 40.0]}))
    rows = df.select("rid", hex_cell_udf(7)(df.lat, df.lon).alias("c")) \
        .orderBy("rid").collect()
    assert rows[0]["c"] is not None
    assert rows[1]["c"] is None and rows[2]["c"] is None


# --- compaction (compactCells / uncompactCells twins) ------------------------

def _random_cells(n=400, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-80.0, 80.0, n)
    lon = rng.uniform(-170.0, 170.0, n)
    return hex_id_np(lat, lon, 3)


def test_compact_np_fixpoint_and_coverage():
    from osm2garmin_spark.geo.hex import compact_np
    ids = _random_cells()
    # dense patch: all children of a few parents, so promotion fires
    parents = np.unique(parent_id(ids[:50], 2))
    dense = children_ids(parents).reshape(-1)
    s = np.unique(np.concatenate([ids, dense]))
    c = compact_np(s)
    assert len(c) < len(s)                        # something promoted
    assert np.array_equal(compact_np(c), c)       # idempotent (minimal)
    # exact coverage: every input cell is contained in exactly ONE output
    cover_count = contains(c[:, None], s[None, :]).sum(axis=0)
    assert np.all(cover_count == 1)


def test_hex_compact_matches_numpy_reference(spark):
    from osm2garmin_spark.geo.hex import compact_np, hex_compact
    ids = _random_cells()
    parents = np.unique(parent_id(ids[:50], 2))
    dense = children_ids(parents).reshape(-1)
    s = np.unique(np.concatenate([ids, dense]))
    # mixed-res input: sprinkle some coarse cells too
    mixed = np.concatenate([s, np.unique(parent_id(ids[300:], 1))])
    df = spark.createDataFrame([(int(c),) for c in mixed], "cell_id long")
    got = sorted(r["cell_id"]
                 for r in hex_compact(df, base_res=3).collect())
    assert got == compact_np(mixed).tolist()


def test_hex_uncompact_inverts_compact(spark):
    from osm2garmin_spark.geo.hex import (compact_np, hex_compact,
                                          hex_uncompact)
    ids = _random_cells(seed=11)
    parents = np.unique(parent_id(ids[:80], 2))
    s = np.unique(np.concatenate([ids, children_ids(parents).reshape(-1)]))
    df = spark.createDataFrame([(int(c),) for c in s], "cell_id long")
    back = sorted(r["cell_id"] for r in
                  hex_uncompact(hex_compact(df, base_res=3), 3).collect())
    assert back == sorted(int(c) for c in s)


def test_hex_compact_guards_finer_than_base(spark):
    from osm2garmin_spark.geo.hex import hex_compact
    ids = _random_cells()
    df = spark.createDataFrame([(int(c),) for c in ids], "cell_id long")
    with pytest.raises(Exception, match="finer than base_res"):
        hex_compact(df, base_res=2).collect()
