"""True S2 cell ids (geo/s2.py): face cells, Hilbert adjacency,
encode/decode round-trip, prefix algebra, geometric edge neighbors,
numpy/UDF/SQL three-implementation agreement."""

import duckdb
import numpy as np
import pytest

from osm2garmin_spark.geo.s2 import (
    MAX_LEVEL, MAX_SIZE, cell_id_from_latlng, cell_id_from_face_ij,
    cell_center_latlng, contains, decode, edge_neighbors, level_of,
    parent_id, range_max, range_min, s2_cell_udf, s2_sql_ctes, token,
    _ij_from_pos,
)


@pytest.fixture(scope="module")
def sample():
    rng = np.random.default_rng(52)
    lat = rng.uniform(-89.9, 89.9, 600)
    lon = rng.uniform(-180.0, 180.0, 600)
    return lat, lon


def test_level0_ids_are_the_six_face_cells():
    # face centers: (lat, lon) at the middle of each cube face
    centers = [(0, 0), (0, 90), (90, 0), (0, 180), (0, -90), (-90, 0)]
    lats = np.array([c[0] for c in centers], float)
    lons = np.array([c[1] for c in centers], float)
    ids = cell_id_from_latlng(lats, lons, 0)
    assert token(ids) == ["1", "3", "5", "7", "9", "b"]
    assert (level_of(ids) == 0).all()
    # faces 4 and 5 wrap negative in the int64 view — by construction
    assert (ids[:4] > 0).all() and (ids[4:] < 0).all()


def test_hilbert_adjacency_consecutive_positions_are_grid_neighbors():
    # Any wrong lookup-table entry breaks continuity somewhere: walk the
    # first 4096 positions of the level-6 curve on every face and demand
    # each step moves to a 4-neighbor cell.
    level = 6
    pos = np.arange(4096, dtype=np.uint64)
    for face in range(6):
        i, j = _ij_from_pos(np.full(pos.shape, face), pos, level)
        d = np.abs(np.diff(i)) + np.abs(np.diff(j))
        assert (d == 1).all(), face


def test_encode_decode_roundtrip_all_levels(sample):
    lat, lon = sample
    for level in (0, 1, 5, 12, 20, MAX_LEVEL):
        ids = cell_id_from_latlng(lat, lon, level)
        assert (level_of(ids) == level).all()
        face, i, j, lvl = decode(ids)
        assert lvl == level
        again = cell_id_from_face_ij(
            face, i << (MAX_LEVEL - level), j << (MAX_LEVEL - level), level)
        assert (again == ids).all()
        # center of the decoded cell re-encodes to the same cell
        clat, clon = cell_center_latlng(ids)
        assert (cell_id_from_latlng(clat, clon, level) == ids).all()


def test_parent_prefix_and_range_containment(sample):
    lat, lon = sample
    leaf = cell_id_from_latlng(lat, lon, MAX_LEVEL)
    for level in (0, 4, 9, 17):
        p = parent_id(leaf, level)
        # parent == direct encode at the coarser level
        assert (p == cell_id_from_latlng(lat, lon, level)).all()
        assert (range_min(p) <= leaf).all() and (leaf <= range_max(p)).all()
        assert contains(p, leaf).all()
        if level >= 1:
            # flipping a PREFIX bit (inside the parent's position field)
            # moves the leaf outside the parent's range
            out = leaf ^ (1 << (2 * (MAX_LEVEL - level) + 2))
            assert not contains(p, out).any()
            # flipping a bit BELOW the parent's lsb stays contained
            stay = leaf ^ (1 << (2 * (MAX_LEVEL - level) - 1))
            assert contains(p, stay).all()
    # nested parents agree
    assert (parent_id(parent_id(leaf, 12), 5) == parent_id(leaf, 5)).all()


def test_contains_rejects_other_cells(sample):
    lat, lon = sample
    a = cell_id_from_latlng(lat, lon, 8)
    d = cell_id_from_latlng(lat, lon, 16)
    # shift queries by one full level-8 cell: never contained
    other = np.roll(d, 1)
    mask = parent_id(other, 8) != a
    assert (~contains(a, other)[mask]).all()


def test_edge_neighbors_geometric_including_cross_face(sample):
    lat, lon = sample
    for level in (2, 7):
        ids = cell_id_from_latlng(lat, lon, level)
        nbrs = edge_neighbors(ids)
        # all four neighbors are distinct, same level, and != self
        assert (level_of(nbrs.ravel()) == level).all()
        for k in range(4):
            assert (nbrs[:, k] != ids).all()
        # geometric check: nudging the cell center across each edge
        # midpoint lands in that neighbor
        face, i, j, lvl = decode(ids)
        shift = MAX_LEVEL - level
        # walk to each neighbor's center via the wrap-safe constructor
        for k, (di, dj) in enumerate([(0, -1), (1, 0), (0, 1), (-1, 0)]):
            ni = (i + di) << shift
            nj = (j + dj) << shift
            inside = (ni >= 0) & (ni < MAX_SIZE) & (nj >= 0) & (nj < MAX_SIZE)
            # in-face neighbors: independent re-encode of neighbor center
            clat, clon = cell_center_latlng(nbrs[inside, k])
            assert (cell_id_from_latlng(clat, clon, level)
                    == nbrs[inside, k]).all()
        # cross-face: every id on a face edge still has 4 valid neighbors
        on_edge = (i == 0) | (j == 0) | (i == (1 << level) - 1) \
            | (j == (1 << level) - 1)
        if on_edge.any():
            sub = nbrs[on_edge]
            clat, clon = cell_center_latlng(sub.ravel())
            assert (cell_id_from_latlng(clat, clon, level)
                    == sub.ravel()).all()


def test_edge_neighbors_by_nudged_points(sample):
    """The adjacency claim tested for real: a point 90% of the way from
    a cell's center to its reported neighbor's center (interpolated in
    XYZ, so antimeridian/pole-safe) lies well inside that neighbor and
    must ENCODE into it — a wrong-but-valid neighbor id (e.g. a wrap
    bug picking the wrong receiving face) fails this, whereas re-
    encoding the neighbor's own center cannot."""
    from osm2garmin_spark.geo.s2 import latlng_to_xyz
    lat, lon = sample
    for level in (2, 6):
        ids = cell_id_from_latlng(lat, lon, level)
        nbrs = edge_neighbors(ids)
        clat, clon = cell_center_latlng(ids)
        cx, cy, cz = latlng_to_xyz(clat, clon)
        for kdir in range(4):
            nlat, nlon = cell_center_latlng(nbrs[:, kdir])
            nx, ny, nz = latlng_to_xyz(nlat, nlon)
            t = 0.9
            px = (1 - t) * cx + t * nx
            py = (1 - t) * cy + t * ny
            pz = (1 - t) * cz + t * nz
            plat = np.degrees(np.arctan2(pz, np.hypot(px, py)))
            plon = np.degrees(np.arctan2(py, px))
            assert (cell_id_from_latlng(plat, plon, level)
                    == nbrs[:, kdir]).all(), (level, kdir)


def test_face_tiebreak_matches_canonical():
    """EXACT-magnitude ties pick the face the published
    LargestAbsComponent picks: x wins only when strictly largest, ties
    fall through toward z.  (Trig-derived coords like lon=45 deg are 1
    ulp off an exact tie, so the branch is probed on raw XYZ.)"""
    from osm2garmin_spark.geo.s2 import xyz_to_face_uv
    v = 1.0 / np.sqrt(3.0)

    def face_of(x, y, z):
        f, _, _ = xyz_to_face_uv(np.array([x]), np.array([y]),
                                 np.array([z]))
        return int(f[0])

    assert face_of(v, v, 0.0) == 1          # |x|==|y| -> y wins
    assert face_of(-v, -v, 0.0) == 4
    assert face_of(v, 0.0, v) == 2          # |x|==|z| -> z wins
    assert face_of(0.0, v, -v) == 5         # |y|==|z| -> z wins
    assert face_of(v, v, v) == 2            # all equal -> z
    assert face_of(2 * v, v, v) == 0        # strict x max -> x


def test_level_bounds_rejected():
    with pytest.raises(ValueError):
        cell_id_from_latlng([0.0], [0.0], -1)
    with pytest.raises(ValueError):
        cell_id_from_latlng([0.0], [0.0], MAX_LEVEL + 1)
    with pytest.raises(ValueError):
        s2_cell_udf(31)


def test_udf_null_coordinates_yield_null(spark):
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({
        "rid": [0, 1, 2, 3],
        "lat": [10.0, float("nan"), 20.0, None],
        "lon": [20.0, 30.0, float("nan"), 40.0]}))
    rows = df.select("rid", s2_cell_udf(9)(df.lat, df.lon).alias("c")) \
        .orderBy("rid").collect()
    assert rows[0]["c"] is not None
    assert rows[1]["c"] is None and rows[2]["c"] is None
    assert rows[3]["c"] is None


def test_poles_and_antimeridian():
    ids = cell_id_from_latlng(np.array([90.0, -90.0, 0.0, 0.0]),
                              np.array([123.0, -45.0, 180.0, -180.0]), 10)
    assert (level_of(ids) == 10).all()
    f, _, _, _ = decode(ids)
    assert f[0] == 2 and f[1] == 5          # polar faces
    assert f[2] == f[3] == 3                # ±180° is one meridian


def test_token_roundtrip_format(sample):
    lat, lon = sample
    ids = cell_id_from_latlng(lat[:16], lon[:16], 9)
    for t, v in zip(token(ids), np.asarray(ids).view(np.uint64)):
        assert format(int(v), "016x").rstrip("0") == t
        assert 1 <= len(t) <= 16


def test_udf_matches_numpy(spark, sample):
    import pandas as pd
    lat, lon = sample
    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))
    got = np.array([r["c"] for r in df.select(
        s2_cell_udf(12)(df.lat, df.lon).alias("c")).collect()])
    # collect() preserves no order guarantee across partitions on some
    # plans; compare as multisets of the deterministic single-partition df
    want = cell_id_from_latlng(lat, lon, 12)
    assert sorted(got.tolist()) == sorted(want.tolist())


def test_sql_twin_bit_identical(sample):
    lat, lon = sample
    con = duckdb.connect()
    import pandas as pd
    con.register("t", pd.DataFrame(
        {"rid": np.arange(len(lat)), "lat": lat, "lon": lon}))
    for level in (5, 12):
        chain = s2_sql_ctes("t", "rid", "lat", "lon", level)
        got = con.execute(
            f"WITH {chain} SELECT s2_cell FROM s2f ORDER BY rid"
        ).df()["s2_cell"].to_numpy()
        want = cell_id_from_latlng(lat, lon, level)
        assert (got == want).all(), level


# --- compaction (cell-union normalization twins) ------------------------------

def _cells(n=500, seed=9, level=6):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-80.0, 80.0, n)
    lon = rng.uniform(-180.0, 180.0, n)
    return cell_id_from_latlng(lat, lon, level)


def test_s2_children_partition_parent():
    from osm2garmin_spark.geo.s2 import children_ids
    ids = np.unique(_cells(50, level=4))
    ch = children_ids(ids)
    assert ch.shape == (len(ids), 4)
    assert np.all(level_of(ch.reshape(-1)) == 5)
    assert np.all(parent_id(ch.reshape(-1), 4).reshape(-1, 4) == ids[:, None])
    # the 4 children tile the parent's leaf range exactly, in order
    # (adjacent ranges differ by 2: odd id positions are the leaves,
    # the even id between two sibling ranges is never a cell id)
    assert np.all(range_min(ch[:, 0]) == range_min(ids))
    assert np.all(range_max(ch[:, 3]) == range_max(ids))
    assert np.all(range_min(ch[:, 1:]) == range_max(ch[:, :3]) + 2)


def test_s2_compact_np_fixpoint_and_coverage():
    from osm2garmin_spark.geo.s2 import children_ids, compact_np
    ids = np.unique(_cells())
    dense = children_ids(np.unique(parent_id(ids[:60], 5))).reshape(-1)
    s = np.unique(np.concatenate([ids, dense]))
    c = compact_np(s)
    assert len(c) < len(s)
    assert np.array_equal(compact_np(c), c)
    cover_count = contains(c[:, None], s[None, :]).sum(axis=0)
    assert np.all(cover_count == 1)


def test_s2_compact_matches_numpy_reference(spark):
    from osm2garmin_spark.geo.s2 import children_ids, compact_np, s2_compact
    ids = np.unique(_cells())
    dense = children_ids(np.unique(parent_id(ids[:60], 5))).reshape(-1)
    mixed = np.concatenate([ids, dense,
                            np.unique(parent_id(ids[400:], 3))])
    df = spark.createDataFrame([(int(c),) for c in mixed], "cell_id long")
    got = sorted(r["cell_id"]
                 for r in s2_compact(df, base_level=6).collect())
    assert got == compact_np(mixed).tolist()


def test_s2_uncompact_inverts_compact(spark):
    from osm2garmin_spark.geo.s2 import (children_ids, s2_compact,
                                         s2_uncompact)
    ids = np.unique(_cells(seed=21))
    s = np.unique(np.concatenate(
        [ids, children_ids(np.unique(parent_id(ids[:80], 5))).reshape(-1)]))
    df = spark.createDataFrame([(int(c),) for c in s], "cell_id long")
    back = sorted(r["cell_id"] for r in
                  s2_uncompact(s2_compact(df, base_level=6), 6).collect())
    assert back == sorted(int(c) for c in s)


def test_s2_compact_guards_finer_than_base(spark):
    from osm2garmin_spark.geo.s2 import s2_compact
    df = spark.createDataFrame([(int(c),) for c in _cells(20, level=8)],
                               "cell_id long")
    with pytest.raises(Exception, match="finer than base_level"):
        s2_compact(df, base_level=6).collect()
