"""Property-based tests (hypothesis) for the pure kernels: the codecs and
integer geo math must hold for ALL inputs, not just the fixtures."""

import numpy as np
from hypothesis import given, settings, strategies as st

from osm2garmin_spark.operators.png import decode_png, encode_png
from osm2garmin_spark.geo.units import to_map_unit, to_degrees
from osm2garmin_spark.operators.contours import (
    adaptive_interval, contour_levels, check_contours_density)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2 ** 32 - 1))
def test_png_roundtrip_any_image(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-85.0, max_value=85.0,
                 allow_nan=False, allow_infinity=False))
def test_map_unit_degree_roundtrip(deg):
    """to_degrees(to_map_unit(d)) stays within one map unit of d
    (map unit ≈ 2.1e-5 deg) and re-encodes to the same integer."""
    mu = int(to_map_unit(deg))
    back = to_degrees(mu)
    assert abs(back - deg) <= 360.0 / (1 << 24) + 1e-9
    assert int(to_map_unit(back)) == mu


@settings(max_examples=100, deadline=None)
@given(st.floats(0.0, 5000.0, allow_nan=False))
def test_adaptive_interval_reference_contract(extent):
    """The interval is positive, comes from the reference's closed set
    {1,2,5,10,25,50,100}, and the standard intervals are only used when
    the extent fits them at least twice (otherwise the 10/5/2/1 fallback
    ladder applies — which the reference allows to exceed extent/2, e.g.
    extent 16 → 10)."""
    iv = adaptive_interval(extent)
    assert iv in (1.0, 2.0, 5.0, 10.0, 25.0, 50.0, 100.0)
    if iv in (25.0, 50.0, 100.0):
        assert extent >= 2 * iv


@settings(max_examples=100, deadline=None)
@given(st.floats(-1e4, 1e4, allow_nan=False), st.floats(0.1, 500.0),
       st.floats(1.0, 200.0))
def test_contour_levels_inside_range(zmin, span, step):
    zmax = zmin + span
    lv = contour_levels(zmin, zmax, step)
    assert all(zmin <= v <= zmax + 1e-6 for v in lv)
    if len(lv) >= 2:
        diffs = np.diff(lv)
        assert np.allclose(diffs, step)


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2 ** 32 - 1), st.integers(2, 30))
def test_density_prune_conserves_or_shrinks_points(seed, n_contours):
    """check_contours_density never invents points: the multiset of output
    vertices is a subset of the input's, and under an infinite budget the
    input passes through untouched."""
    rng = np.random.default_rng(seed)
    cs = []
    for i in range(n_contours):
        npts = int(rng.integers(2, 12))
        pts = [(float(rng.uniform(0, 20)), float(rng.uniform(0, 20)))
               for _ in range(npts)]
        cs.append({"z": float(rng.choice([25, 50, 75, 100, 125])),
                   "pts": pts, "closed": False})
    orig = sorted((p for c in cs for p in c["pts"]))

    untouched = check_contours_density(
        [dict(c, pts=list(c["pts"])) for c in cs], budget=10 ** 9)
    assert sorted(p for c in untouched for p in c["pts"]) == orig

    pruned = check_contours_density(
        [dict(c, pts=list(c["pts"])) for c in cs], budget=1)
    out_pts = sorted(p for c in pruned for p in c["pts"])
    it = iter(orig)
    assert all(any(p == q for q in it) for p in out_pts)  # subsequence test
