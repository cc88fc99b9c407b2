"""Unit tests for the geo kernel.

Rounding vectors ported verbatim from the reference test suite
(libraries/splitter/test/uk/me/parabola/splitter/TestRounding.java:22-93).
"""

import numpy as np
import pytest

from osm2garmin_spark.geo.units import (
    round_down, round_up, round_nearest, to_map_unit, to_degrees,
)
from osm2garmin_spark.geo.area import Area, round_area


def _i32(x):
    """interpret a hex literal as Java int32"""
    return x - (1 << 32) if x >= (1 << 31) else x


def test_positive_rounding_down():
    for i in range(0, 50000, 19):
        assert round_down(i, 11) == i // 2048 * 2048
    assert round_down(0x1D5842, 11) == 0x1D5800
    assert round_down(0x2399A, 11) == 0x23800
    assert round_down(0x23800, 11) == 0x23800
    assert round_down(0x237F0, 11) == 0x23000


def test_positive_rounding_up():
    for i in range(0, 50000, 19):
        assert round_up(i, 11) == (i + 2047) // 2048 * 2048
    assert round_up(0x1E7FAA, 11) == 0x1E8000
    assert round_up(0x1E7801, 11) == 0x1E8000
    assert round_up(0x1E7800, 11) == 0x1E7800
    assert round_up(0x1E70AA, 11) == 0x1E7800
    assert round_up(0x1E77FF, 11) == 0x1E7800


def test_negative_rounding_down():
    assert round_down(_i32(0xFFCBBA86), 11) == _i32(0xFFCBB800)
    assert round_down(_i32(0xFFCBBFFF), 11) == _i32(0xFFCBB800)
    assert round_down(_i32(0xFFCBB801), 11) == _i32(0xFFCBB800)
    assert round_down(_i32(0xFFCBB7FF), 11) == _i32(0xFFCBB000)


def test_negative_rounding_up():
    assert round_up(_i32(0xFFCBBA86), 11) == _i32(0xFFCBC000)
    assert round_up(_i32(0xFFCBBFFF), 11) == _i32(0xFFCBC000)
    assert round_up(_i32(0xFFCBB801), 11) == _i32(0xFFCBC000)
    assert round_up(_i32(0xFFCBB7FF), 11) == _i32(0xFFCBB800)
    assert round_up(-(1 << 31) + 1234, 11) == _i32(0x80000800)


def test_round_nearest():
    cases = [(7, 8), (6, 8), (5, 4), (4, 4), (3, 4), (2, 4), (1, 0), (0, 0),
             (-1, 0), (-2, 0), (-3, -4), (-4, -4), (-5, -4)]
    for val, want in cases:
        assert round_nearest(val, 2) == want


def test_rounding_vectorized_matches_scalar():
    vals = np.array([-(1 << 31) + 1234, -100000, -2048, -1, 0, 1, 2047, 2048,
                     50000, 0x1D5842], dtype=np.int64)
    for shift in (2, 11):
        rd = round_down(vals, shift)
        ru = round_up(vals, shift)
        for i, v in enumerate(vals):
            assert rd[i] == round_down(int(v), shift)
            assert ru[i] == round_up(int(v), shift)


def test_map_unit_codec():
    # Utils.java: (int)((l ± 1e-6) * 2^24 / 360)
    assert to_map_unit(0.0) == 0
    assert to_map_unit(180.0) == int((180.0 + 1e-6) * (1 << 24) / 360)
    assert to_map_unit(-180.0) == int((-180.0 - 1e-6) * (1 << 24) / 360)
    assert to_map_unit(1.0) == 46603
    assert to_map_unit(-1.0) == -46603
    # roundtrip within half a unit
    for deg in (-85.0, -1.23456, 0.5, 42.42, 84.999):
        mu = to_map_unit(deg)
        assert abs(to_degrees(mu) - deg) < 1.0 / 46603 + 1e-9
    arr = to_map_unit(np.array([1.0, -1.0, 0.0]))
    assert list(arr) == [46603, -46603, 0]


def test_area_semantics():
    a = Area(10, 20, 10, 20)  # degenerate → widened by 1
    assert a.max_lat == 11 and a.max_long == 21
    b = Area(0, 0, 100, 200)
    assert b.contains(0, 0) and b.contains(100, 200)  # closed edges
    assert not b.contains(101, 0) and not b.contains(0, 201)
    u = b.add(Area(-5, -5, 50, 50))
    assert (u.min_lat, u.min_long, u.max_lat, u.max_long) == (-5, -5, 100, 200)


def test_round_area_alignment():
    # edges aligned to 2^shift; sizes multiples of 2^(shift+1)
    for res in (13, 12):
        shift = 24 - res
        align = 1 << shift
        a = round_area(Area(-123456, -234567, 345678, 456789), res)
        assert a.min_lat % align == 0 and a.max_lat % align == 0
        assert a.min_long % align == 0 and a.max_long % align == 0
        assert a.width % (2 * align) == 0
        assert a.height % (2 * align) == 0


def test_round_area_polar_clamp():
    # clamped to ±85° before rounding; the even-parity fix may push one edge
    # out by a single extra alignment unit (RoundingUtils.java:72-86)
    a = round_area(Area(to_map_unit(-89.0), 0, to_map_unit(89.0), 100000), 13)
    assert a.max_lat <= round_up(to_map_unit(85.0), 11) + (1 << 11)
    assert a.min_lat >= round_up(to_map_unit(-85.0), 11) - 2 * (1 << 11)
