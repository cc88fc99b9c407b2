"""Marching-squares kernel + distributed stitching properties."""

import numpy as np
import pytest

from osm2garmin_spark.operators.contours import (
    contour_levels, marching_squares, extract_contours, stitch_contours,
    allocate_contour_ids,
)


def test_levels_series():
    lv = contour_levels(12.0, 100.0, 25.0)
    assert list(lv) == [25.0, 50.0, 75.0, 100.0]
    assert len(contour_levels(5.0, 5.0, 25.0)) == 0


def test_ramp_contour_is_straight_line():
    # grid value = x → contour at level 2.5 is the vertical line x=2.5
    grid = np.tile(np.arange(8, dtype=float), (8, 1))
    lines = marching_squares(grid, 2.5)
    assert len(lines) == 1
    line = lines[0]
    assert np.allclose(line[:, 0], 2.5)
    assert len(line) >= 8 - 1


def test_disc_contour_is_closed():
    y, x = np.mgrid[0:17, 0:17]
    grid = -((x - 8.0) ** 2 + (y - 8.0) ** 2)  # peak at center
    lines = marching_squares(grid, -16.0)  # circle r=4
    assert len(lines) == 1
    line = lines[0]
    assert np.allclose(line[0], line[-1])  # closed
    r = np.sqrt((line[:, 0] - 8) ** 2 + (line[:, 1] - 8) ** 2)
    assert np.all(np.abs(r - 4.0) < 0.8)


def test_interpolation_on_level():
    rng = np.random.default_rng(5)
    grid = rng.uniform(0, 100, (12, 12))
    for level in (25.0, 50.0):
        for line in marching_squares(grid, level):
            # every vertex lies on a grid edge where interpolated value==level
            for px, py in line:
                fx, fy = px % 1.0, py % 1.0
                assert fx < 1e-9 or fy < 1e-9  # on an edge
                if fx > 1e-9:  # horizontal edge
                    ix, iy = int(px), int(round(py))
                    z = grid[iy, ix] + fx * (grid[iy, ix + 1] - grid[iy, ix])
                else:
                    ix, iy = int(round(px)), int(py)
                    if fy > 1e-9:
                        z = grid[iy, ix] + fy * (grid[iy + 1, ix] - grid[iy, ix])
                    else:
                        z = level  # exact grid point (rare)
                assert abs(z - level) < 1e-6


def test_extract_and_stitch_distributed(spark):
    from osm2garmin_spark.pipeline.synth import synth_images

    imgs = synth_images(spark, 30, partitions=3)
    frags = extract_contours(imgs, step=64.0)
    n = frags.count()
    assert n > 0
    stitched = stitch_contours(frags, max_iter=4)
    assert stitched.count() <= n
    with_ids = allocate_contour_ids(stitched)
    ids = [r["contour_id"] for r in with_ids.select("contour_id").collect()]
    assert len(set(ids)) == len(ids)
    assert min(ids) == 2_000_000_000


def test_stitch_merges_split_fragment(spark):
    import pandas as pd
    # two fragments of one polyline sharing endpoint (2.0, 2.0)
    pdf = pd.DataFrame({
        "image_id": ["a", "a"],
        "level": [10.0, 10.0],
        "frag_id": [0, 1],
        "xs": [[0.0, 1.0, 2.0], [2.0, 3.0, 4.0]],
        "ys": [[0.0, 1.0, 2.0], [2.0, 3.0, 4.0]],
        "closed": [False, False],
    })
    frags = spark.createDataFrame(pdf)
    out = stitch_contours(frags).collect()
    assert len(out) == 1
    assert out[0]["xs"] == [0.0, 1.0, 2.0, 3.0, 4.0]


@pytest.mark.parametrize("n_frags", [3, 4, 6])
def test_stitch_merges_long_chain_without_duplication(spark, n_frags):
    """A fragment must never merge as both left and right side in one round:
    chain [0,1]+[1,2]+[2,3] previously produced overlapping [0,1,2] and
    [1,2,3] (ADVICE round 1). The chain must collapse to ONE fragment whose
    vertices appear exactly once."""
    import pandas as pd
    pdf = pd.DataFrame({
        "image_id": ["a"] * n_frags,
        "level": [10.0] * n_frags,
        "frag_id": list(range(n_frags)),
        "xs": [[float(i), float(i + 1)] for i in range(n_frags)],
        "ys": [[0.0, 0.0] for _ in range(n_frags)],
        "closed": [False] * n_frags,
    })
    frags = spark.createDataFrame(pdf)
    out = stitch_contours(frags).collect()
    assert len(out) == 1
    assert out[0]["xs"] == [float(i) for i in range(n_frags + 1)]


def test_stitch_closes_ring_of_fragments(spark):
    """Four open fragments forming a square must stitch into one closed
    ring (no duplicated interior fragments, closed flag set)."""
    import pandas as pd
    corners = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]
    pdf = pd.DataFrame({
        "image_id": ["a"] * 4,
        "level": [10.0] * 4,
        "frag_id": list(range(4)),
        "xs": [[corners[i][0], corners[i + 1][0]] for i in range(4)],
        "ys": [[corners[i][1], corners[i + 1][1]] for i in range(4)],
        "closed": [False] * 4,
    })
    frags = spark.createDataFrame(pdf)
    out = stitch_contours(frags).collect()
    assert len(out) == 1
    assert out[0]["closed"]
    assert len(out[0]["xs"]) == 5
