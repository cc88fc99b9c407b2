"""Batched effective-area polyline decimation (operators/simplify.py):
numpy-reference parity, endpoint/subsequence invariants, collinear
removal, one-Exchange-for-K-passes plan pin."""

import io
import contextlib

import numpy as np
import pytest

from pyspark.sql import functions as F

from osm2garmin_spark.operators.simplify import (
    decimate_pass, simplify_polylines,
)


def _ref_pass(xs, ys, eps2):
    """Scalar reference of one batched pass over one way."""
    n = len(xs)
    keep = []
    for i in range(n):
        if i == 0 or i == n - 1:
            keep.append(i)
            continue
        a2 = abs(xs[i - 1] * (ys[i] - ys[i + 1])
                 + xs[i] * (ys[i + 1] - ys[i - 1])
                 + xs[i + 1] * (ys[i - 1] - ys[i]))
        if a2 >= eps2:
            keep.append(i)
    return [xs[i] for i in keep], [ys[i] for i in keep]


def _ref_simplify(xs, ys, eps2, passes):
    for _ in range(passes):
        xs, ys = _ref_pass(xs, ys, eps2)
    return list(zip(xs, ys))


def _ways_df(spark, rng, n_ways=20, n_pts=40):
    rows = []
    ways = {}
    for w in range(n_ways):
        xs = rng.integers(-2_000_000, 2_000_000, n_pts).tolist()
        ys = rng.integers(-1_000_000, 1_000_000, n_pts).tolist()
        ways[w] = (xs, ys)
        rows += [(w, i, int(x), int(y))
                 for i, (x, y) in enumerate(zip(xs, ys))]
    df = spark.createDataFrame(
        rows, "way_id long, seq long, lon_mu long, lat_mu long")
    return df, ways


def test_matches_scalar_reference(spark):
    rng = np.random.default_rng(23)
    df, ways = _ways_df(spark, rng)
    eps2, passes = 10**12, 3
    got = simplify_polylines(df, eps2, passes=passes).collect()
    by_way = {}
    for r in sorted(got, key=lambda r: (r["way_id"], r["seq"])):
        by_way.setdefault(r["way_id"], []).append((r["lon_mu"], r["lat_mu"]))
    for w, (xs, ys) in ways.items():
        assert by_way[w] == _ref_simplify(xs, ys, eps2, passes), w


def test_endpoints_and_subsequence_invariants(spark):
    rng = np.random.default_rng(7)
    df, ways = _ways_df(spark, rng, n_ways=10, n_pts=30)
    out = simplify_polylines(df, 5 * 10**11, passes=2).collect()
    by_way = {}
    for r in out:
        by_way.setdefault(r["way_id"], []).append(r["seq"])
    for w in ways:
        seqs = sorted(by_way[w])
        assert seqs[0] == 0 and seqs[-1] == 29          # endpoints survive
        assert len(seqs) == len(set(seqs))              # subsequence
        assert all(0 <= s <= 29 for s in seqs)


def test_collinear_interior_drops_in_one_pass(spark):
    # straight segment: every interior vertex has zero area
    rows = [(0, i, i * 1000, i * 500) for i in range(12)]
    df = spark.createDataFrame(
        rows, "way_id long, seq long, lon_mu long, lat_mu long")
    out = decimate_pass(df, eps2=1).collect()
    assert sorted(r["seq"] for r in out) == [0, 11]


def test_passes_validation():
    import pyspark.sql  # noqa: F401  (spark-free arg check)
    with pytest.raises(ValueError, match="passes"):
        simplify_polylines(None, 1, passes=0)


def test_k_passes_cost_one_exchange(spark):
    df, _ = _ways_df(spark, np.random.default_rng(1), n_ways=4, n_pts=20)
    out = simplify_polylines(df, 10**12, passes=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    import re
    exchange_ids = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(exchange_ids) == 1, plan
    sort_ids = set(re.findall(r"\((\d+)\) Sort", plan))
    assert len(sort_ids) == 1, plan