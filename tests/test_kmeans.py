"""Integer-exact k-means: numpy reference parity (quantize, assign,
tie-break, floor-div update, empty-cluster hold), validation, and the
no-vector-explode plan shape."""

import numpy as np
import pytest
from pyspark.sql import Row

from osm2garmin_spark.functions.kmeans import (DEFAULT_SCALE, kmeans_fit,
                                               quantize_vec)


def _np_kmeans(vecs, k, iters, scale=DEFAULT_SCALE):
    """Reference implementation of the exact same integer algorithm."""
    q = np.floor(vecs.astype(np.float64) * scale).astype(np.int64)
    cents = [q[i].copy() for i in range(k)]  # ids are 0..n-1 in order

    def assign(c):
        d = np.stack([((q - ci) ** 2).sum(axis=1) for ci in c])  # k x n
        # argmin ties -> lowest cluster id (np.argmin picks first max)
        return d.argmin(axis=0)

    for _ in range(iters):
        a = assign(cents)
        nxt = []
        for ci in range(k):
            m = q[a == ci]
            if len(m) == 0:
                nxt.append(cents[ci])
            else:
                s, n = m.sum(axis=0, dtype=np.int64), len(m)
                nxt.append((s - ((s % n) + n) % n) // n)
        cents = nxt
    return assign(cents), cents


def _df(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v])
         for i, v in enumerate(vecs)])


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(0, 0.3, size=(80, 6)).astype(np.float32)
    for k, iters in ((3, 0), (3, 2), (5, 3)):
        cents, out = kmeans_fit(_df(spark, vecs), "vec_id", "embedding",
                                k=k, iters=iters, dim=6)
        got = {r.vec_id: r.cluster for r in out.collect()}
        want, want_cents = _np_kmeans(vecs, k, iters)
        assert got == {i: int(c) for i, c in enumerate(want)}, (k, iters)
        assert [list(map(int, c)) for c in want_cents] == cents


def test_negative_coords_floor_division(spark):
    # all-negative cluster sums exercise the pmod floor-div identity
    vecs = np.array([[-0.4, -0.3], [-0.5, -0.1], [-0.45, -0.2],
                     [0.4, 0.3], [0.5, 0.1]], dtype=np.float32)
    cents, out = kmeans_fit(_df(spark, vecs), "vec_id", "embedding",
                            k=2, iters=2, dim=2)
    want, want_cents = _np_kmeans(vecs, 2, 2)
    assert {r.vec_id: r.cluster for r in out.collect()} == \
        {i: int(c) for i, c in enumerate(want)}
    assert cents == [list(map(int, c)) for c in want_cents]
    assert all(c < 0 for c in cents[0])  # the negative cluster's mean


def test_empty_cluster_keeps_centroid(spark):
    # seeds 0 and 1 are IDENTICAL points, so every would-be member of
    # cluster 1 ties to cluster 0 and the tie rule drains cluster 1 to
    # zero members in round 1 — it must hold its centroid (no crash, no
    # NaN) through all later rounds
    vecs = np.array([[0.0], [0.0], [0.1]] + [[0.02]] * 5 + [[0.1]] * 5,
                    dtype=np.float32)
    cents, out = kmeans_fit(_df(spark, vecs), "vec_id", "embedding",
                            k=3, iters=3, dim=1)
    want, want_cents = _np_kmeans(vecs, 3, 3)
    assert {r.vec_id: r.cluster for r in out.collect()} == \
        {i: int(c) for i, c in enumerate(want)}
    assert cents == [list(map(int, c)) for c in want_cents]


def test_exact_tie_breaks_to_lowest_cluster(spark):
    # a point equidistant from both centroids in exact integer space
    vecs = np.array([[0.0], [0.2], [0.1]], dtype=np.float32)
    _, out = kmeans_fit(_df(spark, vecs), "vec_id", "embedding",
                        k=2, iters=0, dim=1)
    got = {r.vec_id: r.cluster for r in out.collect()}
    assert got[2] == 0  # dist to both seeds is exactly 100000^2


def test_validation(spark):
    df = _df(spark, np.zeros((3, 2), dtype=np.float32))
    with pytest.raises(ValueError, match="bad params"):
        kmeans_fit(df, "vec_id", "embedding", k=0, iters=1, dim=2)
    with pytest.raises(ValueError, match="need >= k"):
        kmeans_fit(df, "vec_id", "embedding", k=5, iters=1, dim=2)


def test_plan_no_explode_no_python(spark):
    rng = np.random.default_rng(5)
    _, out = kmeans_fit(_df(spark, rng.normal(size=(30, 4)).astype(np.float32)),
                        "vec_id", "embedding", k=2, iters=1, dim=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan       # vectors are never exploded
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan