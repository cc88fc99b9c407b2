"""kNN: grid-accelerated path must equal the exact broadcast path,
including the exact-boundary-tie case (ADVICE round 1, item 4)."""

import numpy as np
import pandas as pd

from osm2garmin_spark.operators.knn import knn_broadcast, knn_grid


def test_grid_matches_broadcast_random(spark):
    rng = np.random.default_rng(7)
    q = pd.DataFrame({"q_id": np.arange(200),
                      "q_lat": rng.uniform(-10, 10, 200),
                      "q_lon": rng.uniform(-10, 10, 200)})
    nb = pd.DataFrame({"n_id": np.arange(500),
                       "n_lat": rng.uniform(-10, 10, 500),
                       "n_lon": rng.uniform(-10, 10, 500)})
    qd, nd = spark.createDataFrame(q), spark.createDataFrame(nb)
    got = sorted(map(tuple, knn_grid(qd, nd, 3, cell_deg=2.0).collect()))
    want = sorted(map(tuple, knn_broadcast(qd, nd, 3).collect()))
    assert got == want


def test_boundary_tie_escalates(spark):
    """Query (0.75, 0.5) with cell 1.0: guaranteed-covered radius is
    exactly 1.25. Neighbor 1 sits exactly ON the 3x3 block boundary at
    (2.0, 0.5) (outside the candidate ring, d^2 = 1.5625); neighbor 2 is
    inside the ring at (1.75, 1.25) with the SAME d^2. The k-th distance
    ties margin^2, so completeness must NOT be assumed: tie-break by n_id
    says neighbor 1 wins, which only the escalation path can see."""
    q = spark.createDataFrame(pd.DataFrame(
        {"q_id": [0], "q_lat": [0.75], "q_lon": [0.5]}))
    nb = spark.createDataFrame(pd.DataFrame(
        {"n_id": [1, 2], "n_lat": [2.0, 1.75], "n_lon": [0.5, 1.25]}))
    out = knn_grid(q, nb, 1, cell_deg=1.0).collect()
    assert len(out) == 1
    assert out[0]["n_id"] == 1


def test_knn_grid_empty_neighbors(spark):
    import pandas as pd
    q = spark.createDataFrame(pd.DataFrame(
        {"q_id": [0, 1], "q_lat": [0.0, 1.0], "q_lon": [0.0, 1.0]}))
    nb = spark.createDataFrame([], "n_id long, n_lat double, n_lon double")
    assert knn_grid(q, nb, 3).count() == 0


def test_knn_fewer_neighbors_than_k(spark):
    import pandas as pd
    q = spark.createDataFrame(pd.DataFrame(
        {"q_id": [0], "q_lat": [0.0], "q_lon": [0.0]}))
    nb = spark.createDataFrame(pd.DataFrame(
        {"n_id": [7, 8], "n_lat": [1.0, 2.0], "n_lon": [0.0, 0.0]}))
    out = sorted((r["n_id"], r["rnk"]) for r in knn_grid(q, nb, 5).collect())
    assert out == [(7, 1), (8, 2)]
