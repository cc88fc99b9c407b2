"""Fixed-point PageRank: numpy reference parity, dangling/sink
semantics, rank-order sanity on a known graph, validation, and the
no-driver-collect plan property."""

import numpy as np
import pytest
from pyspark.sql import Row

from osm2garmin_spark.functions.pagerank import SCALE, pagerank_int


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=int(a), dst=int(b))
                                  for a, b in pairs])


def _np_pagerank(pairs, iters):
    pairs = sorted(set(pairs))
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = {}
    for a, _ in pairs:
        deg[a] = deg.get(a, 0) + 1
    r = {n: SCALE for n in nodes}
    base = (15 * SCALE) // 100
    for _ in range(iters):
        insum = {n: 0 for n in nodes}
        for a, b in pairs:
            insum[b] += r[a] // deg[a]
        r = {n: base + (85 * insum[n]) // 100 for n in nodes}
    return r


def test_matches_numpy_reference_random(spark):
    import random
    rng = random.Random(41)
    pairs = [(rng.randrange(25), rng.randrange(25)) for _ in range(120)]
    for iters in (0, 1, 3):
        got = {r.node: r.rank
               for r in pagerank_int(_edges(spark, pairs), iters).collect()}
        assert got == _np_pagerank(pairs, iters), f"iters={iters}"


def test_hub_outranks_leaves(spark):
    # star graph: everyone links to 0
    pairs = [(i, 0) for i in range(1, 8)]
    got = {r.node: r.rank
           for r in pagerank_int(_edges(spark, pairs), 2).collect()}
    assert got[0] > got[1]
    assert len({got[i] for i in range(1, 8)}) == 1  # leaves identical


def test_sink_keeps_base_rank(spark):
    # 1 -> 2; node 2 has no outlinks (dangling) and no inlinks to 1
    got = {r.node: r.rank
           for r in pagerank_int(_edges(spark, [(1, 2)]), 2).collect()}
    base = (15 * SCALE) // 100
    assert got[1] == base  # nothing points at 1 after iter 1
    assert got[2] > base


def test_duplicate_edges_collapse(spark):
    a = {r.node: r.rank
         for r in pagerank_int(_edges(spark, [(1, 2), (1, 2)]), 2).collect()}
    b = {r.node: r.rank
         for r in pagerank_int(_edges(spark, [(1, 2)]), 2).collect()}
    assert a == b


def test_validation(spark):
    with pytest.raises(ValueError, match="iters"):
        pagerank_int(_edges(spark, [(1, 2)]), -1)


def test_no_driver_collect_in_build(spark):
    # building the K-iteration plan must not launch jobs: rank state
    # stays distributed (contrast: kmeans_fit collects centroids)
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = pagerank_int(_edges(spark, [(1, 2), (2, 1)]), 3)
    after = tracker.getJobIdsForGroup(None)
    assert before == after
    assert df.count() == 2  # and it executes fine afterwards