"""Deterministic sampling: reshard invariance, nested rates, per-stratum
exactness, rate accuracy, and the WindowGroupLimit plan shape."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from osm2garmin_spark.functions.sampling import (
    M31, balanced_sample, det_hash, hash_sample, stratified_rate_sample)


def _events(spark, n=5000, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).cast("string").alias("etype"))


def test_hash_sample_reshard_invariant(spark):
    df = _events(spark)
    a = {r.event_id for r in hash_sample(df, "event_id", 0.1, 5).collect()}
    b = {r.event_id for r in hash_sample(
        df.repartition(13).sortWithinPartitions(F.desc("event_id")),
        "event_id", 0.1, 5).collect()}
    assert a == b and len(a) > 0


def test_hash_sample_nested_rates(spark):
    df = _events(spark)
    small = {r.event_id for r in hash_sample(df, "event_id", 0.05, 1).collect()}
    big = {r.event_id for r in hash_sample(df, "event_id", 0.2, 1).collect()}
    assert small < big


def test_hash_sample_rate_accuracy_and_seed_independence(spark):
    df = _events(spark, n=20000)
    n1 = hash_sample(df, "event_id", 0.1, seed=1).count()
    n2 = hash_sample(df, "event_id", 0.1, seed=2).count()
    for n in (n1, n2):
        assert abs(n - 2000) < 200, n      # within ~5 sigma
    s1 = {r.event_id for r in hash_sample(df, "event_id", 0.1, 1).collect()}
    s2 = {r.event_id for r in hash_sample(df, "event_id", 0.1, 2).collect()}
    overlap = len(s1 & s2) / len(s1)
    assert overlap < 0.25                  # different seeds ~independent


def test_det_hash_spreads_sequential_ids(spark):
    """Sequential keys must not land on a coarse lattice: bucket the hash
    into 16 ranges, every bucket populated within 3x of uniform."""
    df = _events(spark, n=16000)
    counts = (df.select((det_hash(F.col("event_id"), 0)
                         / F.lit(M31 // 16)).cast("int").alias("b"))
              .groupBy("b").count().collect())
    by_bucket = {r.b: r["count"] for r in counts}
    assert len(by_bucket) == 16
    assert max(by_bucket.values()) < 3 * 1000
    assert min(by_bucket.values()) > 1000 // 3


def test_stratified_rates_apply_per_stratum(spark):
    df = _events(spark, n=14000)  # 2000 per etype
    out = stratified_rate_sample(df, "etype", "event_id",
                                 {"0": 1.0, "1": 0.0}, default_rate=0.5,
                                 seed=9)
    by = {r.etype: r["count"]
          for r in out.groupBy("etype").count().collect()}
    assert by.get("0") == 2000
    assert "1" not in by
    for t in ("2", "3", "4", "5", "6"):
        assert abs(by[t] - 1000) < 150


def test_balanced_sample_exact_k_and_deterministic(spark):
    df = _events(spark, n=7000)
    out = balanced_sample(df, "etype", "event_id", k=50, seed=2)
    by = {r.etype: r["count"]
          for r in out.groupBy("etype").count().collect()}
    assert set(by.values()) == {50}
    again = balanced_sample(df.repartition(17), "etype", "event_id",
                            k=50, seed=2)
    assert ({(r.event_id, r.etype) for r in out.collect()}
            == {(r.event_id, r.etype) for r in again.collect()})


def test_balanced_sample_small_stratum_keeps_all(spark):
    df = _events(spark, n=21)     # 3 rows per etype
    out = balanced_sample(df, "etype", "event_id", k=50)
    assert out.count() == 21


def test_bad_args_raise(spark):
    df = _events(spark, n=10)
    with pytest.raises(ValueError, match="rate"):
        hash_sample(df, "event_id", 1.5)
    with pytest.raises(ValueError, match="k must"):
        balanced_sample(df, "etype", "event_id", k=0)


def test_balanced_sample_plan_window_group_limit(spark):
    """Scale claim: rank<=k lowers to WindowGroupLimit (map-side top-k
    heap) — whole strata are never sorted."""
    df = _events(spark, n=1000)
    out = balanced_sample(df, "etype", "event_id", k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert "WindowGroupLimit" in buf.getvalue()
