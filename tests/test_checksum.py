"""Table checksums: shuffle invariance, single-row sensitivity, the
documented xor duplicate-cancellation (and mod_sum catching it), NULL
vs empty-string distinction, validation, partial-agg plan shape."""

import pytest
from pyspark.sql import Row, functions as F

from osm2garmin_spark.functions.checksum import table_checksum


def _df(spark, rows):
    return spark.createDataFrame(
        [Row(a=int(x), b=str(y)) for x, y in rows])


def _sums(df):
    return sorted((r.bucket, r.n_rows, r.xor_sum, r.mod_sum)
                  for r in df.collect())


def test_order_and_partitioning_invariant(spark):
    rows = [(i, f"v{i % 13}") for i in range(500)]
    base = _sums(table_checksum(_df(spark, rows), ["a", "b"], 8))
    shuffled = _df(spark, list(reversed(rows))).repartition(7)
    assert _sums(table_checksum(shuffled, ["a", "b"], 8)) == base


def test_single_value_change_detected_and_localized(spark):
    rows = [(i, "x") for i in range(200)]
    base = _sums(table_checksum(_df(spark, rows), ["a", "b"], 8))
    rows2 = list(rows)
    rows2[137] = (137, "y")
    changed = _sums(table_checksum(_df(spark, rows2), ["a", "b"], 8))
    assert changed != base
    diff = [i for i, (b, c) in enumerate(zip(base, changed)) if b != c]
    assert 1 <= len(diff) <= 2  # the old row's bucket and/or the new one's


def test_xor_cancels_duplicate_pair_but_mod_sum_catches(spark):
    rows = [(1, "x"), (2, "y")]
    dup = rows + [(1, "x"), (1, "x")]  # one row duplicated twice more
    a = table_checksum(_df(spark, rows), ["a", "b"], 1).collect()[0]
    b = table_checksum(_df(spark, dup), ["a", "b"], 1).collect()[0]
    assert a.xor_sum == b.xor_sum      # the documented XOR blind spot
    assert a.mod_sum != b.mod_sum      # the mod-sum closes it
    assert a.n_rows != b.n_rows


def test_null_differs_from_empty_string(spark):
    df_null = spark.createDataFrame([(1, None)], "a int, b string")
    df_empty = spark.createDataFrame([(1, "")], "a int, b string")
    assert _sums(table_checksum(df_null, ["a", "b"], 1)) != \
        _sums(table_checksum(df_empty, ["a", "b"], 1))


def test_validation(spark):
    df = _df(spark, [(1, "x")])
    with pytest.raises(ValueError, match="buckets"):
        table_checksum(df, ["a"], 0)
    with pytest.raises(ValueError, match="non-empty"):
        table_checksum(df, [], 4)


def test_plan_partial_aggregation(spark):
    plan = (table_checksum(_df(spark, [(1, "x")] * 10), ["a", "b"], 4)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Join" not in plan

def test_xxhash64_mode_invariant_and_sensitive(spark):
    rows = [(i, f"v{i % 7}") for i in range(300)]
    a = _sums(table_checksum(_df(spark, rows), ["a", "b"], 8,
                             hash="xxhash64"))
    b = _sums(table_checksum(_df(spark, list(reversed(rows))).repartition(5),
                             ["a", "b"], 8, hash="xxhash64"))
    assert a == b
    rows2 = list(rows)
    rows2[13] = (13, "changed")
    c = _sums(table_checksum(_df(spark, rows2), ["a", "b"], 8,
                             hash="xxhash64"))
    assert c != a
    with pytest.raises(ValueError, match="portable|xxhash64"):
        table_checksum(_df(spark, rows), ["a"], 4, hash="md5")


def test_xxhash64_null_position_distinguishing(spark):
    # ADVICE r6: Spark hash exprs skip NULLs, so without per-column null
    # flags ('a', NULL) and (NULL, 'a') hash identically and the audit
    # returns a false "equal" — the exact failure the portable path's
    # NULL_TOKEN prevents.
    df1 = spark.createDataFrame([("a", None)], "x string, y string")
    df2 = spark.createDataFrame([(None, "a")], "x string, y string")
    s1 = _sums(table_checksum(df1, ["x", "y"], 1, hash="xxhash64"))
    s2 = _sums(table_checksum(df2, ["x", "y"], 1, hash="xxhash64"))
    assert s1 != s2


def test_portable_fold_matches_jvm_fingerprint(spark):
    # the vectorized numpy fold must be bit-identical to the JVM
    # higher-order-aggregate fold, including non-ASCII and empty rows
    from osm2garmin_spark.functions.checksum import (
        _rendered_col, row_fingerprint)
    rows = [Row(a=i, b=t) for i, t in enumerate(
        ["plain", "", "x\x1fy", "café", "中文", None,
         "mixed café ascii", "0" * 300])]
    df = spark.createDataFrame(rows, "a int, b string")
    jvm = sorted(r[0] for r in df.select(
        row_fingerprint(["a", "b"]).alias("h")).collect())
    # direct kernel comparison: fold the rendered column through the
    # mapInArrow path and compare multisets
    from osm2garmin_spark.functions.checksum import _portable_fold_kernel
    folded = sorted(r[0] for r in df.select(
        _rendered_col(["a", "b"]).alias("_r"))
        .mapInArrow(_portable_fold_kernel, schema="_h long").collect())
    assert folded == jvm
