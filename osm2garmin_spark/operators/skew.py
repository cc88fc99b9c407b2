"""Skew handling for hot tiles / hot cells.

Dense metro cells make tile_id a skewed key: a single tile can hold orders
of magnitude more rows than the median (the reference hits the same wall as
OOM→halve-max-areas retries, OsmMaker.java:134-150; we handle it up front).

Two mechanisms, used together:
- AQE skew-join splitting is enabled session-wide (session.py) — covers
  joins automatically at runtime.
- ``salted_repartition`` adds an explicit deterministic salt for the
  shuffle-before-partitioned-write and for aggregations whose key is a
  tile/cell: hot keys fan out to ``salt_n`` sub-partitions so no single
  task owns a metro tile.

``salt_n`` defaults to a per-key fan-out that caps expected partition size;
the salt is derived from a stable row id (never rand()) so retries and
resumed jobs shuffle identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_repartition(df: DataFrame, key_col: str, id_col: str,
                       salt_n: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, salt) with a deterministic salt from the row id.

    Use before ``write.partitionBy(key)`` on a skewed key: each hot key's
    rows spread over salt_n shuffle partitions (salt_n writer tasks per
    key instead of 1), while the on-disk layout stays partitioned by key
    only — downstream readers see no salt."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n)))
    if num_partitions:
        out = salted.repartition(num_partitions, key_col, "_salt")
    else:
        out = salted.repartition(key_col, "_salt")
    return out.drop("_salt")


def salted_count(df: DataFrame, key_col: str, id_col: str,
                 salt_n: int = 16) -> DataFrame:
    """Two-level count for a skewed key: partial count per (key, salt),
    final sum per key. Spark's partial aggregation already does this for
    plain counts — this shape matters for aggregates without map-side
    combine (e.g. collect_set of large payloads, exact distinct)."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n)))
    partial = salted.groupBy(key_col, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key_col).agg(F.sum("_c").alias("n_rows"))


def salted_collect_set(df: DataFrame, key_col: str, value_col: str,
                       id_col: str, salt_n: int = 16) -> DataFrame:
    """Skew-safe distinct-set aggregation: per-(key,salt) partial sets,
    then a final union — the way tile-set union (group_join) scales when a
    single way/relation has millions of members."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n)))
    partial = salted.groupBy(key_col, "_salt") \
        .agg(F.collect_set(value_col).alias("_s"))
    return partial.groupBy(key_col).agg(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_s"))))
        .alias(f"{value_col}s"))
