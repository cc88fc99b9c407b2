"""Incremental snapshot maintenance — the osmosis apply-change path.

Reference semantics (SURVEY.md §2.9):
- merge N hourly change files into one, deduping to the latest version per
  element (--apc + --simc: PlanetUpdater.java:129-153,146-148)
- apply the merged change stream to the base snapshot: upserts + deletes
  (--ac: PlanetUpdater.java:166-195)

Spark-first shape: both are one window/anti-join pass; on Iceberg this is
``MERGE INTO`` — here expressed as a snapshot transform (new DataFrame =
old ⊳ changes) so it also serves as the batch leg of a streaming upsert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: change actions, matching OSM changeset semantics
ACTIONS = ("create", "modify", "delete")


def compact_changes(changes: DataFrame, id_col: str,
                    version_col: str = "version") -> DataFrame:
    """N change batches → latest change per id (--simc dedup,
    row_number over version desc; ties broken by action priority so a
    delete+recreate in one batch resolves deterministically)."""
    w = Window.partitionBy(id_col).orderBy(
        F.col(version_col).desc(),
        # delete sorts after create/modify at equal version
        F.when(F.col("action") == "delete", 1).otherwise(0).desc())
    return (changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))


def apply_changes(base: DataFrame, changes: DataFrame, id_col: str,
                  version_col: str = "version") -> DataFrame:
    """base snapshot ⊳ compacted changes → new snapshot (--ac semantics):
    deletes drop the row, creates/modifies replace it, unmatched base rows
    pass through. Equivalent to Iceberg MERGE INTO WHEN MATCHED/NOT MATCHED."""
    latest = compact_changes(changes, id_col, version_col)
    surviving_changes = (latest.filter(F.col("action") != "delete")
                         .drop("action", version_col))
    untouched = base.join(latest.select(id_col), id_col, "left_anti")
    return untouched.unionByName(surviving_changes)


def gate_changes_by_age(changes: DataFrame, as_of,
                        min_age_hours: float = 8.0,
                        ts_col: str = "ts") -> DataFrame:
    """Freshness gate (settings.properties planet_minimum_age=8: "planet
    update stops when minimum age is reached"): only change rows at least
    ``min_age_hours`` old at ``as_of`` are admitted; younger rows wait for
    the next run — mirrors or downstream feeds may still be mutating them.
    ``as_of`` is any expression/literal comparable to ts_col (timestamp)."""
    cutoff = F.to_timestamp(F.lit(as_of)) - F.expr(
        f"INTERVAL {int(round(min_age_hours * 3600))} SECONDS")
    return changes.filter(F.col(ts_col) <= cutoff)


def compact_batches(changes: DataFrame, id_col: str,
                    seq_col: str = "seq", version_col: str = "version",
                    batch_size: int = 30) -> DataFrame:
    """Compaction schedule: every ``batch_size`` consecutive change
    sequences merge into ONE compacted batch, latest version per id
    winning within the batch — the reference merges each 30 hourly diff
    files into a single file named after the batch's first sequence
    (PlanetUpdateDownloader.java:218-271: --apc sourceCount=30 --simc,
    rename to sequence-29). Output carries ``batch_seq`` = the batch's
    first sequence; downstream apply_changes consumes batches in
    batch_seq order."""
    batch = (F.floor(F.col(seq_col) / batch_size) * batch_size).alias("batch_seq")
    w = Window.partitionBy(F.col(seq_col) - (F.col(seq_col) % batch_size),
                           F.col(id_col)).orderBy(
        F.col(version_col).desc(),
        F.when(F.col("action") == "delete", 1).otherwise(0).desc(),
        F.col(seq_col).desc())
    return (changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .withColumn("batch_seq", batch)
            .drop("_rn", seq_col))
