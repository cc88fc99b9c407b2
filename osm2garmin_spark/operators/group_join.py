"""Group (way/relation analogue) tile-set semi-joins.

The reference assigns a way to the union of the tile-sets of its member
nodes by probing a shared long→tileset index (SplitProcessor.processWay:
106-125); relations union tile-sets of node members and way members
(processRelation:128-166). The index (SparseLong2ShortMapInline) is bespoke
memory machinery — in Spark the whole thing is a shuffle equi-join:

    members explode → join node-assignments on ref → groupBy(group)
    → collect_set(tile_id)

Map-side partial aggregation + AQE handle scale; no interning dictionary is
needed (tile-id arrays are columnar, SURVEY.md §2.1 tile-set row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assign_groups_to_tiles(members: DataFrame, node_tiles: DataFrame,
                           group_col: str = "group_id",
                           ref_col: str = "ref",
                           node_id_col: str = "node_id") -> DataFrame:
    """(group_id, ref) membership rows × (node_id, tile_id) assignments →
    (group_id, tile_ids sorted distinct array).

    Members whose ref matched no node contribute nothing; groups with no
    matched member are dropped (unassigned semantics,
    SplitProcessor.java:109-115).
    """
    j = members.join(
        node_tiles.select(F.col(node_id_col).alias(ref_col), "tile_id"),
        ref_col, "inner")
    return (j.groupBy(group_col)
             .agg(F.array_sort(F.collect_set("tile_id")).alias("tile_ids")))


def filter_invalid_members(members: DataFrame, valid_ids: DataFrame,
                           ref_col: str = "ref",
                           id_col: str = "node_id") -> DataFrame:
    """Explicit invalid-member filter: keep only membership rows whose ref
    exists in the valid-id table (left-semi join — never fabricates or
    duplicates rows). The reference silently skips unknown members when
    probing its long→tileset index (SplitProcessor.java:109-115,139-151);
    this is that skip as a standalone, testable relational step for
    pipelines that need the cleansed membership table itself (e.g. to
    count/report dangling refs via the anti-join complement)."""
    return members.join(
        valid_ids.select(F.col(id_col).alias(ref_col)).distinct(),
        ref_col, "left_semi")


def strip_ingest_tags(df: DataFrame, tags_col: str = "tags",
                      drop: tuple = ("created_by",)) -> DataFrame:
    """Ingest cleansing: remove noise tags (created_by & friends) from a
    map<string,string> column before anything is shuffled or persisted —
    the reference drops created_by at parse time to keep elements small.
    Pure column expression (map_filter), no UDF."""
    dropped = F.array(*[F.lit(k) for k in drop])
    return df.withColumn(
        tags_col,
        F.map_filter(F.col(tags_col),
                     lambda k, _v: ~F.array_contains(dropped, k)))


def keep_complete_nodes(members: DataFrame, node_tiles: DataFrame,
                        group_tiles: DataFrame,
                        group_col: str = "group_id", ref_col: str = "ref",
                        node_id_col: str = "node_id") -> DataFrame:
    """``--keep-complete=true`` retention (the splitter flag the reference
    wires in OsmMaker.java:71-76,115): every tile that received a way also
    receives ALL of the way's member nodes — even nodes whose own
    coordinates fall outside the tile's extended bounds — so features are
    never clipped at tile edges. Output = the augmented distinct
    (node_id, tile_id) assignment set (original point assignments ∪
    pulled-in members). One extra equi-join + union-distinct; the node
    table never collects anywhere."""
    pulled = (members.join(
        group_tiles.select(group_col, F.explode("tile_ids").alias("tile_id")),
        group_col)
        .select(F.col(ref_col).alias(node_id_col), "tile_id"))
    return (node_tiles.select(node_id_col, "tile_id")
            .unionByName(pulled).distinct())


def assign_relations_to_tiles(rel_members: DataFrame, node_tiles: DataFrame,
                              group_tiles: DataFrame,
                              rel_col: str = "rel_id") -> DataFrame:
    """Relation analogue: members (rel_id, type('node'|'way'), ref) union
    node-branch and way-branch tile-sets (SplitProcessor.java:128-166)."""
    nodes_branch = (
        rel_members.filter(F.col("type") == "node")
        .join(node_tiles.select(F.col("node_id").alias("ref"), "tile_id"),
              "ref", "inner")
        .select(rel_col, "tile_id")
    )
    ways_branch = (
        rel_members.filter(F.col("type") == "way")
        .join(group_tiles.select(F.col("group_id").alias("ref"),
                                 F.explode("tile_ids").alias("tile_id")),
              "ref", "inner")
        .select(rel_col, "tile_id")
    )
    both = nodes_branch.unionByName(ways_branch)
    return (both.groupBy(rel_col)
                .agg(F.array_sort(F.collect_set("tile_id")).alias("tile_ids")))
