from .tile_join import tiles_df, assign_points_to_tiles, tile_counts
from .group_join import assign_groups_to_tiles, assign_relations_to_tiles

__all__ = [
    "tiles_df",
    "assign_points_to_tiles",
    "tile_counts",
    "assign_groups_to_tiles",
    "assign_relations_to_tiles",
]
