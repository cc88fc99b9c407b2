"""osm2garmin_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch re-expression of the query semantics of mantlik/osm2garmin
(reference at /root/reference, Java) over Spark DataFrames:

- ``geo``       pure-numpy kernel: map-unit codec, Java-exact alignment
                rounding, Area (tile bbox) algebra, hierarchical grid cells.
- ``split``     density histogram (Spark groupBy) + driver-side recursive
                weighted-median quadtree split (reference splitter pass 1).
- ``operators`` distributed joins: point→tile assignment, group (way/relation)
                tile-set union, point-in-polygon, grid kNN, contour
                (raster→vector) bridge.
- ``functions`` text analysis, dedup (exact/minhash/simhash/jaccard),
                embedding similarity search.
- ``pipeline``  synthetic image+caption corpus, lineage/checkpoint tables,
                end-to-end tiling pipeline.

Everything is DataFrame-first: Catalyst handles pushdown/pruning; Python
only appears as Arrow-vectorized pandas UDFs (no per-row Python).
"""

__version__ = "0.1.0"
