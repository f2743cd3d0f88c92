"""osm_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the query semantics of pmezard/osm (administrative-boundary
extraction: relation→way→node resolution, ring assembly, multipolygon
reconstruction, centroids, GeoJSON emission) as distributed DataFrame
operators, and extends it into a web-scale spatial engine: hierarchical
cell covering (S2-style Morton index), skew-aware point-in-polygon joins
over Common-Crawl-style page tables, kNN nearest-boundary, raster density
grids, plus training-data-pipeline operators (dedup, similarity search,
text analysis).

Architecture: DataFrame/SQL plans optimized by Catalyst; geometry kernels
are pure-numpy and run inside Arrow-batched grouped-map pandas UDFs
(never per-row Python). See SURVEY.md for the reference mapping.
"""

__version__ = "0.1.0"
