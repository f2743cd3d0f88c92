from osm_spark.operators.ways import build_ways_geom
from osm_spark.operators.filters import with_tag_columns, split_kept_relations
from osm_spark.operators.assembly import resolve_members, assemble_locations
from osm_spark.operators.centroids import build_centroids
from osm_spark.operators.geojson import build_boundaries, check_iso_codes

__all__ = [
    "build_ways_geom",
    "with_tag_columns",
    "split_kept_relations",
    "resolve_members",
    "assemble_locations",
    "build_centroids",
    "build_boundaries",
    "check_iso_codes",
]
