"""Pure-Python/numpy geometry kernels.

These are the per-group computations that run inside Arrow-batched
grouped-map pandas UDFs (``applyInPandas``). They are deliberately
Spark-free so they unit-test in milliseconds against the reference's
exact test vectors (see /root/reference/*_test.go, FIXTURES.md §2).
"""

from osm_spark.kernels.unionfind import UnionFind
from osm_spark.kernels.rings import Linestring, make_rings, merge_arcs
from osm_spark.kernels.poly import make_polygons
from osm_spark.kernels.winding import polygons_to_coords
from osm_spark.kernels.centroid import compute_centroid

__all__ = [
    "UnionFind",
    "Linestring",
    "make_rings",
    "merge_arcs",
    "make_polygons",
    "polygons_to_coords",
    "compute_centroid",
]
