"""J5 + G12 — admin-center node join and computed centroids.

Mirrors indexCentersFn (main.go:410-523):
- relations WITH an ``admin_center``/``admin_centre`` node ref use that
  node's coordinates (last such ref wins — the reference's loop
  main.go:455-459 overwrites). The ref's PRESENCE decides the path: if
  the node can't be resolved the relation simply gets no centroid (the
  second scan never fulfills it).
- relations WITHOUT the ref compute a centroid from their assembled
  multipolygon (computeCentroid centroid.go:162-217): largest polygon,
  barycenter attempt + PIP check, interior-point fallback + PIP check,
  else none.

The node join is N:M — one node may serve several relations
(main.go:511-517). The compute path is a mapInPandas over the locations
checkpoint (vectorized Arrow batches; one small kernel call per row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.kernels import compute_centroid
from osm_spark.kernels.centroid import NoConvexVertexError

CENTROID_SCHEMA = "rel_id long, lon double, lat double, node_id long, error string"


def _as_multipolygon(shape) -> list:
    """Arrow delivers nested numpy arrays; kernels expect list-of-lists."""
    return [
        [[[float(v) for v in pt] for pt in ring] for ring in poly] for poly in shape
    ]


def _compute_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rel_ids, lons, lats, errs = [], [], [], []
        for row in pdf.itertuples():
            rel_ids.append(int(row.rel_id))
            try:
                c = compute_centroid(_as_multipolygon(row.shape))
            except NoConvexVertexError as exc:
                lons.append(None)
                lats.append(None)
                errs.append(f"cannot compute centroid: {exc}")
                continue
            if c is None:
                lons.append(None)
                lats.append(None)
                errs.append("cannot get admin_center")
            else:
                lons.append(c[0])
                lats.append(c[1])
                errs.append(None)
        yield pd.DataFrame(
            {
                "rel_id": rel_ids,
                "lon": lons,
                "lat": lats,
                "node_id": [None] * len(rel_ids),
                "error": errs,
            }
        )


def build_centroids(
    kept: DataFrame, locations: DataFrame, nodes: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """(centroids, errors).

    centroids: (rel_id, lon, lat, node_id) — node_id null for computed.
    errors: per-relation centroid failures (reference prints and skips).
    """
    with_loc = locations.where(F.size("shape") > 0).select("rel_id", "shape")

    # Last admin_center node ref per relation (main.go:455-459).
    center_refs = (
        kept.select(F.col("id").alias("rel_id"), F.posexplode("refs").alias("pos", "ref"))
        .where(
            (F.col("ref.ref_type") == 0)
            & F.col("ref.role").isin("admin_center", "admin_centre")
        )
        .groupBy("rel_id")
        .agg(F.max_by(F.col("ref.ref_id"), F.col("pos")).alias("node_id"))
    )
    # Ref presence gates the path even if the node is unresolvable.
    has_ref = center_refs.join(with_loc.select("rel_id"), "rel_id", "left_semi")
    from_nodes = (
        has_ref.join(
            nodes.select(F.col("id").alias("node_id"), "lon", "lat"), "node_id"
        )
        .select(
            "rel_id",
            (F.col("lon") / 1e7).alias("lon"),
            (F.col("lat") / 1e7).alias("lat"),
            "node_id",
        )
    )

    computed_src = with_loc.join(has_ref.select("rel_id"), "rel_id", "left_anti")
    computed = computed_src.mapInPandas(_compute_batch, CENTROID_SCHEMA)
    errors = computed.where(F.col("error").isNotNull()).select(
        F.col("rel_id").alias("root_id"), "error"
    )
    ok = computed.where(F.col("error").isNull()).select(
        "rel_id", "lon", "lat", "node_id"
    )
    return from_nodes.unionByName(ok), errors
