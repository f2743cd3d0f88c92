"""Distributed polygon simplification over the locations table.

The index-mode PIP path broadcasts covering + exact geometry to every
executor (pip_index.py).  At planet fidelity the geometry side can
exceed the broadcast budget (SCALE.md); simplifying the admin rings at
a stated tolerance (~1e-5 deg is sub-meter — far below admin-boundary
noise) shrinks ring points 10-100x and keeps index mode viable.

``simplify_shapes`` runs the Douglas-Peucker kernel
(osm_spark.kernels.simplify) as ONE mapInPandas pass over the
locations rows — Arrow-batched, vectorized per ring, no shuffle, no
join; parallelism equals the input partitioning.  All non-shape
columns pass through untouched; ``n_polygons`` (when present) is
recomputed because sub-tolerance sliver polygons drop.

Rows whose every polygon collapses are dropped (they can no longer
contribute a point-in-polygon assignment at this tolerance).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from osm_spark.kernels.simplify import simplify_polygon


def simplify_shapes(
    df: DataFrame, tol: float, shape_col: str = "shape"
) -> DataFrame:
    """Simplify every ring of every polygon in ``shape_col`` with
    Douglas-Peucker at ``tol`` (degrees); schema is preserved."""
    schema = df.schema
    has_npoly = "n_polygons" in df.columns

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            shapes = []
            keep_mask = []
            for shape in pdf[shape_col]:
                # Arrow hands nested arrays as numpy arrays — only
                # check None-ness, never truthiness.
                if shape is None:
                    shapes.append(None)
                    keep_mask.append(True)
                    continue
                polys = []
                for rings in shape:
                    simplified = simplify_polygon(rings, tol)
                    if simplified is not None:
                        polys.append(simplified)
                shapes.append(polys)
                keep_mask.append(len(polys) > 0)
            out = pdf.copy()
            out[shape_col] = shapes
            if has_npoly:
                out["n_polygons"] = [
                    len(s) if s is not None else 0 for s in shapes
                ]
            yield out[pd.Series(keep_mask, index=out.index)]

    return df.mapInPandas(run, schema)
