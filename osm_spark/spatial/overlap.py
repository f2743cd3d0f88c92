"""Polygon-polygon overlap join — cell-candidate pairs + exact
pairwise classification (kernels/overlap.py).

The reference computes containment matrices WITHIN one relation
(poly.go's inclusion DAG); this operator is the cross-RELATION
analog a spatial warehouse needs: which admin areas nest, duplicate,
or illegally overlap each other.

Scale shape:

- **Candidates** — each relation's covering cells (already built for
  the PIP join — reused, not recomputed) are coarsened to one probe
  level with ``cell_parent_expr`` and distinct-ed per relation; the
  pair space is a self-equi-join on the cell id (a < b). Shuffle is
  O(relations × cells-at-level); a planet-scale admin set is ~10⁶
  relations with small per-relation cell counts. A pair sharing any
  intersecting area shares a level-L cell (both coverings contain the
  true cells of the shared region, and coarsening preserves sharing),
  so candidate recall is 1; coarsening only ADDS false candidates,
  which the exact kernel rejects.
- **Verdicts** — the geometry of both relations is broadcast once as
  a compiled dict (the small side by design — same budget argument as
  the PIP index; at planet scale gate behind the same auto-mode
  estimate), and candidate pairs stream through one mapInPandas:
  zero further shuffle, parallelism = pair-partition count. Exact
  integer predicates (fixed-point coords recovered by rounding), so
  shared admin borders never misread as overlaps.

Output: (rel_a, rel_b, relation) with rel_a < rel_b and relation in
{equal, overlap, a_contains_b, b_contains_a}; disjoint/touch-only
pairs are dropped.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.spatial.cells_sql import cell_parent_expr

_OUT_SCHEMA = "rel_a long, rel_b long, relation string"


def _compile_geometry(pgeom: DataFrame) -> dict:
    """rel_id → multipolygon in fixed-point ints (exact recovery:
    the stored degree doubles are int/10⁷ with error < 1 ulp, so
    round(x·10⁷) is the original integer)."""
    geo: dict[int, list] = {}
    for row in pgeom.select("rel_id", "poly").toLocalIterator():
        poly = [
            [[int(round(x * 1e7)), int(round(y * 1e7))] for x, y in ring]
            for ring in row["poly"]
        ]
        geo.setdefault(int(row["rel_id"]), []).append(poly)
    return geo


def candidate_pairs(pcells: DataFrame, level: int = 4) -> DataFrame:
    """Distinct (rel_a < rel_b) relation pairs sharing a level-L cell.

    ``level`` must be ≤ the covering's ``min_level`` (coverings carry
    mixed-level cells and ``cell_parent_expr`` can only coarsen);
    default matches build_polygon_cells' min_level default."""
    cells = (
        pcells.select(
            "rel_id", cell_parent_expr(F.col("cell"), level).alias("c")
        )
        .distinct()
    )
    a = cells.select(F.col("rel_id").alias("rel_a"), "c")
    b = cells.select(F.col("rel_id").alias("rel_b"), "c")
    return (
        a.join(b, "c")
        .where(F.col("rel_a") < F.col("rel_b"))
        .select("rel_a", "rel_b")
        .distinct()
    )


def polygon_overlap_join(
    pcells: DataFrame,
    pgeom: DataFrame,
    level: int = 4,
    geom_bc=None,
) -> DataFrame:
    """Classify every candidate relation pair; see module docstring.

    ``geom_bc``: an already-broadcast ``{rel_id: multipolygon-int}``
    dict to share across calls (the knn ``index_bc`` pattern).
    """
    spark = pcells.sparkSession
    if geom_bc is None:
        geom_bc = spark.sparkContext.broadcast(_compile_geometry(pgeom))

    def verdicts(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from osm_spark.kernels.overlap import classify_pair

        geo = geom_bc.value
        for pdf in it:
            out_a, out_b, out_r = [], [], []
            for ra, rb in zip(pdf["rel_a"], pdf["rel_b"]):
                mp_a, mp_b = geo.get(int(ra)), geo.get(int(rb))
                if mp_a is None or mp_b is None:
                    continue
                rel = classify_pair(mp_a, mp_b)
                if rel is not None:
                    out_a.append(int(ra))
                    out_b.append(int(rb))
                    out_r.append(rel)
            yield pd.DataFrame(
                {"rel_a": out_a, "rel_b": out_b, "relation": out_r}
            )

    return candidate_pairs(pcells, level).mapInPandas(verdicts, _OUT_SCHEMA)
