"""Spatially-clustered parquet layout + partition-pruned region reads.

The 100-TB problem this solves: a planet-scale page/point table queried
by region must not scan the world. Nothing in the query layer can fix a
layout where any bbox touches every file — pruning has to be baked in
at WRITE time. Two-level clustering:

- **Partition directories** keyed by a COARSE Morton cell
  (``cell=<id>/``, default level 4 → ≤ 256 dirs). Catalyst partition
  pruning makes a region read list only the matching directories:
  O(region) files opened, not O(world). At 10^12 rows raise the level
  (6–8 → 4k–65k dirs) so each directory stays a few GB.
- **Row order within files** by a FINE Morton key (default level 12).
  Rows near in space are near in the file, so the parquet row-group
  min/max statistics on lon/lat are tight and the residual bbox filter
  (pushed to the scan — ``PushedFilters`` in the plan) skips row
  groups *inside* each surviving file.

Both keys are pure Catalyst expressions (``cells_sql.cell_expr``), so
the write path stays in whole-stage codegen; the read path is an
ordinary parquet scan whose pruning is visible in the plan
(``PartitionFilters`` — pinned by tests/test_clustered.py).

Skew: one hot city cell (the worldgen 30% hot cluster) would otherwise
become one giant file written by one task. ``files_per_cell > 1``
splits every cell's rows deterministically by the fine key's low bits
into that many shuffle groups → that many files per directory, written
in parallel. Readers are unaffected (pruning is directory-level).

Reference parity note: the reference (pmezard/osm) persists k/v buckets
keyed by id only (kv.go) — spatial locality of storage has no analog
there; this module is part of the engine's scale surface (SURVEY §2.9).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osm_spark.kernels.cells import xy_to_cell
from osm_spark.spatial.cells_sql import cell_expr


def write_clustered(
    df: DataFrame,
    path: str,
    lon_col: str = "lon",
    lat_col: str = "lat",
    level: int = 4,
    fine_level: int = 12,
    files_per_cell: int = 1,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a spatially-clustered parquet table.

    Adds a ``cell`` column (coarse Morton id of ``lon_col``/``lat_col``)
    used as the partition directory key; rows are shuffled so each
    (cell, fine-key-mod-``files_per_cell``) group lands in one task and
    sorted by the fine Morton key before writing.
    """
    lon, lat = F.col(lon_col), F.col(lat_col)
    fine = cell_expr(lon, lat, fine_level)
    out = df.withColumn("cell", cell_expr(lon, lat, level))
    split = F.pmod(F.shiftright(fine, 6), F.lit(files_per_cell))
    # Explicit partition count: AQE's small-partition coalescing would
    # otherwise merge the (cell, split) groups back together at low
    # volume, silently defeating the hot-cell split (hash collisions
    # may still merge SOME groups — files_per_cell is an upper bound on
    # parallel writers per cell, not an exact file count).
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    out = (
        out.repartition(n_parts, F.col("cell"), split)
        .sortWithinPartitions(fine)
    )
    out.write.partitionBy("cell").mode(mode).parquet(path)


def region_cells(
    lon0: float, lat0: float, lon1: float, lat1: float, level: int = 4
) -> list[int]:
    """Coarse cell ids intersecting the bbox (driver-side, tiny:
    ≤ 4^level total cells exist). Inclusive of boundary cells; callers
    apply the residual bbox filter for exactness."""
    n = 1 << level
    x0 = min(max(int(np.floor((lon0 + 180.0) / 360.0 * n)), 0), n - 1)
    x1 = min(max(int(np.floor((lon1 + 180.0) / 360.0 * n)), 0), n - 1)
    y0 = min(max(int(np.floor((lat0 + 90.0) / 180.0 * n)), 0), n - 1)
    y1 = min(max(int(np.floor((lat1 + 90.0) / 180.0 * n)), 0), n - 1)
    xs, ys = np.meshgrid(
        np.arange(x0, x1 + 1, dtype=np.int64),
        np.arange(y0, y1 + 1, dtype=np.int64),
    )
    return sorted(int(c) for c in xy_to_cell(xs.ravel(), ys.ravel(), level))


def read_region(
    spark: SparkSession,
    path: str,
    lon0: float,
    lat0: float,
    lon1: float,
    lat1: float,
    level: int = 4,
    lon_col: str = "lon",
    lat_col: str = "lat",
    schema=None,
) -> DataFrame:
    """Read only the rows of a clustered table inside the bbox.

    The ``cell IN (...)`` predicate on the partition column prunes
    directories (PartitionFilters); the bbox range predicates push to
    the parquet scan (PushedFilters) and skip row groups via the
    min/max stats the fine-key sort made tight.

    ``schema`` (optional, include the ``cell`` partition column): skips
    footer-based schema inference entirely, so planning itself never
    opens a file outside the pruned directories."""
    cells = region_cells(lon0, lat0, lon1, lat1, level)
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    return df.where(F.col("cell").isin(cells)).where(
        (F.col(lon_col) >= F.lit(lon0))
        & (F.col(lon_col) <= F.lit(lon1))
        & (F.col(lat_col) >= F.lit(lat0))
        & (F.col(lat_col) <= F.lit(lat1))
    )
