"""One scaling LEG: the pages-side spatial-join path only (geoparse →
broadcast-index PIP → tiles) at a given core count. Prints one JSON
line. Used by tools/pip_scaling.py, which alternates legs A/B/A/B and
takes the per-width MINIMUM — the standard robust estimator on a box
with bursty external contention (see BENCH.md run history).

Usage: python tools/pip_leg.py <cpus> [n_pages] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    sf = 0.1

    from pyspark.sql import functions as F

    from osm_spark.data.pages import PagesSpec, pages_df
    from osm_spark.data.worldgen import WorldSpec, world_dataframes
    from osm_spark.plans.pipeline import run_boundaries_pipeline
    from osm_spark.session import get_spark
    from osm_spark.spatial.covering import build_polygon_cells, polygon_geometry
    from osm_spark.spatial.geoparse import geoparse_pages
    from osm_spark.spatial.pip_index import build_pip_index, pip_join_index
    from osm_spark.spatial.tiles import tile_assignments

    n_countries = max(int(40 * sf), 2)
    spark = get_spark(app_name=f"pip-leg-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()  # JIT warm
    # Warm the PYTHON worker pool too (spark.python.worker.reuse keeps
    # them alive): post-reboot this host serializes worker fork+imports
    # (~0.5 s/worker), which at 32 workers injects ~15 s into whichever
    # stage spawns them — a fixed per-SESSION cost that amortizes to
    # zero at 10^12 rows and must not be charged to the timed leg.
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()

    nodes, ways, rels, cfg = world_dataframes(
        spark, WorldSpec(n_countries=n_countries, densify=6)
    )
    out = run_boundaries_pipeline(spark, nodes, ways, rels, cfg)
    out["locations"] = out["locations"].persist()
    out["locations"].count()

    # Persist ONLY the columns the spatial path reads (url, text): on a
    # real cluster the parquet scan prunes html:binary at the source
    # (SCALE.md data-layout invariant); caching the generated full row
    # would charge the leg for bytes a production scan never moves —
    # and at 12M rows the r4 realistic-markup html column (~1 KB/row)
    # no longer fits the bench JVM heap.
    pages = pages_df(
        spark, PagesSpec(n_pages=n_pages, n_countries=n_countries)
    ).select("url", "text").persist()
    pages.count()

    t0 = time.time()
    pcells = build_polygon_cells(out["locations"], 4, 11)
    index_bc = spark.sparkContext.broadcast(
        build_pip_index(pcells, polygon_geometry(out["locations"]))
    )
    t_build = time.time() - t0

    geo = geoparse_pages(pages).withColumn("point_id", F.xxhash64("url"))
    points = geo.select("point_id", "url", "lon", "lat")
    pip = pip_join_index(points.select("point_id", "lon", "lat"), index_bc).select(
        "point_id", "rel_id"
    )
    admin = out["kept"].select(F.col("id").alias("rel_id"), "admin_level")
    tiles = tile_assignments(pip, points, admin, 7)

    t0 = time.time()
    n = tiles.count()
    t_assign = time.time() - t0
    print(
        json.dumps(
            {
                "cpus": cpus,
                "n_pages": n_pages,
                "index_build_sec": round(t_build, 2),
                "assign_sec": round(t_assign, 2),
                "rows": n,
                "rows_per_sec": int(n / t_assign),
            }
        )
    )


if __name__ == "__main__":
    main()
