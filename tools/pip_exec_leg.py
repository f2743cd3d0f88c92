"""One EXECUTOR-scaling leg: the pages-side spatial-join path
(geoparse → broadcast-index PIP → tiles) over ONE SHARD of a
pre-materialized pages table, in its own JVM/python-worker pool.

This is the multi-process twin of tools/pip_leg.py. pip_leg measures
THREAD scaling inside one JVM — which conflates the engine with
single-runtime artifacts (one GC, one allocator, one shuffle-less
task pool) that no real cluster has; a 4N-executor cluster runs 4×
separate runtimes. Here each leg is one "executor": it reads its
deterministic slice of the shared parquet input (the PIP path is
zero-shuffle, so static file assignment IS what Spark's scheduler
does with these partitions), builds/deserializes its own index
(exactly what a broadcast does per executor), warms up, then waits at
a file barrier so all concurrent executors start the TIMED assign
together.

Usage: python tools/pip_exec_leg.py <cpus> <pages_dir> <shard_idx>
           <n_shards> <barrier_dir>
Prints one JSON line with assign_sec + rows for its shard.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main() -> None:
    cpus = int(sys.argv[1])
    pages_dir = sys.argv[2]
    shard_idx = int(sys.argv[3])
    n_shards = int(sys.argv[4])
    barrier_dir = sys.argv[5]
    sf = 0.1

    from pyspark.sql import functions as F

    from osm_spark.data.worldgen import WorldSpec, world_dataframes
    from osm_spark.plans.pipeline import run_boundaries_pipeline
    from osm_spark.session import get_spark
    from osm_spark.spatial.covering import build_polygon_cells, polygon_geometry
    from osm_spark.spatial.geoparse import geoparse_pages
    from osm_spark.spatial.pip_index import build_pip_index, pip_join_index
    from osm_spark.spatial.tiles import tile_assignments

    n_countries = max(int(40 * sf), 2)
    spark = get_spark(
        app_name=f"pip-exec-{shard_idx}", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).select(F.sum("id")).collect()
    spark.range(0, cpus * 4, 1, cpus).mapInPandas(lambda it: it, "id long").count()

    nodes, ways, rels, cfg = world_dataframes(
        spark, WorldSpec(n_countries=n_countries, densify=6)
    )
    out = run_boundaries_pipeline(spark, nodes, ways, rels, cfg)
    out["locations"] = out["locations"].persist()
    out["locations"].count()

    # deterministic slice: sorted file list, every n_shards-th file
    files = sorted(glob.glob(os.path.join(pages_dir, "part-*.parquet")))
    mine = [f for i, f in enumerate(files) if i % n_shards == shard_idx]
    pages = spark.read.parquet(*mine).persist()
    n_mine = pages.count()

    pcells = build_polygon_cells(out["locations"], 4, 11)
    index_bc = spark.sparkContext.broadcast(
        build_pip_index(pcells, polygon_geometry(out["locations"]))
    )
    geo = geoparse_pages(pages).withColumn("point_id", F.xxhash64("url"))
    points = geo.select("point_id", "url", "lon", "lat")
    pip = pip_join_index(points.select("point_id", "lon", "lat"), index_bc).select(
        "point_id", "rel_id"
    )
    admin = out["kept"].select(F.col("id").alias("rel_id"), "admin_level")
    tiles = tile_assignments(pip, points, admin, 7)

    # barrier: every concurrent executor is warm before ANY timer runs
    open(os.path.join(barrier_dir, f"ready-{shard_idx}"), "w").write("1")
    deadline = time.time() + 600
    while len(glob.glob(os.path.join(barrier_dir, "ready-*"))) < n_shards:
        if time.time() > deadline:
            raise RuntimeError("barrier timeout")
        time.sleep(0.2)

    t0 = time.time()
    n = tiles.count()
    t_assign = time.time() - t0
    print(
        json.dumps(
            {
                "shard": shard_idx,
                "cpus": cpus,
                "n_pages_shard": n_mine,
                "assign_sec": round(t_assign, 2),
                "rows": n,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
