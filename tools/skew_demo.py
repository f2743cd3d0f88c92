"""Measured hot-cell skew demo for SCALE.md §skew (VERDICT r3 next #9).

Runs the catalyst PIP join in its SHUFFLE mode (broadcast_cells=False —
the only mode with reduce partitioning to skew) over the deliberately
skewed pages table (30% of pages in one city cell) three ways:

    A. AQE skew-split OFF, salt=1        (the unprotected baseline)
    B. AQE skew-split OFF, salt=auto     (choose_salt picks the factor)
    C. AQE skew-split ON,  salt=1        (the runtime layer on its own)

and reports wall time plus the max/median task duration of the heaviest
shuffle-read stage (from the Spark REST API) — the straggler metric
salting is supposed to bound.

Usage: python tools/skew_demo.py [n_pages] [reps]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def stage_task_stats(spark):
    """(max_task_ms, median_task_ms, stage_id, n_tasks) of the completed
    stage with the LARGEST SHUFFLE READ — i.e. the cell-join reduce
    stage, the one a hot cell skews. (Picking by max task duration
    instead grabs unrelated world-build stages.)"""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=COMPLETE"
    ) as r:
        stages = json.load(r)
    target = max(stages, key=lambda s: s.get("shuffleReadBytes", 0))
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages/{target['stageId']}/"
        f"{target['attemptId']}/taskSummary?quantiles=0.5,1.0"
    ) as r:
        q = json.load(r)
    return (
        q["duration"][1],
        q["duration"][0],
        target["stageId"],
        target["numCompleteTasks"],
    )


def run_leg(n_pages: int, skew_join: bool, salt) -> dict:
    """One fresh Spark session per leg so REST stage stats are scoped."""
    from pyspark.sql import functions as F

    from osm_spark.data.pages import PagesSpec, pages_df
    from osm_spark.data.worldgen import WorldSpec, world_dataframes
    from osm_spark.plans.pipeline import run_boundaries_pipeline
    from osm_spark.session import get_spark
    from osm_spark.spatial.covering import build_polygon_cells, polygon_geometry
    from osm_spark.spatial.geoparse import geoparse_pages
    from osm_spark.spatial.pip_join import pip_join

    spark = get_spark(
        app_name=f"skew-{skew_join}-{salt}", master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4055",
            # The demo models the planet case where the cell dimension
            # EXCEEDS broadcast size — without this, Catalyst broadcasts
            # the tiny test covering and no reduce stage exists to skew.
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # Fixed 64 reduce tasks: with AQE coalescing on, merged
            # light partitions change task counts between legs and the
            # max/median comparison stops being apples-to-apples.
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
    try:
        nodes, ways, rels, cfg = world_dataframes(spark, WorldSpec(n_countries=1))
        out = run_boundaries_pipeline(spark, nodes, ways, rels, cfg)
        # max_level=8 (1.4 deg cells): the 0.6 deg hot city box lands in
        # ONE covering cell, i.e. one genuinely hot JOIN KEY (at 11 the
        # box spreads over ~16 keys and nothing skews at the key level).
        pcells = build_polygon_cells(out["locations"], 4, 8).persist()
        pcells.count()
        pgeom = polygon_geometry(out["locations"]).persist()
        pgeom.count()
        pages = pages_df(spark, PagesSpec(n_pages=n_pages, n_countries=1))
        pts = (
            geoparse_pages(pages)
            .select(F.xxhash64("url").alias("point_id"), "lon", "lat")
            .persist()
        )
        pts.count()  # materialize input once; the timed leg is the join
        if salt == "auto":
            from osm_spark.spatial.pip_join import choose_salt

            salt = choose_salt(
                pts, pcells, target_rows_per_task=100_000, sample_mod=20
            )
            print(f"choose_salt -> {salt}", flush=True)
        t0 = time.time()
        n = pip_join(
            pts, pcells, pgeom, salt=salt, broadcast_cells=False
        ).count()
        wall = time.time() - t0
        mx, med, sid, ntasks = stage_task_stats(spark)
        return {
            "skew_join": skew_join,
            "salt": salt,
            "rows": n,
            "wall_s": round(wall, 2),
            "max_task_ms": mx,
            "median_task_ms": med,
            "stage": sid,
            "n_tasks": ntasks,
        }
    finally:
        spark.stop()


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    legs = [(False, 1), (False, "auto"), (True, 1)]
    results = []
    for _ in range(reps):
        for skew_join, salt in legs:
            r = run_leg(n_pages, skew_join, salt)
            print(json.dumps(r), flush=True)
            results.append(r)
    # min-of-reps per leg on wall time, max-task from the same rep
    best = {}
    for r in results:
        k = (r["skew_join"], str(r["salt"]))
        if k not in best or r["wall_s"] < best[k]["wall_s"]:
            best[k] = r
    print(json.dumps({"n_pages": n_pages, "best": list(best.values())}))


if __name__ == "__main__":
    main()
