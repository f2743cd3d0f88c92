"""Incremental PIP enrichment (plans/incremental.py): assignments
maintained over manifest-table appends == full recompute, with
idempotent re-runs and a rewrite guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _rect(x0, y0, x1, y1):
    return [
        [float(x0), float(y0)],
        [float(x1), float(y0)],
        [float(x1), float(y1)],
        [float(x0), float(y1)],
        [float(x0), float(y0)],
    ]


@pytest.fixture(scope="module")
def index_bc(spark):
    from osm_spark.spatial.covering import build_polygon_cells, polygon_geometry
    from osm_spark.spatial.pip_index import build_pip_index

    locs = spark.createDataFrame(
        [(1, [[_rect(0, 0, 10, 10)]]), (2, [[_rect(20, 0, 30, 10)]])],
        "rel_id long, shape array<array<array<array<double>>>>",
    )
    pcells = build_polygon_cells(locs, min_level=2, max_level=8)
    return spark.sparkContext.broadcast(
        build_pip_index(pcells, polygon_geometry(locs))
    )


def _pages(spark, start, n):
    """n pages with deterministic µdeg coords cycling through rel 1,
    rel 2, and the gap between them (no assignment)."""
    rows = []
    for i in range(start, start + n):
        lon_u = [5_000_000, 25_000_000, 15_000_000][i % 3] + i * 13
        rows.append(
            (
                f"https://x.test/p/{i}",
                f"doc {i} geo: {2_000_000 + i * 7},{lon_u} tail",
            )
        )
    return spark.createDataFrame(rows, "url string, text string")


def _full_expected(spark, index_bc, total):
    from osm_spark.spatial.geoparse import geoparse_pages
    from osm_spark.spatial.pip_index import pip_join_index

    pts = geoparse_pages(_pages(spark, 0, total)).withColumn(
        "point_id", F.xxhash64("url")
    )
    return sorted(
        (r["url"], r["rel_id"])
        for r in pip_join_index(
            pts.select("point_id", "lon", "lat", "url"),
            index_bc,
            keep=("url",),
        )
        .select("url", "rel_id")
        .collect()
    )


def test_pip_increment_matches_full_recompute(spark, tmp_path, index_bc):
    from osm_spark.plans.incremental import pip_increment
    from osm_spark.sources.manifest_table import ManifestTable

    src = ManifestTable(spark, str(tmp_path / "pages"))
    src.write(_pages(spark, 0, 60), mode="overwrite")
    out_path = str(tmp_path / "assign")

    r1 = pip_increment(spark, src, out_path, index_bc)
    assert r1["applied_from"] is None and r1["applied_to"] == 1

    out = ManifestTable(spark, out_path)
    got = sorted(
        (r["url"], r["rel_id"])
        for r in out.read().where(F.col("url") != "").collect()
    )
    assert got == _full_expected(spark, index_bc, 60) and got

    # append an increment: only the new files are processed, result
    # equals the full recompute over everything
    src.write(_pages(spark, 60, 40), mode="append")
    r2 = pip_increment(spark, src, out_path, index_bc)
    assert (r2["applied_from"], r2["applied_to"]) == (1, 2)
    got2 = sorted(
        (r["url"], r["rel_id"])
        for r in out.read().where(F.col("url") != "").collect()
    )
    assert got2 == _full_expected(spark, index_bc, 100)
    assert len(got2) > len(got)

    # idempotent re-run: marker says version 2 applied → no-op
    before = out.current_version()
    r3 = pip_increment(spark, src, out_path, index_bc)
    assert r3["applied_from"] == r3["applied_to"] == 2
    assert out.current_version() == before

    # time travel: version 1 of the assignment table is the v1 slice
    v1 = sorted(
        (r["url"], r["rel_id"])
        for r in out.read(1).where(F.col("url") != "").collect()
    )
    assert v1 == got


def test_pip_increment_rejects_rewrites(spark, tmp_path, index_bc):
    from osm_spark.plans.incremental import pip_increment
    from osm_spark.sources.manifest_table import ManifestTable

    src = ManifestTable(spark, str(tmp_path / "pages_rw"))
    src.write(_pages(spark, 0, 20), mode="overwrite")
    out_path = str(tmp_path / "assign_rw")
    pip_increment(spark, src, out_path, index_bc)
    # source rewritten (overwrite) — not an append: must refuse
    src.write(_pages(spark, 5, 20), mode="overwrite")
    with pytest.raises(ValueError, match="rebuild"):
        pip_increment(spark, src, out_path, index_bc)
