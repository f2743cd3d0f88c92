"""Spatially-clustered storage: pruning, equality, skew splitting."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from osm_spark.sources.clustered import (
    read_region,
    region_cells,
    write_clustered,
)


@pytest.fixture(scope="module")
def clustered_pages(spark):
    """A pages-derived point table written clustered at level 4."""
    from osm_spark.data.pages import PagesSpec, pages_df
    from osm_spark.spatial.geoparse import geoparse_pages

    pts = geoparse_pages(
        pages_df(spark, PagesSpec(n_pages=4000, n_countries=2))
    ).select("url", "lon", "lat")
    path = tempfile.mkdtemp(prefix="clustered_")
    write_clustered(pts, path, level=4, files_per_cell=1)
    yield pts, path
    shutil.rmtree(path, ignore_errors=True)


# Country 0 rectangle is lon [-177,-169], lat [-84,-76]; this bbox
# covers its south-west quarter (includes the hot city cluster).
BBOX = (-177.0, -84.0, -173.0, -80.0)


def test_region_cells_bounds():
    # Whole world at level 0 -> the single root cell.
    assert region_cells(-180, -90, 180, 90, 0) == [0]
    # Level 4: world = 16x16 = 256 cells, all distinct.
    assert len(set(region_cells(-180, -90, 180, 90, 4))) == 256
    # A point bbox -> exactly one cell.
    assert len(region_cells(-177, -84, -177, -84, 4)) == 1


def test_read_region_matches_full_scan(spark, clustered_pages):
    pts, path = clustered_pages
    lon0, lat0, lon1, lat1 = BBOX
    got = read_region(spark, path, *BBOX).select("url").collect()
    want = pts.where(
        (F.col("lon") >= lon0) & (F.col("lon") <= lon1)
        & (F.col("lat") >= lat0) & (F.col("lat") <= lat1)
    ).select("url").collect()
    assert len(want) > 0
    assert sorted(r.url for r in got) == sorted(r.url for r in want)


def test_partition_pruning_in_plan_and_on_disk(spark, clustered_pages):
    pts, path = clustered_pages
    df = read_region(spark, path, *BBOX)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # Directory-level pruning: the cell IN-list must be a partition
    # filter, and the bbox must reach the scan as pushed filters.
    assert "PartitionFilters" in plan and "cell" in plan
    assert "PushedFilters" in plan and "lon" in plan
    # On disk the region touches strictly fewer directories than exist.
    all_dirs = [d for d in os.listdir(path) if d.startswith("cell=")]
    hit = {int(d.split("=")[1]) for d in all_dirs} & set(
        region_cells(*BBOX, 4)
    )
    assert 0 < len(hit) < len(all_dirs)


def test_pruning_never_opens_nonmatching_files(spark, clustered_pages):
    """Behavioral pruning proof: poison every parquet file in a
    directory OUTSIDE the region with garbage bytes. The pruned read
    (explicit schema, so planning opens no footers) still succeeds;
    a full scan that must read the poisoned file fails."""
    pts, path = clustered_pages
    poison_path = tempfile.mkdtemp(prefix="clustered_poison_")
    try:
        # Work on a copy so the module fixture stays intact.
        shutil.rmtree(poison_path)
        shutil.copytree(path, poison_path)
        matching = set(region_cells(*BBOX, 4))
        victim = next(
            d
            for d in os.listdir(poison_path)
            if d.startswith("cell=") and int(d.split("=")[1]) not in matching
        )
        for f in glob.glob(os.path.join(poison_path, victim, "*.parquet")):
            with open(f, "wb") as fh:
                fh.write(b"not a parquet file")
        schema = "url string, lon double, lat double, cell long"
        got = read_region(
            spark, poison_path, *BBOX, schema=schema
        ).select("url").collect()
        lon0, lat0, lon1, lat1 = BBOX
        want = pts.where(
            (F.col("lon") >= lon0) & (F.col("lon") <= lon1)
            & (F.col("lat") >= lat0) & (F.col("lat") <= lat1)
        ).select("url").collect()
        assert sorted(r.url for r in got) == sorted(r.url for r in want)
        with pytest.raises(Exception):
            spark.read.schema(schema).parquet(poison_path).select(
                "url"
            ).collect()
    finally:
        shutil.rmtree(poison_path, ignore_errors=True)


def test_files_per_cell_splits_hot_cell(spark):
    from osm_spark.data.pages import PagesSpec, pages_df
    from osm_spark.spatial.geoparse import geoparse_pages

    pts = geoparse_pages(
        pages_df(spark, PagesSpec(n_pages=4000, n_countries=2))
    ).select("url", "lon", "lat")
    path = tempfile.mkdtemp(prefix="clustered_split_")
    try:
        write_clustered(pts, path, level=4, files_per_cell=4)
        # The hot city cluster (30% of pages, one ~0.6 deg box) lands in
        # one level-4 cell; with files_per_cell=4 its directory holds
        # multiple parquet files.
        sizes = {
            d: len(glob.glob(os.path.join(path, d, "*.parquet")))
            for d in os.listdir(path)
            if d.startswith("cell=")
        }
        assert max(sizes.values()) > 1
        # Equality still holds.
        got = read_region(spark, path, *BBOX).select("url").collect()
        lon0, lat0, lon1, lat1 = BBOX
        want = pts.where(
            (F.col("lon") >= lon0) & (F.col("lon") <= lon1)
            & (F.col("lat") >= lat0) & (F.col("lat") <= lat1)
        ).select("url").collect()
        assert sorted(r.url for r in got) == sorted(r.url for r in want)
    finally:
        shutil.rmtree(path, ignore_errors=True)
