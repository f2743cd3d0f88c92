import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(
        app_name="tests", master="local[8]", shuffle_partitions=8
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def world(spark):
    """1-country mini-world pipeline outputs (shared across tests)."""
    from osm_spark.data.worldgen import WorldSpec, world_dataframes
    from osm_spark.plans.pipeline import run_boundaries_pipeline

    nodes, ways, rels, cfg = world_dataframes(spark, WorldSpec(n_countries=1))
    out = run_boundaries_pipeline(spark, nodes, ways, rels, cfg)
    out["nodes"], out["ways"], out["relations"], out["cfg"] = nodes, ways, rels, cfg
    out["locations"] = out["locations"].persist()
    out["kept"] = out["kept"].persist()
    out["boundaries"] = out["boundaries"].persist()
    out["centroids"] = out["centroids"].persist()
    out["errors"] = out["errors"].persist()
    return out
