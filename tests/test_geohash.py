"""Geohash encoding (spatial/cells_sql.geohash_*_expr) vs the public
standard: known external vectors + an independent bisection twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_spark.spatial.cells_sql import (
    GEOHASH_ALPHABET,
    geohash_chars_expr,
    geohash_code_expr,
)


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _geohash_py(lat, lon, precision):
    """Independent reference implementation: classic interval
    bisection (the published algorithm, no shared code with the
    engine's floor/morton form)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[5 * i : 5 * i + 5]:
            v = v * 2 + b
        out.append(GEOHASH_ALPHABET[v])
    return "".join(out)


def _got(spark, rows, precision):
    df = spark.createDataFrame(rows, "id long, lon double, lat double")
    coded = df.select(
        "id",
        geohash_code_expr(F.col("lon"), F.col("lat"), precision).alias("c"),
    )
    out = coded.select(
        "id", geohash_chars_expr(F.col("c"), precision).alias("gh")
    )
    return {r["id"]: r["gh"] for r in out.collect()}


# Published vectors: the two canonical Wikipedia geohash examples.
KNOWN = [
    (57.64911, 10.40744, "u4pruydqqvj"),
    (42.605, -5.603, "ezs42"),
]


def test_geohash_known_vectors(spark):
    for lat, lon, expected in KNOWN:
        for p in (4, len(expected)):
            got = _got(spark, [(0, lon, lat)], p)[0]
            assert got == expected[:p], (lat, lon, p, got)


def test_geohash_matches_bisection_twin(spark):
    import random

    rng = random.Random(11)
    rows = [
        (
            i,
            round(rng.uniform(-180, 180), 6),
            round(rng.uniform(-90, 90), 6),
        )
        for i in range(200)
    ]
    for p in (1, 5, 6, 7, 12):
        got = _got(spark, rows, p)
        for i, lon, lat in rows:
            assert got[i] == _geohash_py(lat, lon, p), (lon, lat, p)


def test_geohash_prefix_property_and_edges(spark):
    rows = [
        (0, 0.0, 0.0),
        (1, -180.0, -90.0),
        (2, 180.0, 90.0),  # clamps to the last cell
        (3, 179.999999, 89.999999),
    ]
    g12 = _got(spark, rows, 12)
    g5 = _got(spark, rows, 5)
    for i in range(4):
        assert g12[i][:5] == g5[i]
    assert g12[1] == "0" * 12
    assert g12[2] == "z" * 12
    assert g12[3] == _geohash_py(89.999999, 179.999999, 12)


def test_geohash_rejects_bad_precision(spark):
    with pytest.raises(ValueError):
        geohash_code_expr(F.lit(0.0), F.lit(0.0), 0)
    with pytest.raises(ValueError):
        geohash_code_expr(F.lit(0.0), F.lit(0.0), 13)
