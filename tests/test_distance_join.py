"""Radius distance join (spatial/knn_points.distance_join) vs the
naive all-pairs computation on the same int64 micro metric."""

from __future__ import annotations

import math
import numpy as np
import pytest

from osm_spark.spatial.knn_points import distance_join


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _rand_points(seed, n, lon_span=(-179.9, 179.9), lat_span=(-89.9, 89.9)):
    rng = np.random.default_rng(seed)
    lon = np.round(rng.uniform(*lon_span, n), 6)
    lat = np.round(rng.uniform(*lat_span, n), 6)
    return lon, lat


def _df(spark, lon, lat, start_id=0):
    rows = [
        (start_id + i, float(a), float(b))
        for i, (a, b) in enumerate(zip(lon, lat))
    ]
    return spark.createDataFrame(rows, "id long, lon double, lat double")


def _twin(qlon, qlat, dlon, dlat, max_d, qid0=0, did0=0):
    qx = np.round(qlon * 1e6).astype(np.int64)
    qy = np.round(qlat * 1e6).astype(np.int64)
    dx = np.round(dlon * 1e6).astype(np.int64)
    dy = np.round(dlat * 1e6).astype(np.int64)
    d_u = int(round(max_d * 1e6))
    out = set()
    for i in range(len(qx)):
        d2 = (dx - qx[i]) ** 2 + (dy - qy[i]) ** 2
        for j in np.nonzero(d2 <= d_u * d_u)[0].tolist():
            out.add((qid0 + i, did0 + j, int(d2[j])))
    return out


def _got(spark, qlon, qlat, dlon, dlat, max_d, **kw):
    res = distance_join(
        _df(spark, qlon, qlat),
        _df(spark, dlon, dlat, start_id=10_000),
        max_d,
        query_id="id",
        data_id="id",
        **kw,
    ).collect()
    return {(r["query_id"], r["data_id"], r["d2_u"]) for r in res}


def test_differential_random(spark):
    qlon, qlat = _rand_points(3, 60)
    dlon, dlat = _rand_points(4, 400)
    for max_d in (0.5, 5.0, 30.0):
        got = _got(spark, qlon, qlat, dlon, dlat, max_d)
        exp = _twin(qlon, qlat, dlon, dlat, max_d, did0=10_000)
        assert got == exp, (max_d, len(got), len(exp))


def test_differential_clustered(spark):
    # Dense blob: many qualifying pairs, several per cell.
    rng = np.random.default_rng(9)
    lon = np.round(10.0 + rng.normal(0, 0.01, 300), 6)
    lat = np.round(45.0 + rng.normal(0, 0.01, 300), 6)
    got = _got(spark, lon, lat, lon, lat, 0.01)
    exp = _twin(lon, lat, lon, lat, 0.01, did0=10_000)
    assert got == exp and len(got) > 300  # includes self-pairs


def test_boundary_inclusive(spark):
    # d2 == d_u^2 exactly must be INCLUDED (<=, not <).
    qlon, qlat = np.array([0.0]), np.array([0.0])
    dlon, dlat = np.array([0.003, 0.003001]), np.array([0.0, 0.0])
    got = _got(spark, qlon, qlat, dlon, dlat, 0.003)
    assert got == {(0, 10_000, 3000 * 3000)}


def test_antimeridian_pairs(spark):
    qlon, qlat = np.array([-179.9995]), np.array([0.0])
    dlon, dlat = np.array([179.9995, 179.0]), np.array([0.0, 0.0])
    # planar metric: the wrap pair is 359.999 degrees apart — NOT a
    # neighbor under the planar contract (matches knn_points' planar
    # ranking pin), so nothing qualifies at max_d=0.01...
    assert _got(spark, qlon, qlat, dlon, dlat, 0.01) == set()
    # ...but the disk fan-out still wraps cells, so a HUGE max_d that
    # spans the planar gap finds both, with exact planar d2.
    got = _got(spark, qlon, qlat, dlon, dlat, 360.0)
    exp = _twin(qlon, qlat, dlon, dlat, 360.0, did0=10_000)
    assert got == exp and len(got) == 2


def test_broadcast_equals_shuffle_and_explicit_level(spark):
    qlon, qlat = _rand_points(5, 40)
    dlon, dlat = _rand_points(6, 200)
    a = _got(spark, qlon, qlat, dlon, dlat, 2.0, broadcast_data=True)
    b = _got(spark, qlon, qlat, dlon, dlat, 2.0, broadcast_data=False)
    c = _got(spark, qlon, qlat, dlon, dlat, 2.0, level=9)
    assert a == b == c == _twin(qlon, qlat, dlon, dlat, 2.0, did0=10_000)


def _twin_eq(qlon, qlat, dlon, dlat, max_d, qid0=0, did0=0):
    """Equirectangular twin: lon delta scaled by round(cos(qlat)*1024),
    applied as an int64 >> 10 — the exact engine contract."""
    qx = np.round(qlon * 1e6).astype(np.int64)
    qy = np.round(qlat * 1e6).astype(np.int64)
    dx = np.round(dlon * 1e6).astype(np.int64)
    dy = np.round(dlat * 1e6).astype(np.int64)
    d_u = int(round(max_d * 1e6))
    out = set()
    for i in range(len(qx)):
        cq = int(round(math.cos(math.radians(qlat[i])) * 1024))
        lon_term = (np.abs(dx - qx[i]) * cq) >> 10
        d2 = lon_term * lon_term + (dy - qy[i]) ** 2
        for j in np.nonzero(d2 <= d_u * d_u)[0].tolist():
            out.add((qid0 + i, did0 + j, int(d2[j])))
    return out


def test_equirectangular_differential(spark):
    qlon, qlat = _rand_points(13, 50)
    dlon, dlat = _rand_points(14, 300)
    for max_d in (1.0, 10.0):
        got = _got(
            spark, qlon, qlat, dlon, dlat, max_d, metric="equirectangular"
        )
        exp = _twin_eq(qlon, qlat, dlon, dlat, max_d, did0=10_000)
        assert got == exp, (max_d, len(got), len(exp))


def test_equirectangular_equals_planar_at_equator(spark):
    # cq = 1024 exactly at lat 0 → (|Δlon|·1024) >> 10 == |Δlon|.
    qlon, qlat = _rand_points(15, 30, lat_span=(0.0, 0.0))
    dlon, dlat = _rand_points(16, 200, lat_span=(0.0, 0.0))
    a = _got(spark, qlon, qlat, dlon, dlat, 3.0, metric="planar")
    b = _got(spark, qlon, qlat, dlon, dlat, 3.0, metric="equirectangular")
    assert a == b and a


def test_equirectangular_high_latitude_widens(spark):
    # At lat 80, cos ≈ 0.17: a point 0.05° east is ~0.0087° away in
    # the geodesic metric — inside max_d=0.01 — but 0.05° away in the
    # planar metric — outside.
    qlon, qlat = np.array([10.0]), np.array([80.0])
    dlon, dlat = np.array([10.05]), np.array([80.0])
    planar = _got(spark, qlon, qlat, dlon, dlat, 0.01, metric="planar")
    geo = _got(
        spark, qlon, qlat, dlon, dlat, 0.01, metric="equirectangular"
    )
    assert planar == set()
    assert geo == _twin_eq(qlon, qlat, dlon, dlat, 0.01, did0=10_000)
    assert len(geo) == 1


def test_equirectangular_pole_full_ring(spark):
    # cq = 0 at the pole: every lon at the same lat is at distance 0.
    qlon, qlat = np.array([0.0]), np.array([89.999])
    dlon = np.array([-170.0, 45.0, 170.0])
    dlat = np.array([89.999, 89.999, 89.999])
    got = _got(
        spark, qlon, qlat, dlon, dlat, 0.001, metric="equirectangular"
    )
    exp = _twin_eq(qlon, qlat, dlon, dlat, 0.001, did0=10_000)
    assert got == exp and len(got) == 3


def test_rejects_nonpositive_radius(spark):
    with pytest.raises(ValueError):
        distance_join(
            _df(spark, np.array([0.0]), np.array([0.0])),
            _df(spark, np.array([0.0]), np.array([0.0])),
            0.0,
            query_id="id",
            data_id="id",
        )
