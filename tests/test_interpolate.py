"""IDW interpolation (spatial/interpolate.idw_interpolate) vs a naive
python twin on the same exact-integer weight contract."""

from __future__ import annotations

import numpy as np
import pytest

from osm_spark.spatial.interpolate import idw_interpolate
from osm_spark.spatial.knn_points import distance_join


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _rand(seed, n, lon_span=(-20.0, 20.0), lat_span=(-20.0, 20.0)):
    rng = np.random.default_rng(seed)
    lon = np.round(rng.uniform(*lon_span, n), 6)
    lat = np.round(rng.uniform(*lat_span, n), 6)
    return lon, lat


def _qdf(spark, lon, lat):
    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(zip(lon, lat))]
    return spark.createDataFrame(rows, "id long, lon double, lat double")


def _sdf(spark, lon, lat, vals):
    rows = [
        (10_000 + i, float(a), float(b), int(v))
        for i, (a, b, v) in enumerate(zip(lon, lat, vals))
    ]
    return spark.createDataFrame(
        rows, "id long, lon double, lat double, val long"
    )


def _twin(qlon, qlat, dlon, dlat, vals, max_d, scale=1 << 30, shift=None,
          min_samples=1):
    """Naive all-pairs IDW with the exact integer weight formula."""
    qx = np.round(qlon * 1e6).astype(np.int64)
    qy = np.round(qlat * 1e6).astype(np.int64)
    dx = np.round(dlon * 1e6).astype(np.int64)
    dy = np.round(dlat * 1e6).astype(np.int64)
    d_u = int(round(max_d * 1e6))
    if shift is None:
        shift = max(0, (d_u * d_u).bit_length() - 20)
    out = {}
    for i in range(len(qx)):
        d2 = (dx - qx[i]) ** 2 + (dy - qy[i]) ** 2
        idx = np.nonzero(d2 <= d_u * d_u)[0]
        if len(idx) < min_samples:
            continue
        w_sum = wv_sum = 0
        for j in idx.tolist():
            w = scale // (1 + (int(d2[j]) >> shift))
            w_sum += w
            wv_sum += w * int(vals[j])
        if w_sum > 0:
            out[i] = (len(idx), w_sum, wv_sum, wv_sum / w_sum)
    return out


def _got(spark, qlon, qlat, dlon, dlat, vals, max_d, **kw):
    res = idw_interpolate(
        _qdf(spark, qlon, qlat),
        _sdf(spark, dlon, dlat, vals),
        "val",
        max_d,
        query_id="id",
        data_id="id",
        **kw,
    ).collect()
    return {
        r["query_id"]: (
            r["n_samples"], r["w_sum"], r["wv_sum"], r["idw_value"]
        )
        for r in res
    }


def test_idw_differential_random(spark):
    qlon, qlat = _rand(21, 40)
    dlon, dlat = _rand(22, 250)
    vals = np.arange(250) * 7 + 3
    for max_d in (0.5, 3.0):
        got = _got(spark, qlon, qlat, dlon, dlat, vals, max_d)
        exp = _twin(qlon, qlat, dlon, dlat, vals, max_d)
        assert got == exp, (max_d, len(got), len(exp))
        assert exp  # non-vacuous


def test_idw_exact_hit_gets_max_weight(spark):
    # A sample exactly at the query point: w = scale (d2=0), so the
    # estimate is pulled hard toward its value but stays finite.
    qlon, qlat = np.array([5.0]), np.array([5.0])
    dlon = np.array([5.0, 5.001])
    dlat = np.array([5.0, 5.0])
    vals = np.array([100, 900])
    got = _got(spark, qlon, qlat, dlon, dlat, vals, 0.01)
    exp = _twin(qlon, qlat, dlon, dlat, vals, 0.01)
    assert got == exp
    n, w_sum, wv_sum, v = got[0]
    assert n == 2 and 100 < v < 150  # dominated by the exact hit


def test_idw_min_samples_and_miss_drop(spark):
    # Query 0 has 2 neighbors, query 1 has 1, query 2 has none.
    qlon = np.array([0.0, 1.0, 50.0])
    qlat = np.array([0.0, 1.0, 50.0])
    dlon = np.array([0.001, -0.001, 1.001])
    dlat = np.array([0.0, 0.0, 1.0])
    vals = np.array([10, 20, 30])
    got1 = _got(spark, qlon, qlat, dlon, dlat, vals, 0.01)
    assert set(got1) == {0, 1}
    got2 = _got(spark, qlon, qlat, dlon, dlat, vals, 0.01, min_samples=2)
    assert set(got2) == {0}
    assert got2[0] == _twin(
        qlon, qlat, dlon, dlat, vals, 0.01, min_samples=2
    )[0]


def test_idw_broadcast_equals_shuffle_and_level(spark):
    qlon, qlat = _rand(23, 25)
    dlon, dlat = _rand(24, 150)
    vals = (np.arange(150) % 17) * 11
    a = _got(spark, qlon, qlat, dlon, dlat, vals, 2.0, broadcast_data=True)
    b = _got(spark, qlon, qlat, dlon, dlat, vals, 2.0, broadcast_data=False)
    c = _got(spark, qlon, qlat, dlon, dlat, vals, 2.0, level=8)
    assert a == b == c == _twin(qlon, qlat, dlon, dlat, vals, 2.0)


def test_idw_equirectangular(spark):
    # High latitude: the geodesic disk reaches farther in lon, so the
    # neighbor sets (and the estimates) genuinely differ from planar.
    rng = np.random.default_rng(25)
    qlon = np.round(rng.uniform(9.5, 10.5, 10), 6)
    qlat = np.round(rng.uniform(79.9, 80.1, 10), 6)
    dlon = np.round(rng.uniform(9.0, 11.0, 120), 6)
    dlat = np.round(rng.uniform(79.8, 80.2, 120), 6)
    vals = np.arange(120) + 1
    import math

    def twin_eq(max_d, scale=1 << 30):
        qx = np.round(qlon * 1e6).astype(np.int64)
        qy = np.round(qlat * 1e6).astype(np.int64)
        dx = np.round(dlon * 1e6).astype(np.int64)
        dy = np.round(dlat * 1e6).astype(np.int64)
        d_u = int(round(max_d * 1e6))
        shift = max(0, (d_u * d_u).bit_length() - 20)
        out = {}
        for i in range(len(qx)):
            cq = int(round(math.cos(math.radians(qlat[i])) * 1024))
            lt = (np.abs(dx - qx[i]) * cq) >> 10
            d2 = lt * lt + (dy - qy[i]) ** 2
            idx = np.nonzero(d2 <= d_u * d_u)[0]
            w_sum = wv_sum = 0
            for j in idx.tolist():
                w = scale // (1 + (int(d2[j]) >> shift))
                w_sum += w
                wv_sum += w * int(vals[j])
            if w_sum > 0:
                out[i] = (len(idx), w_sum, wv_sum, wv_sum / w_sum)
        return out

    got = _got(
        spark, qlon, qlat, dlon, dlat, vals, 0.05, metric="equirectangular"
    )
    assert got == twin_eq(0.05) and got
    planar = _got(spark, qlon, qlat, dlon, dlat, vals, 0.05)
    assert got != planar  # the metric matters at lat 80


def test_idw_pure_catalyst_plan(spark):
    # The whole pipeline must stay JVM-side: no Python eval nodes.
    qlon, qlat = _rand(26, 5)
    dlon, dlat = _rand(27, 20)
    df = idw_interpolate(
        _qdf(spark, qlon, qlat),
        _sdf(spark, dlon, dlat, np.arange(20)),
        "val",
        1.0,
        query_id="id",
        data_id="id",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_distance_join_data_cols_clash_rejected(spark):
    with pytest.raises(ValueError, match="collide"):
        distance_join(
            _qdf(spark, np.array([0.0]), np.array([0.0])),
            _sdf(spark, np.array([0.0]), np.array([0.0]), [1]).withColumnRenamed(
                "val", "cell"
            ),
            0.01,
            query_id="id",
            data_id="id",
            data_cols=("cell",),
        )


def test_idw_rejects_bad_scale(spark):
    with pytest.raises(ValueError):
        idw_interpolate(
            _qdf(spark, np.array([0.0]), np.array([0.0])),
            _sdf(spark, np.array([0.0]), np.array([0.0]), [1]),
            "val",
            0.01,
            scale=0,
            query_id="id",
            data_id="id",
        )
