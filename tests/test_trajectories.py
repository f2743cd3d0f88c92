"""Spatio-temporal sessionization (spatial/trajectories.geo_sessions)
vs a pure-python twin."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from osm_spark.spatial.trajectories import geo_sessions


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


def _ts(s):
    return dt.datetime(2020, 9, 13, 12, 26, 40) + dt.timedelta(seconds=s)


_EPOCH0 = int(_ts(0).timestamp())


def _df(spark, rows):
    """rows: (key, seconds, lon, lat)"""
    return spark.createDataFrame(
        [(k, _ts(s), float(a), float(b)) for k, s, a, b in rows],
        "key string, ts timestamp, lon double, lat double",
    )


def _twin(rows, gap_s):
    by_key = {}
    for k, s, a, b in rows:
        by_key.setdefault(k, []).append(
            (s, int(round(a * 1e6)), int(round(b * 1e6)))
        )
    out = {}
    for k, seq in by_key.items():
        seq.sort()
        sess, prev = 0, None
        cur = None
        for s, xu, yu in seq:
            if prev is None or s - prev[0] > gap_s:
                sess += 1
                cur = out[(k, sess)] = {
                    "n": 0, "t0": s, "t1": s, "path": 0, "maxstep": 0,
                    "minx": xu, "maxx": xu, "miny": yu, "maxy": yu,
                }
                step = 0
            else:
                step = int(round(math.sqrt(
                    (xu - prev[1]) ** 2 + (yu - prev[2]) ** 2
                )))
            cur["n"] += 1
            cur["t1"] = s
            cur["path"] += step
            cur["maxstep"] = max(cur["maxstep"], step)
            cur["minx"] = min(cur["minx"], xu)
            cur["maxx"] = max(cur["maxx"], xu)
            cur["miny"] = min(cur["miny"], yu)
            cur["maxy"] = max(cur["maxy"], yu)
            prev = (s, xu, yu)
    return out


def _check(spark, rows, gap_s):
    got = {
        (r["key"], r["session_no"]): (
            r["n_points"],
            int(r["t_start"].timestamp()) - _EPOCH0,
            int(r["t_end"].timestamp()) - _EPOCH0,
            r["path_len_u"],
            r["max_step_u"],
            r["min_lon_u"],
            r["max_lon_u"],
            r["min_lat_u"],
            r["max_lat_u"],
        )
        for r in geo_sessions(_df(spark, rows), "key", "ts", gap_s).collect()
    }
    twin = {
        k: (
            v["n"], v["t0"], v["t1"], v["path"], v["maxstep"],
            v["minx"], v["maxx"], v["miny"], v["maxy"],
        )
        for k, v in _twin(rows, gap_s).items()
    }
    assert got == twin, (
        {k: got[k] for k in list(got)[:3]},
        {k: twin[k] for k in list(twin)[:3]},
    )
    return got


def test_gap_split_and_boundary(spark):
    rows = [
        ("a", 0, 10.0, 45.0),
        ("a", 60, 10.001, 45.0),    # gap == 60 stays (<=)
        ("a", 121, 10.002, 45.0),   # gap 61 > 60: new session
        ("b", 0, 0.0, 0.0),
    ]
    got = _check(spark, rows, gap_s=60)
    assert got[("a", 1)][0] == 2 and got[("a", 2)][0] == 1
    assert got[("b", 1)][0] == 1
    # step 0.001 deg = 1000 micro exactly
    assert got[("a", 1)][3] == 1000


def test_path_and_max_step(spark):
    rows = [
        ("t", 0, 0.0, 0.0),
        ("t", 10, 0.003, 0.004),   # step = 5000
        ("t", 20, 0.003, 0.010),   # step = 6000
    ]
    got = _check(spark, rows, gap_s=60)
    assert got[("t", 1)][3] == 11000 and got[("t", 1)][4] == 6000


def test_random_differential(spark):
    rng = np.random.default_rng(11)
    rows = []
    t = 0
    for i in range(800):
        t += int(rng.integers(1, 200))
        k = f"k{int(rng.integers(0, 13))}"
        rows.append((
            k,
            t,
            float(np.round(rng.uniform(-179, 179), 6)),
            float(np.round(rng.uniform(-89, 89), 6)),
        ))
    _check(spark, rows, gap_s=300)


def test_equirectangular_path_length(spark):
    from osm_spark.spatial.trajectories import geo_sessions as gs

    # Two east steps at lat 60 (cos = 0.5): planar step = 1000 µdeg,
    # equirect step = (1000·round(cos(60°)·1024)) >> 10 = 500.
    rows = [
        ("t", _ts(0), 10.0, 60.0),
        ("t", _ts(10), 10.001, 60.0),
        ("t", _ts(20), 10.002, 60.0),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, lon double, lat double"
    )
    planar = gs(df, "key", "ts", 60).collect()[0]
    geo = gs(df, "key", "ts", 60, metric="equirectangular").collect()[0]
    assert planar["path_len_u"] == 2000 and planar["max_step_u"] == 1000
    assert geo["path_len_u"] == 1000 and geo["max_step_u"] == 500
    # Session structure (splits, counts, bbox) is metric-independent.
    assert planar["n_points"] == geo["n_points"] == 3
    assert planar["min_lon_u"] == geo["min_lon_u"]


def test_single_point_sessions(spark):
    rows = [("x", i * 1000, float(i), 0.0) for i in range(5)]
    got = _check(spark, rows, gap_s=10)
    assert len(got) == 5
    assert all(v[0] == 1 and v[3] == 0 and v[4] == 0 for v in got.values())


def test_haversine_path_length(spark):
    """Chord-metric steps: exact vs a numpy twin, and the trans-polar
    step where the equirectangular µdeg delta wildly overestimates —
    (89.9N, 0) → (89.9N, 180) is ~0.2° of arc over the pole, not 180°
    of longitude."""
    import math

    from osm_spark.spatial.trajectories import geo_sessions as gs

    rows = [
        ("t", _ts(0), 0.0, 89.9),
        ("t", _ts(10), 180.0, 89.9),
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, lon double, lat double"
    )
    hav = gs(df, "key", "ts", 60, metric="haversine").collect()[0]
    eq = gs(df, "key", "ts", 60, metric="equirectangular").collect()[0]

    def sphere(lon, lat):
        rl, rp = math.radians(lon), math.radians(lat)
        s = 1e7
        return (
            round(math.cos(rp) * math.cos(rl) * s),
            round(math.cos(rp) * math.sin(rl) * s),
            round(math.sin(rp) * s),
        )

    a, b = sphere(0.0, 89.9), sphere(180.0, 89.9)
    want = round(math.sqrt(sum((u - v) ** 2 for u, v in zip(a, b))))
    assert hav["path_len_u"] == want == hav["max_step_u"]
    # 0.2° of arc ≈ 34,907 sphere units; the equirect µdeg length of
    # the same step is ~ 0.17 cos-scaled degrees of pure lon = 321k+
    # µdeg — a ~9× overestimate in its own unit, and the ORDERING of
    # this step vs a plain 1°-south step flips between the metrics.
    assert hav["path_len_u"] < 40_000
    assert eq["path_len_u"] > 300_000
