"""Spatio-temporal co-occurrence join (osm_spark/spatial/st_join.py):
brute-force differential plus predicate-boundary and invariance pins.
"""

from __future__ import annotations

import datetime
import hashlib

import pytest

from osm_spark.spatial.st_join import st_cooccur_join


def _events(n=120):
    out = []
    for i in range(n):
        h = hashlib.md5(f"st-{i}".encode()).hexdigest()
        x = int(h[:6], 16) % 4_000_001 - 2_000_000
        y = int(h[6:12], 16) % 4_000_001 - 2_000_000
        ts = 1_600_000_000 + int(h[12:17], 16) % 7200
        out.append((i, ts, x, y))
    return out


def _brute(rows, d_u, dt_s):
    out = {}
    for ia, ta, xa, ya in rows:
        for ib, tb, xb, yb in rows:
            if ia >= ib:
                continue
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= d_u * d_u and abs(tb - ta) <= dt_s:
                out[(ia, ib)] = (d2, tb - ta)
    return out


@pytest.fixture(scope="module")
def ev_df(spark):
    rows = _events()
    df = spark.createDataFrame(
        [
            (
                i,
                datetime.datetime.utcfromtimestamp(ts),
                x / 1e6,
                y / 1e6,
            )
            for i, ts, x, y in rows
        ],
        "event_id long, ts timestamp, lon double, lat double",
    )
    return rows, df


@pytest.mark.parametrize("max_d,dt", [(0.5, 900), (1.5, 3600)])
def test_matches_brute_force(ev_df, max_d, dt):
    rows, df = ev_df
    want = _brute(rows, int(round(max_d * 1e6)), dt)
    got = {
        (r["id_a"], r["id_b"]): (r["d2_u"], r["dt_s"])
        for r in st_cooccur_join(df, max_d, dt).collect()
    }
    assert got == want and len(want) > 0


def test_time_boundary_inclusive(spark):
    rows = [
        (1, datetime.datetime(2020, 1, 1, 0, 0, 0), 0.0, 0.0),
        (2, datetime.datetime(2020, 1, 1, 0, 5, 0), 0.0001, 0.0),
        (3, datetime.datetime(2020, 1, 1, 0, 5, 1), 0.0002, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, lon double, lat double"
    )
    got = {
        (r["id_a"], r["id_b"]): r["dt_s"]
        for r in st_cooccur_join(df, 1.0, 300).collect()
    }
    # 1-2 at exactly 300 s kept; 1-3 at 301 s dropped; 2-3 at 1 s kept
    assert got == {(1, 2): 300, (2, 3): 1}


def test_broadcast_equals_shuffle(ev_df):
    rows, df = ev_df
    a = sorted(map(tuple, st_cooccur_join(df, 0.5, 900, broadcast_data=True).collect()))
    b = sorted(map(tuple, st_cooccur_join(df, 0.5, 900, broadcast_data=False).collect()))
    assert a == b and len(a) > 0


def test_string_ids_work(spark):
    t0 = datetime.datetime(2020, 1, 1)
    df = spark.createDataFrame(
        [
            ("a", t0, 0.0, 0.0),
            ("b", t0 + datetime.timedelta(seconds=30), 0.0001, 0.0),
        ],
        "event_id string, ts timestamp, lon double, lat double",
    )
    out = st_cooccur_join(df, 1.0, 60).collect()
    assert [(r["id_a"], r["id_b"], r["d2_u"], r["dt_s"]) for r in out] == [
        ("a", "b", 100**2, 30)
    ]
