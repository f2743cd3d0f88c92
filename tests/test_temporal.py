"""operators/temporal.py — as-of join, range join, time rollup.

Edge semantics pinned here; end-to-end differential checks live in
q92-q94's DuckDB oracles (native ASOF JOIN / inequality join /
per-granularity scans — different algorithms, same rows).
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from osm_spark.operators.temporal import asof_join, range_join, time_rollup

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _ts(h):
    return T0 + timedelta(hours=h)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [
            (1, _ts(0), 100.0),
            (1, _ts(2), 102.0),
            (2, _ts(5), 200.0),
        ],
        "sym int, qts timestamp, px double",
    )


def test_asof_backward_pick(spark, quotes):
    trades = spark.createDataFrame(
        [(1, _ts(1)), (1, _ts(3)), (2, _ts(4))],
        "sym int, tts timestamp",
    )
    out = asof_join(
        trades, quotes, "tts", "qts", "sym", "sym", ["px"]
    ).orderBy("sym", "tts")
    rows = [(r["sym"], r["px"]) for r in out.collect()]
    # trade@h1 sees quote@h0; trade@h3 sees quote@h2; sym2 trade@h4
    # precedes its only quote (h5) → unmatched null.
    assert rows == [(1, 100.0), (1, 102.0), (2, None)]


def test_asof_equal_ts_matches(spark, quotes):
    trades = spark.createDataFrame([(1, _ts(2))], "sym int, tts timestamp")
    out = asof_join(trades, quotes, "tts", "qts", "sym", "sym", ["px"])
    assert out.collect()[0]["px"] == 102.0  # inclusive <= contract


def test_asof_tolerance_nulls_stale(spark, quotes):
    trades = spark.createDataFrame([(1, _ts(10))], "sym int, tts timestamp")
    loose = asof_join(trades, quotes, "tts", "qts", "sym", "sym", ["px"])
    tight = asof_join(
        trades, quotes, "tts", "qts", "sym", "sym", ["px"], tolerance_s=3600
    )
    assert loose.collect()[0]["px"] == 102.0
    row = tight.collect()[0]
    assert row["px"] is None and row["matched_qts"] is None
    # left row itself survives (left-join contract)
    assert row["sym"] == 1


def test_asof_left_rows_preserved(spark, quotes):
    trades = spark.createDataFrame(
        [(9, _ts(1))], "sym int, tts timestamp"
    )  # key with no right rows at all
    out = asof_join(trades, quotes, "tts", "qts", "sym", "sym", ["px"])
    assert out.count() == 1 and out.collect()[0]["px"] is None


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(i, _ts(i)) for i in range(8)], "pid int, ts timestamp"
    )
    # one interval [h2, h5): starts inclusive, ends exclusive
    iv = spark.createDataFrame(
        [(7, _ts(2), _ts(5))], "iid int, s timestamp, e timestamp"
    )
    out = range_join(points, iv, "ts", "s", "e", bucket="1 hour")
    assert sorted(r["pid"] for r in out.collect()) == [2, 3, 4]


def test_range_join_multibucket_no_dupes(spark):
    # Interval spanning many buckets must not multiply matches.
    points = spark.createDataFrame([(1, _ts(30))], "pid int, ts timestamp")
    iv = spark.createDataFrame(
        [(1, _ts(0), _ts(72))], "iid int, s timestamp, e timestamp"
    )
    out = range_join(points, iv, "ts", "s", "e", bucket="1 day")
    assert out.count() == 1


def test_range_join_matches_naive(spark):
    import random

    rnd = random.Random(7)
    points = spark.createDataFrame(
        [(i, _ts(rnd.uniform(0, 100))) for i in range(200)],
        "pid int, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            (j, _ts(s := rnd.uniform(0, 90)), _ts(s + rnd.uniform(0.1, 20)))
            for j in range(15)
        ],
        "iid int, s timestamp, e timestamp",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, iv, "ts", "s", "e", bucket="1 hour").collect()
    }
    want = {
        (p["pid"], w["iid"])
        for p in points.collect()
        for w in iv.collect()
        if w["s"] <= p["ts"] < w["e"]
    }
    assert got == want


def test_time_rollup_two_granularities(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), "a", 1.0), (2, _ts(0.5), "a", 2.0), (3, _ts(25), "b", 4.0)],
        "event_id long, ts timestamp, event_type string, value double",
    )
    out = time_rollup(
        ev,
        "ts",
        dims=["event_type"],
        aggs=["CAST(count(*) AS BIGINT) AS n", "CAST(sum(value) AS DOUBLE) AS sv"],
        granularities=["hour", "day"],
    )
    rows = {(r["gran"], r["bucket"], r["event_type"]): (r["n"], r["sv"])
            for r in out.collect()}
    # hour: h0 has events 1+2 (same hour? h0 and h0.5 → hours 0 and 0)
    assert rows[("hour", T0, "a")] == (2, 3.0)
    assert rows[("day", T0, "a")] == (2, 3.0)
    assert rows[("day", T0 + timedelta(days=1), "b")] == (1, 4.0)
    # exactly hour-rows + day-rows, nothing else
    assert sorted({k[0] for k in rows}) == ["day", "hour"]
