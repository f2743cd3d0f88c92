"""Exact systematic PPS sampling (osm_spark/text/pps.py) vs a python
twin, with the Σ mult = m invariant and degenerate-path pins."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_spark.text.pps import pps_sample


def _twin(rows, m):
    rows = sorted(rows)
    W = sum(w for _, w in rows)

    def count(x):
        a = 2 * m * x - W
        if a <= 0:
            return 0
        return min(m, (a + 2 * W - 1) // (2 * W))

    out, c = {}, 0
    for i, w in rows:
        mult = count(c + w) - count(c)
        if mult > 0:
            out[i] = (w, mult)
        c += w
    return out


def _rows(n=200):
    return [
        (i, int(hashlib.md5(f"pps-{i}".encode()).hexdigest()[:4], 16) % 500)
        for i in range(n)
    ]


@pytest.mark.parametrize("m", [1, 7, 50, 199])
def test_matches_twin_and_sum(spark, m):
    rows = _rows()
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    got = {
        r["doc_id"]: (r["weight"], r["mult"])
        for r in pps_sample(df.repartition(7), m).collect()
    }
    want = _twin(rows, m)
    assert got == want
    assert sum(mu for _, mu in got.values()) == m


def test_heavy_row_takes_multiple_slots(spark):
    rows = [(0, 5), (1, 10_000), (2, 5)]  # row 1 owns ~all the mass
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    got = {r["doc_id"]: r["mult"] for r in pps_sample(df, 10).collect()}
    assert got == _twin_mults(rows, 10)
    assert got[1] >= 9


def _twin_mults(rows, m):
    return {i: mu for i, (_w, mu) in _twin(rows, m).items()}


def test_zero_weights_never_selected(spark):
    rows = [(0, 0), (1, 100), (2, 0), (3, 100)]
    df = spark.createDataFrame(rows, "doc_id long, weight long")
    got = {r["doc_id"]: r["mult"] for r in pps_sample(df, 6).collect()}
    assert set(got) <= {1, 3} and sum(got.values()) == 6
    assert got == _twin_mults(rows, 6)


def test_all_zero_weights_empty(spark):
    df = spark.createDataFrame([(0, 0), (1, 0)], "doc_id long, weight long")
    assert pps_sample(df, 5).collect() == []


def test_guards(spark):
    df = spark.createDataFrame([(0, 1)], "doc_id long, weight long")
    with pytest.raises(ValueError):
        pps_sample(df, 0)
    big = spark.createDataFrame([(0, 1 << 61)], "doc_id long, weight long")
    with pytest.raises(ValueError, match="overflow"):
        pps_sample(big, 4)
    neg = spark.createDataFrame([(0, -1)], "doc_id long, weight long")
    with pytest.raises(Exception, match="negative weight"):
        pps_sample(neg, 2).collect()
