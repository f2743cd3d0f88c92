"""operators/quantiles.py — exact two-phase rank-select quantiles."""

import math
import random

from osm_spark.operators.quantiles import exact_quantiles


def expected_disc(vals, q):
    s = sorted(vals)
    return s[max(1, math.ceil(q * len(s))) - 1]


def test_matches_sorted_reference(spark):
    rnd = random.Random(3)
    vals = [rnd.uniform(-100, 100) for _ in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "x", qs).collect()}
    for q in qs:
        assert got[q] == expected_disc(vals, q), q


def test_ties_and_duplicates(spark):
    vals = [1.0] * 100 + [2.0] * 5 + [3.0] * 100
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "x", [0.25, 0.5, 0.75]).collect()
    }
    assert got == {
        q: expected_disc(vals, q) for q in (0.25, 0.5, 0.75)
    }


def test_nulls_excluded_and_empty(spark):
    df = spark.createDataFrame(
        [(None,), (5.0,), (None,), (1.0,)], "x double"
    )
    got = {r["q"]: r["value"] for r in exact_quantiles(df, "x", [0.5]).collect()}
    assert got == {0.5: 1.0}  # rank max(1, ceil(.5*2)) = 1
    empty = spark.createDataFrame([], "x double")
    assert exact_quantiles(empty, "x", [0.5]).count() == 0


def test_integer_column_keeps_type(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 11)], "x long")
    out = exact_quantiles(df, "x", [0.5])
    assert dict(out.dtypes)["value"] == "bigint"
    assert out.collect()[0]["value"] == 5


def test_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    got = exact_quantiles(df, "x", [1.0], num_partitions=16).collect()
    assert got[0]["value"] == 2.0
