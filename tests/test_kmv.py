"""KMV sketch: kernel bit-identity, exact-below-k, estimator accuracy,
theta intersection/union vs known overlap."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_spark.operators.sketch import (
    kmv_estimate,
    kmv_pair_ops,
    kmv_sketch,
)


def _vals(spark, rows, schema="g string, v string"):
    return spark.createDataFrame(rows, schema)


def test_kernels_bit_identical(spark):
    rows = [(f"g{i % 3}", f"tok{(i * 7) % 40}") for i in range(500)]
    df = _vals(spark, rows)
    a = {
        r["g"]: r["hs"]
        for r in kmv_sketch(df, "v", ["g"], k=16, kernel="window").collect()
    }
    b = {
        r["g"]: r["hs"]
        for r in kmv_sketch(df, "v", ["g"], k=16, kernel="combiner").collect()
    }
    assert a == b and len(a) == 3


def test_below_k_is_exact(spark):
    df = _vals(spark, [("a", f"v{i}") for i in range(10)] * 3)
    est = kmv_estimate(kmv_sketch(df, "v", ["g"], k=64), k=64).first()
    assert est["n_sketch"] == 10
    assert not est["saturated"]
    assert est["est"] == 10.0


def test_estimator_accuracy(spark):
    n = 5000
    df = _vals(spark, [("a", f"item-{i}") for i in range(n)])
    est = kmv_estimate(kmv_sketch(df, "v", ["g"], k=256), k=256).first()
    assert est["saturated"]
    assert abs(est["est"] - n) / n < 0.15


def test_pair_intersection(spark):
    """A = 0..2999, B = 2000..4999 → |A∩B| = 1000, |A∪B| = 5000."""
    a = kmv_sketch(
        _vals(spark, [("A", f"x{i}") for i in range(3000)]), "v", ["g"], k=256
    )
    b = kmv_sketch(
        _vals(spark, [("B", f"x{i}") for i in range(2000, 5000)]),
        "v",
        ["g"],
        k=256,
    )
    r = kmv_pair_ops(a, b, k=256).first()
    assert abs(r["est_intersection"] - 1000) / 1000 < 0.35
    assert abs(r["est_union"] - 5000) / 5000 < 0.15


def test_pair_exact_when_unsaturated(spark):
    a = kmv_sketch(
        _vals(spark, [("A", f"x{i}") for i in range(30)]), "v", ["g"], k=64
    )
    b = kmv_sketch(
        _vals(spark, [("B", f"x{i}") for i in range(20, 50)]), "v", ["g"], k=64
    )
    r = kmv_pair_ops(a, b, k=64).first()
    assert r["n_inter_sample"] == 10 and r["est_intersection"] == 10.0
    assert r["n_union_sample"] == 50 and r["est_union"] == 50.0


def test_merge_rule_via_union_sketch(spark):
    """Sketching A∪B directly == merging the two sketches (mergeable-
    sketch property the snapshot/manifest story relies on)."""
    rows_a = [("u", f"x{i}") for i in range(0, 800)]
    rows_b = [("u", f"x{i}") for i in range(400, 1200)]
    direct = kmv_sketch(_vals(spark, rows_a + rows_b), "v", ["g"], k=64)
    from osm_spark.operators.sketch import _kmv_combine

    merged = (
        kmv_sketch(_vals(spark, rows_a), "v", ["g"], k=64)
        .unionByName(kmv_sketch(_vals(spark, rows_b), "v", ["g"], k=64))
        .groupBy("g")
        .agg(_kmv_combine(F.flatten(F.collect_list("hs")), 64).alias("hs"))
    )
    assert direct.first()["hs"] == merged.first()["hs"]
