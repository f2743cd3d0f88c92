"""operators/sketch.py — engine-reproducible HyperLogLog."""

from pyspark.sql import functions as F

from osm_spark.operators.sketch import (
    hll_distinct,
    hll_estimate,
    hll_estimate_py,
    hll_sketch,
)


def test_accuracy_within_hll_bounds(spark):
    # p=12 → standard error 1.04/sqrt(4096) ≈ 1.6%; assert 4 sigma
    for n in (500, 20_000):
        df = spark.range(n).select(F.col("id").alias("k"))
        est = hll_distinct(df, "k", p=12).collect()[0]["estimate"]
        assert abs(est - n) / n < 0.065, (n, est)


def test_matches_python_twin(spark):
    df = spark.range(3000).select(F.col("id").alias("k"))
    sketch = {r["register"]: r["max_rank"] for r in hll_sketch(df, "k").collect()}
    spark_est = hll_distinct(df, "k").collect()[0]["estimate"]
    assert spark_est == hll_estimate_py(sketch)


def test_small_range_correction_branch(spark):
    # 50 distinct keys in 4096 registers: E_raw << 2.5m and V > 0 →
    # the linear-counting branch must fire and stay accurate
    df = spark.range(50).select(F.col("id").alias("k"))
    row = hll_distinct(df, "k").collect()[0]
    assert row["v_zero"] >= 4096 - 50
    assert abs(row["estimate"] - 50) < 5


def test_sketches_merge(spark):
    a = spark.range(0, 5000).select(F.col("id").alias("k"))
    b = spark.range(2500, 8000).select(F.col("id").alias("k"))
    merged = (
        hll_sketch(a, "k")
        .unionByName(hll_sketch(b, "k"))
        .groupBy("register")
        .agg(F.max("max_rank").alias("max_rank"))
    )
    est_merged = hll_estimate(merged).collect()[0]["estimate"]
    est_union = hll_distinct(
        a.unionByName(b), "k"
    ).collect()[0]["estimate"]
    assert est_merged == est_union  # merge is EXACTLY union's sketch


def test_duplicates_and_nulls(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (2,)], "k int"
    )
    row = hll_distinct(df, "k").collect()[0]
    assert abs(row["estimate"] - 2) < 1
