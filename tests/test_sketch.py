"""operators/sketch.py — engine-reproducible HyperLogLog + count-min."""

from collections import Counter

from pyspark.sql import functions as F

from osm_spark.operators.sketch import (
    cm_query,
    cm_sketch,
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


# --- count-min ---------------------------------------------------------


def _zipf_df(spark, n_keys=200, reps=5):
    # key i appears ceil(n_keys/ (i+1)) * reps times — a skewed multiset
    rows = []
    for i in range(n_keys):
        rows.extend([(i,)] * (reps * (n_keys // (i + 1))))
    return spark.createDataFrame(rows, "k int"), Counter(r[0] for r in rows)


def test_cm_never_underestimates_and_wide_is_exact(spark):
    df, truth = _zipf_df(spark)
    keys = df.select("k").distinct()
    # narrow sketch: collisions happen, min-of-d still never under
    est = {
        r["k"]: r["est_count"]
        for r in cm_query(cm_sketch(df, "k", d=4, w=64), keys, "k", d=4, w=64).collect()
    }
    n = sum(truth.values())
    for k, true_cnt in truth.items():
        assert est[k] >= true_cnt, (k, est[k], true_cnt)
        # CMS bound: overcount ≤ εN with ε = e/w, failure prob e^-d;
        # assert a loose 4× of the bound so the test is not flaky-shaped
        assert est[k] - true_cnt <= 4 * 2.7183 * n / 64, (k, est[k], true_cnt)
    # wide sketch: w >> n_keys·d → no collisions → exact counts
    exact = {
        r["k"]: r["est_count"]
        for r in cm_query(
            cm_sketch(df, "k", d=4, w=1 << 15), keys, "k", d=4, w=1 << 15
        ).collect()
    }
    assert exact == dict(truth)


def test_cm_merge_is_union(spark):
    a = spark.createDataFrame([(i % 7,) for i in range(300)], "k int")
    b = spark.createDataFrame([(i % 11,) for i in range(500)], "k int")
    merged = (
        cm_sketch(a, "k", d=3, w=32)
        .unionByName(cm_sketch(b, "k", d=3, w=32))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cm_sketch(a.unionByName(b), "k", d=3, w=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cm_unseen_key_and_nulls(spark):
    df = spark.createDataFrame([(1,), (None,), (1,)], "k int")
    sk = cm_sketch(df, "k", d=4, w=256)
    keys = spark.createDataFrame([(1,), (99,)], "k int")
    est = {r["k"]: r["est_count"] for r in cm_query(sk, keys, "k", d=4, w=256).collect()}
    assert est[1] == 2
    # unseen key: could collide, but with w=256 and one live key the
    # chance all 4 rows collide is (1/256)^4 — assert the exact 0
    assert est[99] == 0


# --- grouped HLL --------------------------------------------------------


def test_hll_by_group_matches_per_group_global(spark):
    # each group's (estimate, v_zero, n_registers) must equal what the
    # GLOBAL sketch computes on that group's rows alone — same
    # arithmetic, grouped plan
    df = spark.createDataFrame(
        [(i % 3, i // 3) for i in range(9000)], "g int, k int"
    )
    by = {
        r["g"]: (r["estimate"], r["v_zero"], r["n_registers"])
        for r in __import__("osm_spark.operators.sketch", fromlist=["x"])
        .hll_distinct_by(df, "g", "k")
        .collect()
    }
    from osm_spark.operators.sketch import hll_distinct

    for g in (0, 1, 2):
        row = hll_distinct(df.where(F.col("g") == g), "k").collect()[0]
        assert by[g] == (row["estimate"], row["v_zero"], row["n_registers"])


def test_hll_by_group_accuracy(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5000)] + [("b", i) for i in range(700)],
        "g string, k int",
    )
    from osm_spark.operators.sketch import hll_distinct_by

    est = {r["g"]: r["estimate"] for r in hll_distinct_by(df, "g", "k").collect()}
    assert abs(est["a"] - 5000) / 5000 < 0.065
    assert abs(est["b"] - 700) / 700 < 0.065


# ---------------------------------------------------------------------------
# histogram sketch / mergeable approximate quantiles
# ---------------------------------------------------------------------------


def _hist_py(vals, lo, hi, n_bins):
    out = Counter()
    for x in vals:
        b = (x - lo) * n_bins // (hi - lo)
        out[min(max(b, 0), n_bins - 1)] += 1
    return dict(out)


def _quant_py(vals, q_ppm, lo, hi, n_bins):
    hist = _hist_py(vals, lo, hi, n_bins)
    total = sum(hist.values())
    r = q_ppm * (total - 1) // 1_000_000
    cum = 0
    for b in sorted(hist):
        cum += hist[b]
        if cum > r:
            return b, lo * n_bins + b * (hi - lo)
    raise AssertionError("rank not reached")


def test_hist_sketch_matches_twin_and_invariance(spark):
    import random

    from osm_spark.operators.sketch import hist_quantiles, hist_sketch

    rng = random.Random(5)
    vals = [rng.randrange(-50, 1200) for _ in range(5000)]  # incl. clamps
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    lo, hi, nb = 0, 1024, 64
    got = {
        r["bin"]: r["n"] for r in hist_sketch(df, "x", lo, hi, nb).collect()
    }
    assert got == _hist_py(vals, lo, hi, nb)
    got16 = {
        r["bin"]: r["n"]
        for r in hist_sketch(df.repartition(16), "x", lo, hi, nb).collect()
    }
    assert got16 == got
    qs = [10_000, 250_000, 500_000, 750_000, 990_000]
    sk = hist_sketch(df, "x", lo, hi, nb)
    res = {
        r["q_ppm"]: (r["bin"], r["est_num"], r["est_den"], r["est"])
        for r in hist_quantiles(sk, qs, lo, hi, nb).collect()
    }
    for q in qs:
        b, num = _quant_py(vals, q, lo, hi, nb)
        assert res[q] == (b, num, nb, num / nb), q


def test_hist_quantile_within_one_bin_of_exact(spark):
    import random

    from osm_spark.operators.sketch import hist_quantiles, hist_sketch

    rng = random.Random(9)
    vals = sorted(rng.randrange(0, 10_000) for _ in range(4000))
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    lo, hi, nb = 0, 10_000, 200
    sk = hist_sketch(df, "x", lo, hi, nb)
    res = hist_quantiles(sk, [500_000], lo, hi, nb).collect()[0]
    exact = vals[500_000 * (len(vals) - 1) // 1_000_000]  # quantile_disc
    width = (hi - lo) / nb
    assert abs(res["est"] - exact) <= width


def test_hist_merge_is_union(spark):
    import random

    from osm_spark.operators.sketch import hist_merge, hist_sketch

    rng = random.Random(13)
    a = [rng.randrange(0, 100) for _ in range(300)]
    b = [rng.randrange(0, 100) for _ in range(500)]
    da = spark.createDataFrame([(v,) for v in a], "x long")
    db = spark.createDataFrame([(v,) for v in b], "x long")
    dall = spark.createDataFrame([(v,) for v in a + b], "x long")
    merged = {
        r["bin"]: r["n"]
        for r in hist_merge(
            hist_sketch(da, "x", 0, 100, 10), hist_sketch(db, "x", 0, 100, 10)
        ).collect()
    }
    union = {
        r["bin"]: r["n"] for r in hist_sketch(dall, "x", 0, 100, 10).collect()
    }
    assert merged == union


def test_hist_guards_and_nulls(spark):
    import pytest as _pytest

    from osm_spark.operators.sketch import hist_sketch

    df = spark.createDataFrame([(1,), (None,)], "x long")
    got = {r["bin"]: r["n"] for r in hist_sketch(df, "x", 0, 10, 5).collect()}
    assert got == {0: 1}  # null dropped
    with _pytest.raises(ValueError):
        hist_sketch(df, "x", 10, 10, 5)
    with _pytest.raises(ValueError):
        hist_sketch(df, "x", 0, 10, 0)
