"""operators/bloom.py — bloom-filter join pruning."""

from pyspark.sql import functions as F

from osm_spark.operators.bloom import bloom_build, bloom_prune

_NB, _K = 1 << 12, 5


def test_no_false_negatives_and_bounded_fp(spark):
    build = spark.range(0, 300).select(F.col("id").alias("k"))
    probe = spark.range(0, 3000).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", n_bits=_NB, k=_K)
    kept = {r["k"] for r in bloom_prune(probe, "k", bloom, n_bits=_NB, k=_K).collect()}
    # structural: every inserted key survives
    assert set(range(300)) <= kept
    # fp rate: (1 - e^{-kn/m})^k ≈ (1 - e^{-5*300/4096})^5 ≈ 0.2%;
    # assert a loose 10× so the test is not flaky-shaped
    fps = len(kept) - 300
    assert fps / 2700 < 0.02, fps


def test_merge_is_union(spark):
    a = spark.range(0, 200).select(F.col("id").alias("k"))
    b = spark.range(150, 400).select(F.col("id").alias("k"))
    merged = (
        bloom_build(a, "k", n_bits=_NB, k=_K)
        .unionByName(bloom_build(b, "k", n_bits=_NB, k=_K))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    direct = bloom_build(a.unionByName(b), "k", n_bits=_NB, k=_K)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_probe_keeps_row_payload_and_drops_nulls(spark):
    build = spark.createDataFrame([(1,), (2,)], "k int")
    probe = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "c"), (None, "d")], "k int, v string"
    )
    bloom = bloom_build(build, "k", n_bits=_NB, k=_K)
    out = bloom_prune(probe, "k", bloom, n_bits=_NB, k=_K).collect()
    got = {(r["k"], r["v"]) for r in out}
    assert (1, "a") in got and (2, "b") in got
    # null probe keys hash to null → fail the conjunction → dropped
    # (matches inner-join semantics the pruned join would apply anyway)
    assert all(r["k"] is not None for r in out)


def test_probe_plan_is_broadcast_and_python_free(spark):
    build = spark.range(0, 50).select(F.col("id").alias("k"))
    probe = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k", n_bits=_NB, k=_K)
    plan = bloom_prune(probe, "k", bloom, n_bits=_NB, k=_K)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == _K
    assert "SortMergeJoin" not in plan
    # the only hash exchanges are the bloom BUILD's tiny groupBy(word)
    # inside the broadcast subtrees (shown as an internal
    # _groupingexpression alias) — the probe side never shuffles
    assert plan.count("Exchange hashpartitioning") == plan.count(
        "Exchange hashpartitioning(_groupingexpression"
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_bloom_persists_in_manifest_table_and_merges_by_or(spark, tmp_path):
    """The per-shard lifecycle the docstring claims: build a filter per
    ingest batch, append each word table to a ManifestTable, and OR the
    full table back into the union filter — identical to building over
    the union directly, and time travel reaches the batch-1-only
    filter."""
    from osm_spark.sources.manifest_table import ManifestTable

    a = spark.range(0, 120).select(F.col("id").alias("k"))
    b = spark.range(120, 260).select(F.col("id").alias("k"))
    t = ManifestTable(spark, str(tmp_path / "bloom_tbl"))
    t.write(bloom_build(a, "k", n_bits=_NB, k=_K), mode="overwrite")
    t.write(bloom_build(b, "k", n_bits=_NB, k=_K), mode="append")

    merged = (
        t.read().groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))
    )
    direct = bloom_build(a.unionByName(b), "k", n_bits=_NB, k=_K)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # time travel to v1 = the batch-1-only filter
    v1 = (
        t.read(version=1)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    assert sorted(map(tuple, v1.collect())) == sorted(
        map(tuple, bloom_build(a, "k", n_bits=_NB, k=_K).collect())
    )
