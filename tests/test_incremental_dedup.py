"""Incremental cross-snapshot dedup: verdict semantics, atomic append
integration and idempotency."""

from pyspark.sql import functions as F


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_verdict_priority_existing_beats_within(spark):
    from osm_spark.text.dedup import dedup_increment

    existing = spark.createDataFrame(
        [("x",)], "text string"
    ).select(F.md5("text").alias("content_md5"))
    # two increment docs share text 'x' (already committed) — BOTH are
    # dup_existing, not one-new-one-within
    inc = _df(spark, [(1, "x"), (2, "x"), (3, "y"), (4, "y"), (5, "z")])
    got = {
        r["doc_id"]: r["status"]
        for r in dedup_increment(existing, inc).collect()
    }
    assert got == {
        1: "dup_existing",
        2: "dup_existing",
        3: "new",          # smallest key wins within-increment
        4: "dup_within",
        5: "new",
    }


def test_commit_increment_end_to_end_and_idempotent(spark, tmp_path):
    from osm_spark.sources.manifest_table import ManifestTable
    from osm_spark.text.dedup import commit_increment

    t = ManifestTable(spark, str(tmp_path / "tbl"))
    t.write(_df(spark, [(0, "a"), (1, "b")]), mode="overwrite")

    inc = _df(spark, [(10, "a"), (11, "c"), (12, "c"), (13, "d")])
    stats = commit_increment(t, inc)
    assert stats == {
        "version": 2,
        "n_new": 2,           # first 'c' + 'd'
        "n_dup_existing": 1,  # 'a'
        "n_dup_within": 1,    # second 'c'
    }
    assert t.read().count() == 4

    # re-committing the SAME increment adds nothing: every doc is now
    # dup_existing (crash-retry of an ingest job must be safe)
    stats2 = commit_increment(t, inc)
    assert stats2["n_new"] == 0
    assert stats2["n_dup_existing"] == 4
    assert t.read().count() == 4
    # but it IS a commit (explicit, auditable history)
    assert stats2["version"] == 3


def test_time_travel_sees_pre_increment_state(spark, tmp_path):
    from osm_spark.sources.manifest_table import ManifestTable
    from osm_spark.text.dedup import commit_increment

    t = ManifestTable(spark, str(tmp_path / "tbl"))
    t.write(_df(spark, [(0, "a")]), mode="overwrite")
    commit_increment(t, _df(spark, [(1, "b")]))
    assert t.read(version=1).count() == 1
    assert t.read(version=2).count() == 2
