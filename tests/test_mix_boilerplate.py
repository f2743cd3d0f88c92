"""Source-mixing sampler and per-host boilerplate removal unit tests."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


# ---------------------------------------------------------------------------
# mix_sample
# ---------------------------------------------------------------------------


def test_mix_rates_respect_shares_and_clamp(spark):
    from osm_spark.text.sampling import mix_sample

    rows = []
    # source A: 100 docs x 10 tokens = 1000 tokens available
    for i in range(100):
        rows.append((i, "A", "t " * 10))
    # source B: 5 docs x 10 tokens = 50 tokens available (scarce)
    for i in range(5):
        rows.append((1000 + i, "B", "t " * 10))
    docs = _docs(spark, rows)
    # budget 400, shares A:1 B:1 -> target 200 each.
    # A: rate 200/1000 = 0.2; B: target 200 > avail 50 -> clamp, keep ALL
    out = mix_sample(docs, {"A": 1, "B": 1}, 400, n_buckets=10_000).toPandas()
    b = out[out["source"] == "B"]
    assert bool(b["keep"].all()) and (b["bound"] == 10_000).all()
    a = out[out["source"] == "A"]
    assert (a["bound"] == 2000).all()
    kept_frac = a["keep"].mean()
    assert 0.05 < kept_frac < 0.4  # md5 buckets ~ uniform at n=100


def test_mix_zero_share_source_dropped(spark):
    from osm_spark.text.sampling import mix_sample

    docs = _docs(spark, [(1, "A", "x y z"), (2, "C", "x y z")])
    out = mix_sample(docs, {"A": 1}, 100).toPandas()
    c = out[out["source"] == "C"]
    assert (c["bound"] == 0).all() and not c["keep"].any()


def test_mix_deterministic_across_partitioning(spark):
    from osm_spark.text.sampling import mix_sample

    rows = [(i, f"s{i % 3}", "w " * (i % 9 + 1)) for i in range(60)]
    shares = {"s0": 2, "s1": 1, "s2": 1}
    a = (
        mix_sample(_docs(spark, rows), shares, 150)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        mix_sample(_docs(spark, rows).repartition(7), shares, 150)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_mix_summary_consistency(spark):
    from osm_spark.text.sampling import mix_sample, mix_summary

    rows = [(i, f"s{i % 2}", "w " * 5) for i in range(40)]
    mixed = mix_sample(_docs(spark, rows), {"s0": 3, "s1": 1}, 100).persist()
    summ = mix_summary(mixed).toPandas().set_index("source")
    pdf = mixed.toPandas()
    for s in ("s0", "s1"):
        part = pdf[pdf["source"] == s]
        assert summ.loc[s, "n_docs"] == len(part)
        assert summ.loc[s, "kept_docs"] == int(part["keep"].sum())
        assert summ.loc[s, "kept_tokens"] == int(
            part.loc[part["keep"], "n_tokens"].sum()
        )
    mixed.unpersist()


# ---------------------------------------------------------------------------
# boilerplate
# ---------------------------------------------------------------------------


def _hosted(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, host string, text string")


def test_boilerplate_detection_and_removal(spark):
    from osm_spark.text.boilerplate import boilerplate_lines, remove_boilerplate

    rows = []
    for i in range(10):
        extra = "\nCOOKIES" if i < 3 else ""  # 30% < 60% -> kept
        rows.append((i, "h1", f"NAV\nunique body {i}{extra}"))
    rows.append((100, "h2", "NAV\nother"))  # h2 has 1 doc < min_docs
    docs = _hosted(spark, rows)

    bp = boilerplate_lines(docs, min_pct=60, min_docs=3).toPandas()
    assert set(zip(bp["host"], bp["line"])) == {("h1", "NAV")}

    out = (
        remove_boilerplate(docs, min_pct=60, min_docs=3)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    # h1 docs lose exactly NAV, keep order of the rest
    assert out.loc[0, "cleaned_text"] == "unique body 0\nCOOKIES"
    assert out.loc[5, "cleaned_text"] == "unique body 5"
    assert (out.loc[out["host"] == "h1", "n_removed_lines"] == 1).all()
    # h2 untouched (below min_docs)
    h2 = out[out["host"] == "h2"].iloc[0]
    assert h2["cleaned_text"] == "NAV\nother" and h2["n_removed_lines"] == 0


def test_boilerplate_threshold_boundary_exact(spark):
    from osm_spark.text.boilerplate import boilerplate_lines

    # 3 of 5 docs = exactly 60%: integer compare 3*100 >= 60*5 -> kept
    rows = [(i, "h", "B\nx" if i < 3 else f"y{i}") for i in range(5)]
    bp = boilerplate_lines(_hosted(spark, rows), min_pct=60, min_docs=3).toPandas()
    assert ("h", "B") in set(zip(bp["host"], bp["line"]))
    # 2 of 5 = 40% -> not boilerplate
    rows2 = [(i, "h", "B\nx" if i < 2 else f"y{i}") for i in range(5)]
    bp2 = boilerplate_lines(_hosted(spark, rows2), min_pct=60, min_docs=3).toPandas()
    assert ("h", "B") not in set(zip(bp2["host"], bp2["line"]))


def test_boilerplate_repeated_line_within_doc_counts_once(spark):
    from osm_spark.text.boilerplate import boilerplate_lines

    # 'AD' appears 3x in ONE doc of 4 -> within-host doc-frequency 25%
    rows = [(0, "h", "AD\nAD\nAD\nbody")] + [
        (i, "h", f"body {i}") for i in range(1, 4)
    ]
    bp = boilerplate_lines(_hosted(spark, rows), min_pct=60, min_docs=3).toPandas()
    assert ("h", "AD") not in set(zip(bp["host"], bp["line"]))


def test_boilerplate_is_catalyst_only(spark):
    from osm_spark.text.boilerplate import remove_boilerplate

    docs = _hosted(spark, [(1, "h", "a\nb"), (2, "h", "a\nc"), (3, "h", "a\nd")])
    plan = (
        remove_boilerplate(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_blank_line_never_boilerplate(spark):
    from osm_spark.text.boilerplate import remove_boilerplate

    # 4 docs on one host, all containing a blank separator: the ''
    # line clears any df threshold but must never be stripped
    docs = [
        (i, "h", f"unique {i}\n\nbody {i}") for i in range(4)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in remove_boilerplate(df, min_pct=60, min_docs=3).collect()
    }
    assert got[0] == "unique 0\n\nbody 0"


def test_mix_sample_null_source_kept_with_verdict(spark):
    from osm_spark.text.sampling import mix_sample

    docs = [
        (1, "web", "alpha beta gamma"),
        (2, None, "orphan tokens here"),
        (3, "web", "delta epsilon"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])
    rows = mix_sample(df, {"web": 1}, token_budget=1000).collect()
    assert len(rows) == 3  # every input doc accounted
    null_row = [r for r in rows if r["source"] is None][0]
    assert null_row["doc_id"] == 2 and null_row["keep"] is False
