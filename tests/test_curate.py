"""End-to-end curation pipeline: disposition semantics + exhaustiveness."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_curate_dispositions_and_exhaustiveness(spark):
    from osm_spark.text.pipeline import curate

    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, "A", "spam " * 40),                       # repetitive -> drop
        (1, "A", f"intro {eval_text} outro"),         # contaminated -> drop
        # clean docs need enough DISTINCT tokens to pass the bigram
        # rule (a 6-token doc has top_bigram_frac 1/5 > 0.18)
        (2, "A", " ".join(f"w{i}" for i in range(30))),   # survives
        (3, "A", " ".join(f"w{i}" for i in range(30))),   # exact dup of 2
        (4, "B", " ".join(f"v{i}" for i in range(25))),   # survives
        (5, "B", ""),                                 # empty -> drop_repetition
        # a dup of the CONTAMINATED doc: dedup runs first, so this is
        # drop_exact_dup, not drop_contaminated
        (6, "A", f"intro {eval_text} outro"),
    ]
    docs = _docs(spark, rows)
    bench = spark.createDataFrame([(eval_text,)], "text string")
    got = {
        r["doc_id"]: r["disposition"]
        for r in curate(
            docs, bench, {"A": 1, "B": 1}, 10_000,
            {"train": 0.8, "val": 0.1, "test": 0.1},
        ).collect()
    }
    assert len(got) == 7  # every doc exactly once
    assert got[0] == "drop_repetition"
    assert got[1] == "drop_contaminated"
    assert got[5] == "drop_repetition"
    assert got[6] == "drop_exact_dup"
    # budget >> corpus: survivors keep everything and get split names
    assert got[2] in {"train", "val", "test"}
    assert got[4] in {"train", "val", "test"}
    assert got[3] == "drop_exact_dup"


def test_curate_mix_budget_drops(spark):
    from osm_spark.text.pipeline import curate

    # 20 distinct clean docs, tiny budget -> most drop at the mix stage
    rows = [
        (i, "A", f"unique words number {i} appear precisely once today")
        for i in range(20)
    ]
    docs = _docs(spark, rows)
    bench = spark.createDataFrame([("no overlap here",)], "text string")
    out = curate(
        docs, bench, {"A": 1}, 21, {"train": 1.0}
    ).toPandas()
    vc = out["disposition"].value_counts().to_dict()
    assert vc.get("drop_mix", 0) >= 15
    assert vc.get("drop_mix", 0) + vc.get("train", 0) == 20


def test_curate_every_doc_once_on_testdata(spark):
    from osm_spark.text.pipeline import curate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 101 == 7).select("text")
    srcs = [r["source"] for r in docs.select("source").distinct().collect()]
    out = curate(
        docs, bench, {s: 1 for s in srcs}, 5_000,
        {"train": 0.9, "val": 0.05, "test": 0.05},
    )
    n_docs = docs.count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
