"""Sequence packing (two-phase distributed prefix sum) and benchmark
decontamination unit tests."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def _naive_pack(texts, seq_len):
    """Single-threaded reference: global cumsum in doc_id order."""
    rows, acc = [], 0
    for i, t in enumerate(texts):
        n = len([x for x in t.lower().split() if x])
        if n == 0:
            continue
        rows.append((i, n, acc, acc // seq_len, (acc + n - 1) // seq_len))
        acc += n
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "start_tok", "seq_first", "seq_last"]
    )


def test_pack_matches_naive_and_partition_invariant(spark):
    from osm_spark.text.packing import pack_offsets

    texts = [f"tok{j} " * ((i * 7) % 23 + 1) for i, j in enumerate(range(40))]
    texts[5] = ""  # zero-token doc: dropped by contract
    expected = _naive_pack(texts, seq_len=16)
    docs = _docs(spark, texts)
    for np_ in (2, 8):
        got = (
            pack_offsets(docs, seq_len=16, num_partitions=np_)
            .toPandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype("int64"), expected.astype("int64"), check_dtype=False
        )
    assert 5 not in set(expected["doc_id"])


def test_pack_doc_spanning_many_sequences(spark):
    from osm_spark.text.packing import pack_offsets

    texts = ["a b c", "x " * 50, "y z"]  # 50 tokens >> seq_len=8
    got = (
        pack_offsets(_docs(spark, texts), seq_len=8, num_partitions=2)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1 starts at token 3 -> seq 0, ends at token 52 -> seq 6
    assert got.loc[1, "seq_first"] == 0 and got.loc[1, "seq_last"] == 6
    assert got.loc[2, "start_tok"] == 53


def test_sequence_stats_conservation(spark):
    from osm_spark.text.packing import pack_offsets, sequence_stats

    texts = [f"w{i} " * ((i * 13) % 31 + 1) for i in range(60)]
    pack = pack_offsets(_docs(spark, texts), seq_len=32, num_partitions=4)
    pack.persist()
    stats = sequence_stats(pack, seq_len=32).toPandas().sort_values("seq_id")
    total = pack.agg(F.sum("n_tokens")).first()[0]
    # token conservation + every sequence full except the last
    assert stats["n_tokens"].sum() == total
    assert (stats["n_tokens"].iloc[:-1] == 32).all()
    assert 0 < stats["n_tokens"].iloc[-1] <= 32
    # seq ids are contiguous from 0
    assert list(stats["seq_id"]) == list(range(len(stats)))
    pack.unpersist()


def test_pack_rejects_bad_seq_len(spark):
    from osm_spark.text.packing import pack_offsets

    with pytest.raises(ValueError):
        pack_offsets(_docs(spark, ["a"]), seq_len=0)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------


def test_contamination_flags_known_overlap(spark):
    from osm_spark.text.decontaminate import contamination

    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    docs = _docs(
        spark,
        [
            # contains the full 8-gram window twice-over region
            "intro the quick brown fox jumps over the lazy dog outro",
            # shares only a 7-token window -> clean at n=8
            "quick brown fox jumps over the lazy cat",
            "totally unrelated text with no overlap at all here",
        ],
    )
    got = (
        contamination(docs, bench, n=8)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bool(got.loc[0, "contaminated"]) is True
    # doc 0 contains BOTH 8-gram windows of the 9-token benchmark
    assert got.loc[0, "n_contaminated_ngrams"] == 2
    assert "|" in got.loc[0, "matched_grams"]
    assert bool(got.loc[1, "contaminated"]) is False
    assert bool(got.loc[2, "contaminated"]) is False
    assert got.loc[2, "matched_grams"] == ""


def test_contamination_reports_every_doc(spark):
    from osm_spark.text.decontaminate import contamination

    docs = _docs(spark, ["a b c d e f g h", "z z z"])
    bench = spark.createDataFrame([("nothing shared",)], "text string")
    got = contamination(docs, bench, n=8).toPandas()
    assert len(got) == 2
    assert (got["n_contaminated_ngrams"] == 0).all()


def test_contamination_plan_broadcasts_benchmark(spark):
    from osm_spark.text.decontaminate import contamination

    docs = _docs(spark, ["a b c d e f g h i j"] * 3)
    bench = spark.createDataFrame([("a b c d e f g h",)], "text string")
    plan = (
        contamination(docs, bench, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
