"""Global paragraph dedup: first-occurrence semantics, order
preservation, exhaustiveness, determinism across partitioning."""


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_global_occurrence_wins(spark):
    from osm_spark.text.paragraphs import dedup_paragraphs

    rows = [
        (1, "QUOTE\nbody one"),
        (2, "body two\nQUOTE"),      # QUOTE already seen in doc 1
        (3, "QUOTE"),                # loses everything
        (4, "body four"),
    ]
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_kept"], r["n_removed"])
        for r in dedup_paragraphs(_docs(spark, rows)).collect()
    }
    assert got[1] == ("QUOTE\nbody one", 2, 0)
    assert got[2] == ("body two", 1, 1)
    assert got[3] == ("", 0, 1)      # doc preserved, text emptied
    assert got[4] == ("body four", 1, 0)


def test_within_doc_duplicate_earliest_pos_wins(spark):
    from osm_spark.text.paragraphs import dedup_paragraphs

    rows = [(1, "a\nb\na\nc\na")]
    got = dedup_paragraphs(_docs(spark, rows)).first()
    assert got["cleaned_text"] == "a\nb\nc"
    assert got["n_kept"] == 3 and got["n_removed"] == 2


def test_order_preserved_after_removal(spark):
    from osm_spark.text.paragraphs import dedup_paragraphs

    rows = [
        (1, "X"),
        (2, "p\nX\nq\nX\nr"),
    ]
    got = {r["doc_id"]: r["cleaned_text"]
           for r in dedup_paragraphs(_docs(spark, rows)).collect()}
    assert got[2] == "p\nq\nr"


def test_deterministic_across_partitioning(spark):
    from osm_spark.text.paragraphs import dedup_paragraphs

    rows = [(i, f"shared\nuniq {i}" if i % 3 == 0 else f"uniq {i}")
            for i in range(50)]
    a = (dedup_paragraphs(_docs(spark, rows))
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    b = (dedup_paragraphs(_docs(spark, rows).repartition(11))
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    # winner of 'shared' is doc 0 (smallest key)
    assert a.loc[0, "cleaned_text"].startswith("shared")
    assert a.loc[3, "cleaned_text"] == "uniq 3"


def test_row_count_preserved(spark):
    from osm_spark.text.paragraphs import dedup_paragraphs

    rows = [(i, "same para") for i in range(10)]
    out = dedup_paragraphs(_docs(spark, rows)).toPandas()
    assert len(out) == 10
    assert (out["n_kept"] == 0).sum() == 9


def test_blank_separators_are_structure_not_content(spark):
    from osm_spark.text.paragraphs import dedup_paragraphs

    docs = [(1, "a\n\nb"), (2, "c\n\nd"), (3, "a\n\n\nz")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["cleaned_text"], r["n_removed"])
        for r in dedup_paragraphs(df).collect()
    }
    # every doc keeps its blank lines; only the repeated 'a' is removed
    assert got[1] == ("a\n\nb", 0)
    assert got[2] == ("c\n\nd", 0)
    # doc 3's 'a' (dup of doc 1) is removed with its separator; the
    # two blank paragraphs survive: ['', '', 'z'] -> '\n\nz'
    assert got[3] == ("\n\nz", 1)
