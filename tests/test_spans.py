"""Exact substring dedup: winner semantics, span merging, overlap
composition, exhaustiveness, partition invariance — pinned against an
independent pure-python twin."""

import re


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _twin(rows, k):
    """Independent O(n²) reimplementation of the documented semantics:
    global-first occurrence per window wins; every other occurrence is
    a removal span; token dropped iff covered by any span of its doc."""
    toks = {d: _toks(t) for d, t in rows}
    occ = {}
    for d, ts in sorted(toks.items()):
        for i in range(len(ts) - k + 1):
            occ.setdefault(" ".join(ts[i : i + k]), []).append((d, i))
    removed = {d: set() for d in toks}
    n_spans = {d: 0 for d in toks}
    for positions in occ.values():
        if len(positions) < 2:
            continue
        for d, i in sorted(positions)[1:]:
            removed[d].update(range(i, i + k))
            n_spans[d] += 1
    out = {}
    for d, ts in toks.items():
        kept = [t for p, t in enumerate(ts) if p not in removed[d]]
        out[d] = (" ".join(kept), len(ts), len(kept), n_spans[d])
    return out


def _run(spark, rows, k):
    from osm_spark.text.spans import dedup_substrings

    return {
        r["doc_id"]: (
            r["cleaned_text"],
            r["n_tokens"],
            r["n_kept_tokens"],
            r["n_dup_windows"],
        )
        for r in dedup_substrings(_docs(spark, rows), k=k).collect()
    }


def test_matches_twin_on_handcase(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "intro words alpha beta gamma delta outro"),
        (3, "alpha beta gamma delta epsilon zeta"),
        (4, "unique text only here nothing shared"),
        (5, "short one"),
        (6, ""),
    ]
    got = _run(spark, rows, 4)
    assert got == _twin(rows, 4)
    assert got[1][0] == "alpha beta gamma delta epsilon zeta"  # winner intact
    assert got[3] == ("", 6, 0, 3)  # full dup → emptied, row kept
    assert got[2][0] == "intro words outro"


def test_overlapping_spans_merge(spark):
    # doc 2 repeats doc 1's text twice with one-token overlap-free
    # joins; the two removal spans overlap inside doc 2 and must
    # compose (island merge), not double-count tokens.
    rows = [
        (1, "a b c d e"),
        (2, "x a b c d e y a b c d e z"),
    ]
    got = _run(spark, rows, 3)
    assert got == _twin(rows, 3)
    assert got[2][0] == "x y z"


def test_within_doc_repeat_first_pos_wins(spark):
    rows = [(1, "p q r s t p q r s u")]
    got = _run(spark, rows, 3)
    assert got == _twin(rows, 3)
    # "p q r"@5 loses to @0 and "q r s"@6 loses to @1: spans [5,8)
    # and [6,9) merge to [5,9), so tokens 5-8 drop and 9 ("u") stays.
    assert got[1][0] == "p q r s t u"


def test_all_rows_preserved_and_partition_invariant(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for d in range(60)
    ]
    want = _twin(rows, 5)
    for parts in (1, 7):
        from osm_spark.text.spans import dedup_substrings

        got = {
            r["doc_id"]: (
                r["cleaned_text"],
                r["n_tokens"],
                r["n_kept_tokens"],
                r["n_dup_windows"],
            )
            for r in dedup_substrings(
                _docs(spark, rows).repartition(parts), k=5
            ).collect()
        }
        assert got == want
        assert len(got) == len(rows)
