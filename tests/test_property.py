"""Property-based (hypothesis) pins for the cross-engine BPE fold.

The q101/q102 oracles rest on one claim: the DuckDB ``list_reduce``
fold and the unrolled training CTE chain implement EXACTLY classic
greedy BPE. test_bpe.py pins the Spark side against the pure-python
twin on a fixed corpus; these tests pin the DUCK side against the same
twin over randomized inputs (small alphabets force dense merge/run/tie
collisions), closing the triangle Spark == twin == DuckDB without a
Spark session.
"""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from tests.test_bpe import _twin_merge_word, _twin_train

import __spark_entry__ as entry


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


SYM = st.text(alphabet="ab", min_size=1, max_size=2)


@settings(max_examples=120, deadline=None)
@given(
    syms=st.lists(SYM, min_size=0, max_size=12),
    left=SYM,
    right=SYM,
)
def test_duck_fold_matches_twin_merge(con, syms, left, right):
    folded = entry._duck_bpe_fold("?::VARCHAR[]", "?", "?")
    q = (
        f"SELECT {entry._BPE_ACC_TO_LIST} FROM "
        f"(SELECT {folded} AS acc)"
    )
    # the fold template repeats the left/right literals (?) — feed
    # them positionally: prepend-list, cond-l, cond-r, emit-l, emit-r
    got = con.execute(q, [syms, left, right, left, right]).fetchone()[0]
    assert got == _twin_merge_word(syms, left, right)


WORD = st.text(alphabet="abc", min_size=1, max_size=6)


@settings(max_examples=40, deadline=None)
@given(
    docs=st.lists(
        st.lists(WORD, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_duck_train_chain_matches_twin(con, docs):
    k = 4
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS merge_rank, l, r, cnt FROM m{i}"
        for i in range(1, k + 1)
    )
    sql = (
        "WITH documents AS (SELECT * FROM (SELECT unnest(?::VARCHAR[]) AS text)),\n"
        + ",\n".join(entry._bpe_train_ctes(k))
        + f",\nmm AS ({union})\nSELECT * FROM mm ORDER BY merge_rank"
    )
    got = [tuple(r) for r in con.execute(sql, [docs]).fetchall()]
    wf = {}
    for d in docs:
        for w in d.split():
            wf[w] = wf.get(w, 0) + 1
    want, _ = _twin_train(wf, k)
    assert got == want
