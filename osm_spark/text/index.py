"""Inverted index construction and boolean retrieval.

The search-engine core over a web corpus: token → posting list of
(doc_id, tf), plus conjunctive (AND) retrieval over the index. Web
pipelines build these for corpus exploration, targeted decontamination
("every doc containing this eval phrase"), and quality forensics.

Scale shape (the 100-TB view):

- Index build: one explode + per-(token, doc) pre-count (map-side
  combinable — a doc's repeated tokens collapse before the exchange),
  then ONE groupBy(token) that materializes each posting list. The
  posting list for a mega-token ("the") would be O(corpus) — the
  classic skew — so ``max_df`` drops tokens appearing in more than
  that many documents BEFORE the collect (standard stopword-tier cut:
  conjunctive queries gain nothing from terms that match everything).
  With the cut, every group is bounded by ``max_df`` structs.
- The df filter needs df before the collect: computed in the same
  aggregate (count + collect in one pass), filtered after — Catalyst
  evaluates both aggregates in one shuffle; rows are dropped before
  any downstream consumer sees the oversized lists. For a planet
  index you'd pre-filter with a (cheap, exact) df pass when max_df
  cuts deep — the two-pass variant is ``vocabulary()`` + semi-join.
- Retrieval: explode ONLY the query terms' posting lists (a semi-join
  against a broadcast term list — k rows of index, not the corpus),
  then group by doc requiring all k terms. Never touches the
  documents table.

Posting lists are emitted as a deterministic string
(``"doc:tf,doc:tf,..."`` sorted by doc_id) so the q85 oracle can
hash-compare across engines without nested-type representation drift.

No reference analog; SURVEY §2-ext X50.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.analysis import tokens_col


def _term_doc_tf(docs: DataFrame, text: str, key: str) -> DataFrame:
    return (
        docs.select(F.col(key).alias("doc"), tokens_col(text).alias("toks"))
        .select("doc", F.explode("toks").alias("token"))
        .groupBy("token", "doc")
        .agg(F.count("*").alias("tf"))
    )


def inverted_index(
    docs: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """(token, df, postings) — postings = "doc:tf,doc:tf" sorted by
    doc id. Tokens with df > ``max_df`` are dropped (skew cut)."""
    idx = (
        _term_doc_tf(docs, text, key)
        .groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc", "tf"))),
                    lambda s: F.concat_ws(
                        ":",
                        s["doc"].cast("string"),
                        s["tf"].cast("string"),
                    ),
                ),
                ",",
            ).alias("postings"),
        )
    )
    if max_df is not None:
        idx = idx.where(F.col("df") <= max_df)
    return idx


def conjunctive_search(
    docs: DataFrame,
    terms: Sequence[str],
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Documents containing ALL ``terms``: (doc_id, total_tf).

    Equivalent to probing the inverted index at the query terms; the
    plan only materializes the k probed posting sets (the term filter
    pushes into the scan side of the pre-count), then one groupBy(doc)
    with a count == k gate.
    """
    # dedupe AFTER lowercasing — ["CAT", "cat"] is one term
    lowered = sorted({t.lower() for t in terms})
    k = len(lowered)
    probed = _term_doc_tf(docs, text, key).where(
        F.col("token").isin(lowered)
    )
    return (
        probed.groupBy("doc")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("tf").alias("total_tf"),
        )
        .where(F.col("n_terms") == k)
        .select(F.col("doc").alias(key), "total_tf")
    )
