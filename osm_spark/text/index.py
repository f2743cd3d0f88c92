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


def bm25_search(
    docs: DataFrame,
    terms: Sequence[str],
    text: str = "text",
    key: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Disjunctive BM25-ranked retrieval: top-``k`` documents matching
    ANY query term, scored with Robertson/Sparck-Jones BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturation k1, length
    normalization b). Returns (doc_id, score, n_terms) ordered by
    (score DESC, doc_id ASC); ``score`` is rounded to 6 decimals so the
    ordering key is reproducible across engines (ulp-level ln()
    differences sit ~9 orders below the rounding quantum).

    Scale shape: the query-term filter pushes into the pre-count's
    scan side, so only the k probed posting sets materialize; corpus
    statistics (N, avg doc length) are one single-row aggregate
    broadcast back via cross join — no driver action, no collect; the
    final cut is orderBy+limit = TakeOrderedAndProject (per-partition
    top-k, one tiny exchange).
    """
    lowered = sorted({t.lower() for t in terms})
    td = _term_doc_tf(docs, text, key)
    probed = td.where(F.col("token").isin(lowered))
    dft = probed.groupBy("token").agg(F.count("*").alias("dft"))
    dl = docs.select(
        F.col(key).alias("doc"), F.size(tokens_col(text)).alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + F.lit(0.5))
        / (F.col("dft") + F.lit(0.5))
    )
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * F.lit(k1 + 1.0)) / norm
    scored = (
        probed.join(F.broadcast(dft), "token")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc")
        .agg(
            F.round(F.sum(contrib), 6).alias("score"),
            F.count("*").alias("n_terms"),
        )
    )
    return (
        scored.select(F.col("doc").alias(key), "score", "n_terms")
        .orderBy(F.col("score").desc(), F.col(key).asc())
        .limit(k)
    )
