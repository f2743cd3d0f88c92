"""Corpus vocabulary statistics — the tokenizer-training prep stage.

Before training a BPE/unigram tokenizer over a web corpus, every
pipeline materializes corpus-level token statistics: term frequency
(total occurrences) and document frequency (how many documents contain
the token), then takes a deterministic top-k slice as the candidate
alphabet / word-level seed vocabulary.

Scale shape (the 100-TB view):

- One explode over the scan, then TWO map-side-combinable shuffles:
  per-(doc, token) counts first — each document's tokens are colocated
  in its input row, so the partial aggregate collapses a document's
  repeated tokens BEFORE the exchange — then one global groupBy on
  token where ``tf = sum(c)`` and ``df = count(*)`` come out of the
  same pass (no count_distinct expansion, no second scan).
- Zipf skew is the point: mega-tokens ("the") are exactly what the
  map-side combine handles — the hot reducer receives one partial row
  per upstream partition, not one per occurrence.
- The top-k slice is ``orderBy(...).limit(k)`` — Spark plans it as
  TakeOrderedAndProject (per-partition heap + driver merge of k rows),
  never a global sort. The (tf DESC, token ASC) total order makes the
  cut deterministic across engines and cluster sizes.

Tokenization is the engine-wide one (:func:`analysis.tokens_col`:
lowercase, split on non-alphanumeric), so vocabulary rows compose with
token counting (q35), decontamination windows, and packing offsets.

No reference analog (pmezard/osm has no text pipeline); SURVEY
§2-ext X49. The q84 oracle recomputes both statistics and the slice
with DuckDB list functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.analysis import tokens_col


def vocabulary(
    docs: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """(token, tf, df) over the whole corpus.

    ``tf`` = total occurrences, ``df`` = number of distinct documents
    containing the token — both from one per-(doc, token) pre-count,
    so no count_distinct and no repeated scan.
    """
    per_doc = (
        docs.select(F.col(key).alias("k"), tokens_col(text).alias("toks"))
        .select("k", F.explode("toks").alias("token"))
        .groupBy("k", "token")
        .agg(F.count("*").alias("c"))
    )
    return per_doc.groupBy("token").agg(
        F.sum("c").alias("tf"), F.count("*").alias("df")
    )


def top_k_vocabulary(
    docs: DataFrame, k: int = 200, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """The k highest-tf tokens, ties broken by token ASC (total order
    — the slice is deterministic at any parallelism)."""
    return (
        vocabulary(docs, text=text, key=key)
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(k)
    )
