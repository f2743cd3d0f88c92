"""Benchmark decontamination: flag documents that share any n-token
n-gram with a held-out evaluation set.

This is the standard training-data hygiene step (GPT-3 appx. C /
Llama: 8-13-token collision windows against every eval benchmark):
a document containing a verbatim benchmark window is either a leak of
the eval set or a source the eval was built from — both must be
dropped (or at least flagged) before training.

Scale shape (the 10^12-doc view):

- The benchmark side is TINY (eval suites are ~10^4-10^6 n-grams):
  distinct-ed once and broadcast. No shuffle reaches the corpus side
  from the join.
- The corpus side is one narrow explode over the scan (doc_id, gram)
  followed by a broadcast hash join and a map-side-combinable
  count per doc_id. The only corpus-side shuffle is the final per-doc
  aggregate, keyed on doc_id (already near-unique → no skew).
- Grams are joined as strings for exactness; at petabyte scale swap
  the join key for a 64-bit gram hash (same plan, 8-byte probe rows)
  — the false-positive rate at 64 bits is ~n_bench*n_doc_grams/2^64,
  and a flagged doc can afford a verbatim re-check.

``matched_grams`` (pipe-joined sorted matches) rides along for audit:
a human reviewing a kill-list needs to see WHICH benchmark window
fired, and the oracle hash-checks it, pinning not just how many grams
collided but which ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.dedup import ngram_shingles_sql


def benchmark_ngrams(
    bench: DataFrame, n: int = 8, text: str = "text"
) -> DataFrame:
    """Distinct n-grams of the benchmark texts — the broadcast side."""
    return (
        bench.select(
            F.explode(F.expr(ngram_shingles_sql(text, n))).alias("gram")
        )
        .distinct()
    )


def contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Per-document contamination report.

    Returns (key, n_contaminated_ngrams, matched_grams, contaminated)
    for EVERY input document (clean docs report 0 / '' / false), so
    the output is a drop-in filter column for the training pipeline.
    """
    grams = benchmark_ngrams(bench, n=n, text=text)
    doc_grams = docs.select(
        F.col(key),
        F.explode(
            F.array_distinct(F.expr(ngram_shingles_sql(text, n)))
        ).alias("gram"),
    )
    hits = (
        doc_grams.join(F.broadcast(grams), "gram")
        .groupBy(key)
        .agg(
            F.count("*").alias("n_contaminated_ngrams"),
            F.concat_ws("|", F.sort_array(F.collect_set("gram"))).alias(
                "matched_grams"
            ),
        )
    )
    return (
        docs.select(key)
        .join(hits, key, "left")
        .select(
            key,
            F.coalesce("n_contaminated_ngrams", F.lit(0)).alias(
                "n_contaminated_ngrams"
            ),
            F.coalesce("matched_grams", F.lit("")).alias("matched_grams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )
