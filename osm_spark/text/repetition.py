"""Repetition-based document quality signals (Gopher-style).

Rae et al., "Scaling Language Models: Methods, Analysis & Insights
from Training Gopher" (2021), §A1.1 filters documents whose content is
dominated by repeated fragments — boilerplate, keyword stuffing,
navigation chrome. This module computes the token-level repetition
signals and a composite ``keep_repetition`` flag:

- ``n_tokens``            total tokens
- ``distinct_ratio``      distinct tokens / tokens
- ``top_token_frac``      occurrences of the most frequent token / tokens
- ``top_bigram_frac``     occurrences of the most frequent bigram / bigrams

Implementation is explode → groupBy(key, gram) → count → groupBy(key)
max/sum: two map-side-combinable aggregations per gram order, never an
O(len^2) per-row array scan — the shape that survives long documents
at 100 TB. Complements analysis.with_quality_score (length / punct /
stopword signals, q37); the two compose into a full quality gate.

No reference analog; SURVEY §2-ext.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.analysis import TOKENS_SQL

# Documented thresholds (Gopher-inspired, adapted to token fractions):
# a document is repetition-clean when its vocabulary is not collapsed
# and no single token/bigram dominates.
MIN_DISTINCT_RATIO = 0.2
MAX_TOP_TOKEN_FRAC = 0.3
MAX_TOP_BIGRAM_FRAC = 0.18


def _gram_stats(
    grams: DataFrame, key: str, prefix: str
) -> DataFrame:
    """(key, {prefix}_n, {prefix}_top) from an exploded gram column."""
    return (
        grams.groupBy(key, "gram")
        .count()
        .groupBy(key)
        .agg(
            F.sum("count").alias(f"{prefix}_n"),
            F.max("count").alias(f"{prefix}_top"),
            F.count("*").alias(f"{prefix}_distinct"),
        )
    )


def with_repetition_stats(
    docs: DataFrame, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals + keep_repetition flag.

    Documents with fewer than 2 tokens have no bigrams; their
    top_bigram_frac is 0.0 (nothing repeats) and only the token-level
    rules apply.
    """
    toks_sql = TOKENS_SQL.format(t=text)
    base = docs.select(F.col(key), F.expr(toks_sql).alias("toks")).where(
        F.size("toks") > 0
    )
    uni = base.select(key, F.explode("toks").alias("gram"))
    bi = base.select(
        key,
        # NB: Spark's sequence(1, 0) is DESCENDING [1, 0], not empty —
        # single-token docs need the explicit empty-array guard.
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array()"
                " ELSE transform(sequence(1, size(toks) - 1),"
                " i -> concat(toks[i-1], ' ', toks[i])) END"
            )
        ).alias("gram"),
    )
    u = _gram_stats(uni, key, "tok")
    b = _gram_stats(bi, key, "bi")
    dist = uni.groupBy(key).agg(
        F.countDistinct("gram").alias("n_distinct")
    )
    j = u.join(dist, key).join(b, key, "left")
    dr = F.round(F.col("n_distinct") / F.col("tok_n"), 9)
    tf = F.round(F.col("tok_top") / F.col("tok_n"), 9)
    bf = F.round(
        F.coalesce(F.col("bi_top") / F.col("bi_n"), F.lit(0.0)), 9
    )
    return j.select(
        F.col(key),
        F.col("tok_n").alias("n_tokens"),
        dr.alias("distinct_ratio"),
        tf.alias("top_token_frac"),
        bf.alias("top_bigram_frac"),
        (
            (dr >= MIN_DISTINCT_RATIO)
            & (tf <= MAX_TOP_TOKEN_FRAC)
            & (bf <= MAX_TOP_BIGRAM_FRAC)
        ).alias("keep_repetition"),
    )
