"""Text analysis for training-data pipelines: tokenization, quality
scoring, language ID, fingerprinting.

Everything here is a pure Catalyst expression over the documents table —
JVM-side, whole-stage-codegen, no Python on the per-document path. The
hashing primitive is md5-prefix→int64 (cross-engine deterministic: the
DuckDB oracle computes the identical value), NOT xxhash/murmur whose
implementations differ between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared SQL fragments (Spark dialect). osm_spark uses these both from
# the DataFrame API and from __spark_entry__'s SQL queries.
TOKENS_SQL = "filter(split(lower({t}), '[^a-z0-9]+'), x -> x != '')"
MD5_LONG_SQL = "cast(conv(substr(md5({t}), 1, 15), 16, 10) as bigint)"

STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "it")

# Marker function words per language for the n-gram/stopword language
# heuristic (tiny, deterministic; not a trained model).
LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "a"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "los", "las", "es", "y"),
    "it": ("il", "di", "che", "gli", "e"),
}


def tokens_col(text: str = "text") -> Column:
    return F.expr(TOKENS_SQL.format(t=text))


def with_token_stats(docs: DataFrame, text: str = "text") -> DataFrame:
    """token count (whitespace+regex model), char count, avg token
    length, punctuation ratio, stopword ratio."""
    df = docs.withColumn("tokens", tokens_col(text))
    stop_arr = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        df.withColumn("n_tokens", F.size("tokens"))
        .withColumn("n_chars_txt", F.length(text))
        .withColumn(
            "avg_token_len",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("aggregate(tokens, 0L, (a, x) -> a + length(x))")
                / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
            / F.greatest(F.length(text), F.lit(1)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"size(filter(tokens, x -> x in ({stop_arr})))")
                / F.col("n_tokens"),
            ).otherwise(F.lit(0.0)),
        )
    )


def with_quality_score(docs: DataFrame, text: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + low punctuation +
    a sane stopword ratio (heuristic mirror of common webtext filters)."""
    df = with_token_stats(docs, text)
    length_ok = F.when(F.col("n_tokens").between(10, 100000), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    punct_ok = F.lit(1.0) - F.least(F.col("punct_ratio") * 5, F.lit(1.0))
    stop_ok = F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
    return df.withColumn(
        "quality", (length_ok + punct_ok + stop_ok) / F.lit(3.0)
    )


def with_langid(docs: DataFrame, text: str = "text") -> DataFrame:
    """Predicted language = argmax of marker-word counts (deterministic
    tie-break by language code order)."""
    df = docs.withColumn("tokens", tokens_col(text))
    scores = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = ", ".join(f"'{m}'" for m in markers)
        scores.append(
            F.expr(f"size(filter(tokens, x -> x in ({arr})))").alias(f"s_{lang}")
        )
    df = df.select("*", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"s_{lg}") for lg in langs])
    pred = None
    for lg in reversed(langs):  # earlier langs win ties
        cond = F.col(f"s_{lg}") == best
        pred = F.when(cond, F.lit(lg)) if pred is None else F.when(cond, F.lit(lg)).otherwise(pred)
    # reversed+otherwise chain means the FIRST lang in sort order wins ties
    return df.withColumn("pred_lang", pred).drop(*[f"s_{lg}" for lg in langs])


def with_fingerprint(docs: DataFrame, text: str = "text") -> DataFrame:
    """Document fingerprint: md5-int64 of the normalized token stream
    (lowercased, punctuation-collapsed) — robust to whitespace/case
    changes, cross-engine deterministic."""
    norm = F.array_join(tokens_col(text), " ")
    return docs.withColumn(
        "fingerprint", F.expr(MD5_LONG_SQL.format(t="array_join(" + TOKENS_SQL.format(t=text) + ", ' ')"))
    ).withColumn("norm_len", F.length(norm))
