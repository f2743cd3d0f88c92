"""Character n-gram language-model quality scoring — the CCNet shape.

CCNet (Wenzek et al. 2020) filters Common-Crawl text by perplexity
under a language model trained on a trusted reference corpus; fastText
/ KenLM do the heavy lifting there. This module implements the same
pipeline as two distributed passes with an exactly-reproducible model:

1. **train** — character n-gram counts over the reference subset (one
   explode → one map-side-combinable groupBy), truncated to the
   ``top_v`` most frequent grams (deterministic tie-break on the gram
   string). Add-one smoothing over the retained vocabulary; every
   gram's log-probability is quantized to integer MICRO-NATS
   (``round(ln p · 10⁶)``) — the ppm-quantization trick the PageRank
   operator uses, making every downstream sum an exact int64 fold
   that no partitioning, engine, or summation order can perturb.
2. **score** — explode each document's grams, broadcast-join the
   model (top_v rows ≈ a few MB — always broadcastable), per-doc
   integer sum of micro-nat log-probs (OOV grams take the smoothed
   unseen mass), divide once at the end: ``avg_logp = Σµnat / (10⁶ ·
   n_grams)``. Lower (more negative) = less like the reference —
   the perplexity filter is ``avg_logp >= cutoff``.

Scale: the score side explodes ~len(text) rows per document — at
10^12 pages that is the same row volume the MinHash shingle pass
already handles, map-side combined into one partial per partition
before the single doc_id shuffle. The model side is constant-size.
No Python runs anywhere; both passes are pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def _grams_col(text_col, order: int):
    """array<string> of all length-``order`` char grams (JVM-side).

    Guarded for short strings: Spark's ``sequence(1, 0)`` yields the
    DESCENDING array [1, 0], not an empty one, so the n<1 case must
    short-circuit to an empty array explicitly.
    """
    n = F.length(text_col) - (order - 1)
    return F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.substring(text_col, i, order),
        ),
    ).otherwise(F.array().cast("array<string>"))


def train_char_lm(
    ref: DataFrame,
    order: int = 3,
    top_v: int = 50_000,
    text: str = "text",
) -> DataFrame:
    """(gram, logp_micro) for the ``top_v`` most frequent grams of the
    reference corpus, plus the model constants as literals on every
    row (total count N, vocab V) so a scorer — or the DuckDB oracle —
    can derive the OOV mass from the model table alone.

    Probabilities are add-one smoothed over the RETAINED vocabulary:
    p(g) = (c(g)+1)/(N+V+1) for retained grams, p(oov) = 1/(N+V+1).
    The +1 in the denominator is the single shared unseen bucket.
    """
    grams = ref.select(
        F.explode(_grams_col(F.col(text), order)).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count("*").alias("c"))
    top = (
        counts.orderBy(F.desc("c"), "gram")
        .limit(top_v)
    )
    # N = total gram occurrences IN THE RETAINED VOCAB, V = retained
    # vocab size — both from the truncated table, so the model is a
    # pure function of its own rows (reproducible from the artifact).
    tot = top.agg(
        F.sum("c").alias("N"), F.count("*").alias("V")
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .select(
            "gram",
            F.round(
                F.log((F.col("c") + 1).cast("double") / (F.col("N") + F.col("V") + 1))
                * _MICRO
            )
            .cast("long")
            .alias("logp_micro"),
            "N",
            "V",
        )
    )


def score_docs(
    docs: DataFrame,
    model: DataFrame,
    order: int = 3,
    text: str = "text",
    key: str = "doc_id",
    include_sum: bool = False,
) -> DataFrame:
    """(key, n_grams, n_oov, avg_logp) per document under ``model``.

    avg_logp = mean micro-nat log-prob / 10⁶ (natural-log units per
    gram; exp(-avg_logp) is the per-gram perplexity). Documents
    shorter than ``order`` chars score null with n_grams 0.
    ``include_sum`` adds the raw int64 micro-nat sum (``sum_micro``,
    0 for gram-less docs) — the exact-integer handle contrastive
    scoring (DSIR, q157) differences against a second model."""
    oov = model.select(
        F.round(F.log(1.0 / (F.col("N") + F.col("V") + 1)) * _MICRO)
        .cast("long")
        .alias("oov_micro")
    ).limit(1)
    exploded = docs.select(
        F.col(key), F.explode(_grams_col(F.col(text), order)).alias("gram")
    )
    scored = (
        exploded.join(F.broadcast(model.select("gram", "logp_micro")), "gram", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy(key)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("logp_micro").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
            F.sum(F.coalesce("logp_micro", "oov_micro")).alias("sum_micro"),
        )
    )
    cols = [
        F.col(key),
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
        (
            F.col("sum_micro").cast("double")
            / (F.lit(float(_MICRO)) * F.col("n_grams"))
        ).alias("avg_logp"),
    ]
    if include_sum:
        cols.append(
            F.coalesce("sum_micro", F.lit(0)).cast("long").alias("sum_micro")
        )
    return docs.select(F.col(key)).join(scored, key, "left").select(*cols)
