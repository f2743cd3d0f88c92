"""Exact set-similarity join — prefix filtering (PPJoin family).

The EXACT companion of the approximate near-dup stack: minhash-LSH
(dedup.py) finds *probable* Jaccard pairs with tunable recall; this
operator returns EVERY pair with Jaccard(tokens_a, tokens_b) ≥ t and
nothing else — the contract audits and dedup-of-record want, at a
cost that is still far below the n² cross product.

Prefix-filtering lemma (Chaudhuri-Ganti-Kaushik 2006; PPJoin, Xiao et
al. 2008): order every document's DISTINCT tokens by one GLOBAL total
order, and take each document's first

    p = n − ⌈t·n⌉ + 1        (n = set size)

tokens as its prefix. Two sets with Jaccard ≥ t must share at least
⌈t·max(n_a, n_b)⌉ tokens, and two sorted sets whose prefixes are
disjoint cannot overlap that much — so candidate pairs = pairs
sharing ≥ 1 PREFIX token, a lossless prune. The global order is
RAREST-FIRST (document frequency asc, token asc): prefixes then hold
each document's rarest tokens, so posting lists that meet in the
candidate join are short and the hot tokens (stopwords) sit at the
sequence tails, never in short-set prefixes — the frequency ordering
IS the skew defense, before AQE even looks.

Exactness: thresholds are rational (t = t_num/t_den); every test is
an int64 cross-multiply (inter·den ≥ num·union, sizes·den vs num·n) —
no float anywhere, engine-bit-exact, and the q154 oracle is the
literal brute-force definition with none of the prefix machinery.

Scale shape: one df groupBy (map-side combinable) + one per-doc sort
(bounded by document token count) + a prefix-token equi-join whose
volume is Σ posting² over PREFIX lists only + exact verify on
candidates. At 10^9 docs the prefix explode is ≈ (1−t)·tokens rows —
the (1−t) factor is the operator's selectivity lever.

No reference counterpart; training-data extension surface
(SURVEY §2.9), the exact layer under X30-X34.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ceil_mul(n, num: int, den: int):
    """⌈num·n/den⌉ as an int64 Catalyst expression (num·n ≥ 0):
    SQL integral division ``x div den`` on x = num·n + den − 1 —
    stays in int64 arithmetic, no float division at any magnitude."""
    x = (n * F.lit(num) + F.lit(den - 1)).cast("long")
    return F.call_function("div", x, F.lit(den).cast("long")).cast("long")


def jaccard_join(
    docs: DataFrame,
    t_num: int,
    t_den: int,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """All pairs (id_a < id_b) with Jaccard of distinct-token sets
    ≥ t_num/t_den: (id_a, id_b, n_a, n_b, n_inter) — exact."""
    if not (0 < t_num <= t_den):
        raise ValueError("threshold must be in (0, 1]")
    sets = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.col(tokens_col)).alias("toks"),
    ).where(F.size("toks") > 0)

    tok = sets.select("id", F.explode("toks").alias("token"))
    dfreq = tok.groupBy("token").agg(F.count("*").alias("df"))
    # per-doc rarest-first ordering; prefix = first n - ceil(t n) + 1
    ordered = (
        tok.join(dfreq, "token")
        .groupBy("id")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("df", "token"))
                ),
                lambda s: s["token"],
            ).alias("otoks")
        )
        .select(
            "id",
            "otoks",
            F.size("otoks").alias("n"),
        )
        .select(
            "id",
            "otoks",
            "n",
            F.slice(
                "otoks",
                1,
                F.greatest(
                    F.lit(1),
                    F.col("n") - _ceil_mul(F.col("n"), t_num, t_den) + 1,
                ),
            ).alias("prefix"),
        )
    )
    pref = ordered.select(
        "id", "n", F.explode("prefix").alias("token")
    )
    a = pref.select(
        F.col("token"),
        F.col("id").alias("id_a"),
        F.col("n").alias("n_a"),
    )
    b = pref.select(
        F.col("token"),
        F.col("id").alias("id_b"),
        F.col("n").alias("n_b"),
    )
    cand = (
        a.join(b, "token")
        .where(F.col("id_a") < F.col("id_b"))
        # length filter: Jaccard ≥ t ⇒ t·n_a ≤ n_b and t·n_b ≤ n_a
        .where(
            (F.col("n_b") * t_den >= F.col("n_a") * t_num)
            & (F.col("n_a") * t_den >= F.col("n_b") * t_num)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    va = ordered.select(
        F.col("id").alias("id_a"),
        F.col("otoks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    vb = ordered.select(
        F.col("id").alias("id_b"),
        F.col("otoks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            inter.cast("long").alias("n_inter"),
        )
        .where(
            F.col("n_inter") * t_den
            >= t_num * (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        )
    )
