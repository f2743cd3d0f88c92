"""Deduplication family: exact, MinHash+LSH, SimHash, Jaccard verify.

All hash arithmetic is md5-prefix→int64 based so the DuckDB differential
oracle reproduces every signature bit-for-bit (engine-native hash
functions like xxhash64 differ between engines and are only used for
non-compared internals).

Scale shapes:
- exact: one groupBy on the content hash (map-side combinable).
- MinHash: explode distinct tokens → one groupBy(doc) computing all K
  min-aggregates in a single pass (no per-hash shuffle).
- LSH: band-key self-join produces candidate pairs; the band join is an
  equi-join on a low-cardinality-per-key column — skew comes from
  degenerate bands (all-identical docs) and is bounded by banding.
- verify: unigram Jaccard on candidates only (never all-pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.analysis import MD5_LONG_SQL, TOKENS_SQL

# MinHash parameters: K hashes, universal-hash family over M (prime).
MINHASH_K = 8
MINHASH_M = 2147483647  # 2^31 - 1
MINHASH_A = [1103515245, 1103517217, 69069, 1664525, 22695477, 134775813, 214013, 16843009]
MINHASH_B = [12345, 362437, 521288629, 1013904223, 32830301, 1, 2531011, 826366247]

SIMHASH_BITS = 16


def token_hash_sql(tok: str = "tok") -> str:
    return MD5_LONG_SQL.format(t=tok) + f" % {MINHASH_M}"


def exact_dedup(docs: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """(content_md5, n_docs, keep_id): one survivor per identical text."""
    return (
        docs.select(F.md5(F.col(text)).alias("content_md5"), F.col(key))
        .groupBy("content_md5")
        .agg(F.count("*").alias("n_docs"), F.min(key).alias("keep_id"))
    )


def minhash_signatures(
    docs: DataFrame, text: str = "text", key: str = "doc_id", k: int = MINHASH_K
) -> DataFrame:
    """(doc_id, mh0..mh{k-1}) — K minhashes over the distinct token set."""
    toks = docs.select(
        F.col(key),
        F.explode(F.array_distinct(F.expr(TOKENS_SQL.format(t=text)))).alias("tok"),
    )
    h = F.expr(token_hash_sql("tok"))
    toks = toks.select(key, h.alias("h"))
    aggs = [
        F.min((F.col("h") * MINHASH_A[i] + MINHASH_B[i]) % MINHASH_M).alias(f"mh{i}")
        for i in range(k)
    ]
    return toks.groupBy(key).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, key: str = "doc_id", bands: int = 4, rows: int = 2
) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing at least one full band."""
    sig_cols = [c for c in signatures.columns if c.startswith("mh")]
    assert len(sig_cols) >= bands * rows
    pair_frames = []
    for b in range(bands):
        band_cols = sig_cols[b * rows : (b + 1) * rows]
        left = signatures.select(
            F.col(key).alias("id_a"), *[F.col(c) for c in band_cols]
        )
        right = signatures.select(
            F.col(key).alias("id_b"), *[F.col(c) for c in band_cols]
        )
        pair_frames.append(
            left.join(right, band_cols).where(F.col("id_a") < F.col("id_b")).select(
                "id_a", "id_b"
            )
        )
    out = pair_frames[0]
    for fr in pair_frames[1:]:
        out = out.unionByName(fr)
    return out.distinct()


def simhash(docs: DataFrame, text: str = "text", key: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — per-bit majority vote over token hashes."""
    toks = docs.select(
        F.col(key),
        F.explode(F.array_distinct(F.expr(TOKENS_SQL.format(t=text)))).alias("tok"),
    ).select(key, F.expr(token_hash_sql("tok")).alias("h"))
    votes = [
        F.sum(
            (F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(key).agg(*votes)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return agg.select(key, sim.alias("simhash"))


def simhash_near_pairs(sim: DataFrame, key: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) pairs within Hamming distance, via 4-band
    blocking on simhash nibbles (a pair within distance 3 shares at
    least one exact nibble of a 16-bit hash split into 4)."""
    nibbles = [
        F.shiftright(F.col("simhash"), 4 * i).bitwiseAND(F.lit(0xF)).alias(f"n{i}")
        for i in range(4)
    ]
    s = sim.select(F.col(key), F.col("simhash"), *nibbles)
    frames = []
    for i in range(4):
        left = s.select(
            F.col(key).alias("id_a"), F.col("simhash").alias("sh_a"), F.col(f"n{i}")
        )
        right = s.select(
            F.col(key).alias("id_b"), F.col("simhash").alias("sh_b"), F.col(f"n{i}")
        )
        frames.append(
            left.join(right, f"n{i}")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "sh_a", "sh_b")
        )
    cand = frames[0]
    for fr in frames[1:]:
        cand = cand.unionByName(fr)
    cand = cand.distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def unigram_jaccard_pairs(
    docs: DataFrame, pairs: DataFrame, text: str = "text", key: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Jaccard over distinct token sets for candidate pairs:
    (id_a, id_b, jaccard)."""
    tok = docs.select(
        F.col(key), F.array_distinct(F.expr(TOKENS_SQL.format(t=text))).alias("toks")
    )
    a = tok.select(F.col(key).alias("id_a"), F.col("toks").alias("toks_a"))
    b = tok.select(F.col(key).alias("id_b"), F.col("toks").alias("toks_b"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        j.select(
            "id_a",
            "id_b",
            (inter.cast("double") / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def ngram_shingles_sql(text: str, n: int = 3) -> str:
    """Spark SQL for token n-gram shingle array (used by tests and the
    shingle-based near-dup variant)."""
    toks = TOKENS_SQL.format(t=text)
    return (
        f"transform(sequence(1, greatest(size({toks}) - {n - 1}, 0)), "
        f"i -> concat_ws(' ', slice({toks}, i, {n})))"
    )
