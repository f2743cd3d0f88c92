"""Exact substring (duplicated-span) deduplication.

Document- and paragraph-level exact dedup (text/dedup.py,
text/paragraphs.py) miss the third duplication mode in web corpora:
long verbatim SPANS embedded in otherwise-distinct documents — quoted
articles, templated footers longer than one paragraph, copied code.
Training-data work (Lee et al. 2021, "Deduplicating Training Data
Makes Language Models Better") removes any duplicated window of ~50
tokens, keeping one occurrence; this module is that operator,
re-expressed as a distributed shuffle plan instead of a monolithic
suffix array.

Semantics (pinned in tests and the q106 oracle):

- tokenization is the engine-wide one (:func:`analysis.tokens_col`);
  output text is rebuilt from kept TOKENS (the operator's domain is
  the token stream, as in the reference algorithm — not raw bytes);
- every K-token window of every document is fingerprinted; a window
  string occurring more than once corpus-wide is a duplicate;
- the single KEPT occurrence per window string is the minimum
  (key, position) pair — a pure function of the data, identical
  across runs, partitionings and cluster sizes;
- every other occurrence becomes a removal span [pos, pos+K); a token
  is dropped iff ANY removal span of its own document covers it
  (overlapping spans compose; the kept occurrence's tokens survive
  unless a DIFFERENT duplicated window covers them);
- every input row comes back out (a fully-duplicated document returns
  empty cleaned text, never a lost key).

Scale shape (the 10^12-doc view):

- Windows are one posexplode over the scan: n-K+1 rows per n-token
  doc, each a (key, pos, window) triple. The only corpus-scale
  shuffles are (a) the groupBy(window) that finds duplicated windows
  — map-side-combinable min(struct) + count, and a 10^7-copy
  boilerplate window collapses to one partial per upstream partition
  — and (b) the equi-join of occurrences back to the (small,
  duplicated-only) winner set, then one groupBy(key) regroup. At
  petabyte scale the join key becomes a 64-bit window hash (same
  plan, 8-byte rows; collision odds ~n²/2^64 and any hit only
  over-deletes one window).
- Per-document span application is pure Catalyst: the span starts are
  merged into disjoint islands with one ``aggregate`` fold over the
  sorted starts (so a pathological fully-duplicated document costs
  O(n · islands) checks with few islands, not O(n²) raw-span
  checks), and the keep predicate is one ``exists`` over the merged
  island array per token.

No reference analog (pmezard/osm has no text pipeline); SURVEY
§2-ext X67. The q106 oracle recomputes winners, spans and the token
coverage with DuckDB window functions — a different algorithm,
hash-exact on the cleaned text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osm_spark.text.analysis import TOKENS_SQL


def _windows_sql(k: int) -> str:
    """Array of (pos, window-string) structs; pos is 0-based. Empty
    when the document has fewer than ``k`` tokens (sequence(1, 0)
    would count DOWN — same guard as ngram_shingles_sql)."""
    return (
        f"CASE WHEN size(toks) < {k} THEN "
        f"array() "
        f"ELSE transform(sequence(0, size(toks) - {k}), "
        f"i -> struct(i AS pos, concat_ws(' ', slice(toks, i + 1, {k})) AS win)) END"
    )


def dedup_substrings(
    docs: DataFrame, k: int = 8, key: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Remove every duplicated K-token span, keeping the globally
    first occurrence. Returns (key, cleaned_text, n_tokens,
    n_kept_tokens, n_dup_windows) for every input row.

    ``n_dup_windows`` counts this document's REMOVED window
    occurrences (the audit number: how many fingerprints fired).
    """
    toks = docs.select(
        F.col(key), F.expr(TOKENS_SQL.format(t=text)).alias("toks")
    )
    occ = toks.select(
        key, F.explode(F.expr(_windows_sql(k))).alias("w")
    ).select(key, F.col("w.pos").alias("pos"), F.col("w.win").alias("win"))

    # Duplicated windows only: the winner (min (key, pos)) and the
    # occurrence count come out of ONE map-side-combinable pass.
    dup = (
        occ.groupBy("win")
        .agg(F.min(F.struct(key, "pos")).alias("w"), F.count("*").alias("c"))
        .where(F.col("c") > 1)
        .select("win", "w")
    )
    # Removal spans: every occurrence of a duplicated window except
    # the winner itself.
    spans = (
        occ.join(dup, "win")
        .where(
            (F.col("w." + key) != F.col(key)) | (F.col("w.pos") != F.col("pos"))
        )
        .groupBy(key)
        .agg(
            F.sort_array(F.collect_list("pos")).alias("starts"),
        )
    )

    # Merge sorted starts into disjoint [s, e) islands with one fold,
    # then keep token i iff no island covers it. Island array is tiny
    # after merging (bounded by the doc's distinct duplicated regions).
    # The fold is seeded with a sentinel island (e = -1 < every 0-based
    # start, so it never merges with a real one and is filtered out at
    # the end) so element_at(acc, -1) is always in bounds — ANSI-safe.
    islands = (
        f"filter(aggregate(starts, "
        f"array(struct(CAST(-1 AS INT) AS s, CAST(-1 AS INT) AS e)), "
        f"(acc, s) -> "
        f"CASE WHEN element_at(acc, -1).e >= s "
        f"THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array(struct(element_at(acc, -1).s AS s, "
        f"CAST(s + {k} AS INT) AS e))) "
        f"ELSE concat(acc, array(struct(CAST(s AS INT) AS s, "
        f"CAST(s + {k} AS INT) AS e))) END), "
        f"il -> il.s >= 0)"
    )
    kept = (
        "filter(transform(toks, (x, i) -> struct(x AS tok, i AS i)), "
        "p -> NOT exists(isl, il -> il.s <= p.i AND p.i < il.e))"
    )
    out = (
        toks.join(spans, key, "left")
        .withColumn(
            "isl",
            F.expr(
                f"CASE WHEN starts IS NULL THEN array() ELSE {islands} END"
            ),
        )
        .withColumn("kept", F.expr(kept))
        .select(
            key,
            F.array_join(
                F.transform("kept", lambda p: p["tok"]), " "
            ).alias("cleaned_text"),
            F.size("toks").cast("long").alias("n_tokens"),
            F.size("kept").cast("long").alias("n_kept_tokens"),
            F.coalesce(F.size("starts"), F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
    )
    return out
