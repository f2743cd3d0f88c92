"""Per-host boilerplate line removal (CCNet / C4-style).

Web pages from one host share chrome — nav bars, cookie banners,
footers — that is worthless as training text and, worse, inflates
near-dup signals between unrelated pages. The standard cure counts
each line's document frequency WITHIN its host and strips lines that
appear in more than a threshold fraction of the host's pages.

Scale shape:

- line counting is one explode of distinct-lines-per-doc followed by
  a (host, line) groupBy — map-side combinable, keyed on a high-
  cardinality composite so no hot reducer even for giant hosts;
- the boilerplate set is tiny per host (chrome, not content):
  collected to an array per host and joined back by host. A host's
  row is one array — a 10^8-page host still contributes one row here;
- removal is pure Catalyst array ops (split → filter → array_join):
  narrow, codegen-friendly, no Python.

The threshold is an integer PERCENT so both engines compare with
exact integer arithmetic (``n_line * 100 >= pct * n_docs``) — a float
fraction could disagree at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boilerplate_lines(
    docs: DataFrame,
    host: str = "host",
    text: str = "text",
    key: str = "doc_id",
    min_pct: int = 60,
    min_docs: int = 3,
) -> DataFrame:
    """(host, line, n_docs_with_line, host_docs) for every line whose
    within-host document frequency is >= min_pct percent, over hosts
    with at least ``min_docs`` pages (tiny hosts can't vote)."""
    # the empty line (paragraph separator) is document STRUCTURE: it
    # trivially clears any df threshold on multi-paragraph hosts, and
    # stripping it would merge unrelated paragraphs corpus-wide —
    # excluded from candidacy up front
    lines = docs.select(
        F.col(key),
        F.col(host),
        F.explode(
            F.array_distinct(F.split(F.col(text), "\n"))
        ).alias("line"),
    ).where(F.col("line") != "")
    counts = lines.groupBy(host, "line").agg(
        F.count("*").alias("n_docs_with_line")
    )
    host_docs = docs.groupBy(host).agg(F.count("*").alias("host_docs"))
    return (
        counts.join(host_docs, host)
        .where(F.col("host_docs") >= min_docs)
        .where(
            F.col("n_docs_with_line") * 100 >= F.lit(min_pct) * F.col("host_docs")
        )
    )


def remove_boilerplate(
    docs: DataFrame,
    host: str = "host",
    text: str = "text",
    key: str = "doc_id",
    min_pct: int = 60,
    min_docs: int = 3,
) -> DataFrame:
    """Strip each doc's boilerplate lines, preserving the order of the
    surviving lines. Returns (key, host, cleaned_text, n_removed_lines,
    n_kept_lines)."""
    bp = (
        boilerplate_lines(docs, host, text, key, min_pct, min_docs)
        .groupBy(host)
        .agg(F.collect_set("line").alias("bp_lines"))
    )
    joined = docs.join(bp, host, "left")
    all_lines = F.split(F.col(text), "\n")
    kept = F.when(
        F.col("bp_lines").isNull(), all_lines
    ).otherwise(
        F.filter(
            all_lines,
            lambda x: ~F.array_contains(F.col("bp_lines"), x),
        )
    )
    return joined.select(
        F.col(key),
        F.col(host),
        F.array_join(kept, "\n").alias("cleaned_text"),
        (F.size(all_lines) - F.size(kept)).alias("n_removed_lines"),
        F.size(kept).alias("n_kept_lines"),
    )
