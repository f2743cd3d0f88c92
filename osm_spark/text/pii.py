"""PII detection and redaction over a documents table.

A web-scale training-data pipeline must strip personally identifying
strings before a corpus ships. This module detects and redacts the
three highest-volume machine-recognizable classes — email addresses,
IPv4 addresses, phone numbers — with pure Catalyst regex expressions
(JVM-side, whole-stage-codegen-safe: `regexp_extract_all` for counts,
chained `regexp_replace` for redaction). No Python in the row path.

The patterns deliberately use only the regex subset with identical
semantics in Java (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, \\b word boundaries — so the DuckDB oracle can run
the exact same expressions (q66).

Scale: one narrow projection over the text column; no shuffle, no UDF.
At 100 TB this is the cheapest kind of pass there is, and it pipelines
with any other per-document map (langid, quality, token stats) in the
same stage.

No reference analog (pmezard/osm has no text pipeline); SURVEY §2-ext.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Pattern order is the redaction order: emails first (an email's host
# part must not be half-eaten by a later rule), then IPs, then phones.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2} \d{3} \d{4,6}", "<PHONE>"),
]


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def with_pii_scrub(docs: DataFrame, text: str = "text") -> DataFrame:
    """Add per-class match counts (n_email, n_ipv4, n_phone) and a
    ``clean_text`` column with every match replaced by its class tag.
    Counts are measured on the ORIGINAL text; redaction is sequential
    in PII_PATTERNS order."""
    col = F.col(text)
    out = docs
    for name, pattern, _tag in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", _count(col, pattern))
    clean = col
    for _name, pattern, tag in PII_PATTERNS:
        clean = F.regexp_replace(clean, pattern, tag)
    return out.withColumn("clean_text", clean)
