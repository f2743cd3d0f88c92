"""HTML -> text extraction, pure Catalyst.

This is the north-rule's per-row invariant made executable: the
Common-Crawl-style pages table carries ``html: binary`` and ``text:
string`` (BASELINE.json input_hint), and "byte-identical extracted
text per url" means ``extract_text(html) == text`` for every row, at
every scale, on every engine. The reference pipeline (pmezard/osm)
treats its input text as immutable bytes end-to-end; here the
extraction step itself is part of the engine, so it must be a
deterministic function of the bytes — no heuristic readability
scoring, no library whose version changes the output.

Implementation notes (the 100-TB view):

- Everything is ``regexp_replace``/``replace`` on a decoded UTF-8
  string: JVM-side, whole-stage-codegen-friendly, zero Python, no
  shuffle — a pure narrow map over the scan. At 10^12 rows this is
  the shape you want: the scan's cost IS the job's cost.
- Stripping order matters and is part of the contract:
  1. drop ``<head>...</head>`` (title/meta are markup, not content),
  2. drop ``<script>...</script>`` blocks (their bodies may contain
     bare ``<``/``>`` that the generic tag stripper must never see),
  3. drop ``<style>...</style>`` blocks,
  4. drop comments ``<!-- ... -->``,
  5. strip remaining tags ``<[^>]*>`` (attributes included),
  6. decode entities, ``&amp;`` LAST (so ``&amp;lt;`` correctly
     yields the text ``&lt;``, not ``<``).
- Documented limitation (shared with every regex extractor): an
  attribute value containing a literal ``>`` inside quotes truncates
  that tag early. CDATA sections are not special-cased. Both are
  pinned in tests as chosen semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (entity, replacement) in DECODE ORDER — '&amp;' must stay last.
HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&#44;", ","),
    ("&#46;", "."),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&quot;", '"'),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
)

_HEAD_RE = r"(?is)<head\b[^>]*>.*?</head>"
_SCRIPT_RE = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"<[^>]*>"


def extract_text_col(html_col: Column | str) -> Column:
    """Column expression: html bytes (binary or string) -> extracted
    text. One linear chain of JVM string ops; codegen keeps it inside
    the scan stage."""
    c = F.col(html_col) if isinstance(html_col, str) else html_col
    u = c.cast("string")  # binary -> UTF-8
    for pat in (_HEAD_RE, _SCRIPT_RE, _STYLE_RE, _COMMENT_RE, _TAG_RE):
        u = F.regexp_replace(u, pat, "")
    for ent, ch in HTML_ENTITIES:
        u = F.replace(u, F.lit(ent), F.lit(ch))
    return u


def extract_text(
    df: DataFrame, html_col: str = "html", out_col: str = "extracted_text"
) -> DataFrame:
    """Append ``out_col`` with the extracted text."""
    return df.withColumn(out_col, extract_text_col(html_col))


def verify_extraction(
    df: DataFrame, html_col: str = "html", text_col: str = "text"
) -> DataFrame:
    """Per-row invariant check: (url rows..., identical: boolean).
    ``identical`` is byte equality between the extraction and the
    stored text — the aggregate ``min(identical)`` over 10^12 rows is
    the cheapest possible end-to-end corruption tripwire (one boolean
    AND, map-side combinable)."""
    return df.withColumn(
        "identical", extract_text_col(html_col) == F.col(text_col)
    )
