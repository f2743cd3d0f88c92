"""URL normalization and host-level aggregation.

Web-corpus canonicalization: two crawls of the same page routinely
differ in scheme/host case, a ``www.`` prefix, an explicit default
port, tracking query parameters, fragments, and trailing slashes.
URL-level dedup and per-host statistics (crawl budgeting, domain
blocklists) need one canonical form first.

All steps are pure Catalyst string/regex expressions (JVM-side,
codegen-safe): no UDF, no shuffle for the per-row part; the host
aggregation is one map-side-combinable groupBy. The regexes use only
the Java/RE2-common PATTERN subset (no lookaround — RE2 has none);
replacements DO use backreferences, each dialect spelling its own
(``$1`` in Java/Spark here, ``\\1`` in the DuckDB oracle chain) — the
q68 oracle pins the two chains equal, so the syntax split is tested,
not assumed.

``registered_domain`` is the last two dot-labels — a deliberate
approximation (no public-suffix list in the sandbox; a real deployment
swaps in one broadcast lookup against the PSL). Documented limitation:
``example.co.uk`` yields ``co.uk``.

No reference analog; SURVEY §2-ext.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEME_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*"


def normalize_url(url: Column) -> Column:
    """Canonical URL form:

    1. strip the fragment
    2. lowercase the scheme://host prefix (path/query case preserved)
    3. drop a leading ``www.`` host label
    4. drop explicit default ports (:80, :443)
    5. drop ``utm_*`` tracking query parameters (and a dangling ``?``)
    6. strip trailing slashes
    """
    u = F.regexp_replace(url, r"#.*", "")
    prefix = F.regexp_extract(u, _SCHEME_HOST_RE, 0)
    u = F.concat(F.lower(prefix), F.substr(u, F.length(prefix) + F.lit(1)))
    # Every structural rule below is ANCHORED to the URL's own shape:
    # unanchored variants rewrote path/query CONTENT ('?to=https://
    # www.b.com' losing its www, '/time:80/view' losing ':80', and
    # 'xutm_a=1&' losing the tail of a non-utm parameter name) —
    # collapsing distinct pages into one canonical form. The rules use
    # backreferences; each engine spells its own syntax ($1 Java here,
    # \1 RE2 in the DuckDB oracle chain) and q68 pins their equality.
    u = F.regexp_replace(u, r"^([a-z][a-z0-9+.-]*://)www\.", "$1")
    u = F.regexp_replace(
        u, r"^([a-z][a-z0-9+.-]*://[^/:?#]+):(80|443)([/?#].*)?$", "$1$3"
    )
    u = F.regexp_replace(u, r"([?&])(utm_[a-z_]+=[^&#]*&)+", "$1")
    u = F.regexp_replace(u, r"[?&]utm_[a-z_]+=[^&#]*$", "")
    u = F.regexp_replace(u, r"\?$", "")
    return F.regexp_replace(u, r"/+$", "")


def latest_snapshot(
    df: DataFrame, url: str = "url", ts: str = "warc_ts"
) -> DataFrame:
    """One surviving capture per canonical URL (CDX-style revisit
    dedup over a multi-snapshot crawl): within each
    :func:`normalize_url` group, keep the row with the greatest
    (``ts``, ``url``, remaining columns) and report the group's
    capture count. Returns (norm_url, n_captures, *df.columns).

    Scale shape: ONE groupBy(norm_url) with a struct-max aggregate —
    map-side combinable, so each upstream partition collapses to one
    candidate row per group before the exchange. The classic
    window/row_number formulation shuffles and sorts every capture of
    the corpus; this shuffles one pre-reduced row per (partition,
    group), which is what a 10^12-capture crawl needs. The struct agg
    buffer forces SortAggregate instead of HashAggregate (a known
    Spark limitation for non-primitive buffers) — the partial/final
    split and map-side combine are unchanged, only the per-partition
    grouping is sort-based. Ties beyond the
    timestamp are broken by the raw URL then the remaining columns in
    order, so the winner is total-order deterministic. ``df`` must not
    already contain columns named ``_ts``/``_u``/``norm_url``.
    """
    cols = df.columns
    packed = df.select(
        normalize_url(F.col(url)).alias("norm_url"),
        F.struct(
            F.col(ts).alias("_ts"),
            F.col(url).alias("_u"),
            *[F.col(c) for c in cols],
        ).alias("_cap"),
    )
    agg = packed.groupBy("norm_url").agg(
        F.max("_cap").alias("_cap"),
        F.count("*").alias("n_captures"),
    )
    return agg.select(
        "norm_url",
        "n_captures",
        *[F.col(f"_cap.{c}").alias(c) for c in cols],
    )


def with_url_parts(df: DataFrame, url: str = "url") -> DataFrame:
    """Add norm_url, host, registered_domain columns."""
    norm = normalize_url(F.col(url))
    host = F.regexp_extract(norm, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    domain = F.regexp_extract(host, r"[a-z0-9-]+\.[a-z]+$", 0)
    return (
        df.withColumn("norm_url", norm)
        .withColumn("host", host)
        .withColumn("registered_domain", domain)
    )


def host_stats(df: DataFrame, url: str = "url") -> DataFrame:
    """Per-host crawl statistics over canonical URLs: page count and
    distinct canonical URLs (their difference = URL-level duplicates)."""
    parts = with_url_parts(df, url)
    return parts.groupBy("host", "registered_domain").agg(
        F.count("*").alias("n_pages"),
        F.countDistinct("norm_url").alias("n_distinct_urls"),
    )
