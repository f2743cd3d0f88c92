"""Hyperlink extraction and page-graph construction, pure Catalyst.

The web-corpus operator the crawl side of every LLM pipeline starts
from: pull ``<a href>`` targets out of the raw ``html: binary`` column,
resolve them against the page's own URL (RFC-3986-lite), canonicalize
with the same normalization the URL-dedup path uses
(:mod:`osm_spark.text.urls`), and emit a deduplicated ``(src, dst)``
edge list — the input to PageRank (:mod:`osm_spark.text.pagerank`),
host-level crawl budgeting, and seed selection.

Scale shape (the 100-TB view):

- Extraction is ``regexp_extract_all`` + ``explode`` + string CASEs —
  JVM-side, zero Python, a narrow map over the scan followed by one
  generator; no shuffle until the final ``distinct``. At 10^12 pages
  the scan cost dominates, which is the shape you want.
- ``distinct`` on (src, dst) is the one shuffle, map-side combinable.
  Hot dst keys (everyone links to the same homepage) are harmless
  here: distinct is a grouping where each group collapses to one row
  map-side before the exchange.
- Resolution semantics (documented contract): absolute URLs pass
  through; ``//host/...`` takes the source scheme; ``/path`` takes the
  source origin; anything else is resolved against the source URL's
  directory. ``mailto:``/``javascript:``/``tel:``/pure-fragment
  targets are dropped.

No reference analog (pmezard/osm has no web-graph stage); SURVEY
§2-ext. The q80 oracle re-extracts with an independently written
DuckDB regexp chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from osm_spark.text.urls import normalize_url

# href capture: double- and single-quoted <a ... href=...> forms (a
# real crawl carries both; worldgen emits the double-quoted form).
_HREF_RE_DQ = r'<a\\s[^>]*href="([^"]*)"'
_HREF_RE_SQ = r"<a\\s[^>]*href=\'([^\']*)\'"

_SKIP_RE = r"^(mailto:|javascript:|tel:|#|$)"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*):"
_ORIGIN_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+)"
_DIR_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^?#]*/)"


def _resolve_from_parts(
    href: Column, scheme: Column, origin: Column, directory: Column
) -> Column:
    """RFC-3986-lite resolution given the base URL's precomputed
    parts — the ONE implementation both resolve_href and extract_links
    share. A canonical site-root base ('https://a.com', trailing slash
    stripped by normalize_url) has no '/' after the origin, so the
    directory regex yields '' — fall back to origin + '/' instead of
    emitting a schemeless relative dst."""
    dir_or_root = F.when(directory != "", directory).otherwise(
        F.concat(origin, F.lit("/"))
    )
    return (
        F.when(href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(dir_or_root, href))
    )


def resolve_href(href: Column, base_url: Column) -> Column:
    """Absolute URL for ``href`` found on page ``base_url``."""
    return _resolve_from_parts(
        href,
        F.regexp_extract(base_url, _SCHEME_RE, 1),
        F.regexp_extract(base_url, _ORIGIN_RE, 1),
        # through the LAST '/' of the path (query/fragment excluded)
        F.regexp_extract(base_url, _DIR_RE, 1),
    )


def extract_links(
    df: DataFrame, html: str = "html", url: str = "url"
) -> DataFrame:
    """(src, dst) — one row per anchor, src/dst both canonical.

    Narrow until the caller aggregates; keeps duplicates and self
    links so anchor-level statistics stay possible. ``page_edges``
    applies the graph-semantics cleanup (distinct, self-free).
    """
    html_s = f"CAST({html} AS STRING)"
    hrefs = F.expr(
        f"concat(regexp_extract_all({html_s}, '{_HREF_RE_DQ}', 1), "
        f"regexp_extract_all({html_s}, '{_HREF_RE_SQ}', 1))"
    )
    # The base-URL parts (scheme/origin/directory) depend only on the
    # page, so compute them ONCE per page BEFORE the explode. Besides
    # dropping per-anchor regex work, this keeps the Generate stage's
    # single generated method small: inlining
    # normalize_url(resolve_href(href, normalize_url(url))) as one
    # expression tree multiplies the 9-regex normalization chain ~12x
    # and blows janino's 64 KB method limit, silently dropping the
    # whole extraction stage out of codegen into interpreted eval.
    pages = df.select(
        normalize_url(F.col(url)).alias("src"), hrefs.alias("hrefs")
    )
    rows = pages.select(
        "src",
        F.regexp_extract("src", _SCHEME_RE, 1).alias("base_scheme"),
        F.regexp_extract("src", _ORIGIN_RE, 1).alias("base_origin"),
        F.regexp_extract("src", _DIR_RE, 1).alias("base_dir"),
        F.explode("hrefs").alias("href"),
    ).where(~F.col("href").rlike(_SKIP_RE))
    resolved = _resolve_from_parts(
        F.col("href"),
        F.col("base_scheme"),
        F.col("base_origin"),
        F.col("base_dir"),
    )
    return rows.select("src", normalize_url(resolved).alias("dst"))


def page_edges(df: DataFrame, html: str = "html", url: str = "url") -> DataFrame:
    """Deduplicated, self-loop-free directed edge set over canonical
    URLs — the page graph. One map-side-combinable shuffle."""
    links = extract_links(df, html=html, url=url)
    return links.where(F.col("src") != F.col("dst")).distinct()


def host_graph(edges: DataFrame) -> DataFrame:
    """Collapse a canonical-URL page graph to the weighted host graph:
    (src_host, dst_host, n_links, n_src_pages). ``n_links`` counts the
    distinct page edges between the two hosts; ``n_src_pages`` the
    distinct linking pages — the two numbers crawl budgeting and
    domain-level spam scoring start from. Input must be canonical
    (``page_edges`` output): hosts are already lowercased.

    Scale shape: n_links is one map-side-combinable groupBy on the
    (src_host, dst_host) pair. n_src_pages uses the two-level exact
    pattern — pre-distinct on (src_host, dst_host, src), then count —
    instead of count_distinct, so a mega host pair (two CDNs linking
    everywhere) never funnels its raw edge multiset through one
    reducer: the pre-distinct collapses map-side too. Self pairs
    (intra-host links) are kept; callers filter if they only budget
    cross-host crawl.
    """
    host = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"
    e = edges.select(
        F.regexp_extract("src", host, 1).alias("src_host"),
        F.regexp_extract("dst", host, 1).alias("dst_host"),
        "src",
    )
    n_links = e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )
    n_src = (
        e.distinct()
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("n_src_pages"))
    )
    return n_links.join(n_src, ["src_host", "dst_host"])


def degree_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-node (url, outdeg, indeg) including isolated nodes.

    Two map-side-combinable groupBys + two left joins against the node
    set; at web scale both joins shuffle on url once and AQE handles
    the inevitable in-degree skew (mega-hubs) because the aggregates
    are already collapsed to one row per node before the join.
    """
    out_d = edges.groupBy(F.col("src").alias("url")).agg(
        F.count("*").alias("outdeg")
    )
    in_d = edges.groupBy(F.col("dst").alias("url")).agg(
        F.count("*").alias("indeg")
    )
    return (
        nodes.select("url")
        .join(out_d, "url", "left")
        .join(in_d, "url", "left")
        .select(
            "url",
            F.coalesce("outdeg", F.lit(0)).alias("outdeg"),
            F.coalesce("indeg", F.lit(0)).alias("indeg"),
        )
    )


def cocitation_edges(
    edges: DataFrame,
    mode: str = "cocitation",
    max_degree: int | None = None,
) -> DataFrame:
    """Similarity edges from the directed link graph (classic IR):

    - ``cocitation``: connect pages CITED BY a common page — pair per
      shared in-link (Small 1973).
    - ``coupling``: connect pages that CITE a common target —
      bibliographic coupling (Kessler 1963). (Co-citation groups by
      the linking page, coupling by the linked target.)

    Output: (src, dst, n_common) undirected canonical pairs
    (src < dst) weighted by the number of shared witnesses.

    Scale shape: one groupBy-free self-equi-join on the witness key;
    pair volume is Σ C(deg, 2) over witnesses — quadratic in witness
    degree, which is why ``max_degree`` exists: a mega-witness (a hub
    page linking everywhere / a target everyone links) contributes
    C(10^6, 2) pairs of near-zero signal. The standard cut drops
    witnesses above the cap BEFORE the join (one combinable degree
    groupBy + semi-join) — the same signal/volume trade-off as the
    inverted index's max_df stopword cut.
    """
    if mode == "cocitation":
        w = edges.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    elif mode == "coupling":
        w = edges.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    w = w.distinct()
    if max_degree is not None:
        deg = (
            w.groupBy("w")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") <= max_degree)
            .select("w")
        )
        w = w.join(deg, "w", "left_semi")
    return (
        w.alias("x")
        .join(w.alias("y"), "w")
        .where(F.col("x.u") < F.col("y.u"))
        .groupBy(
            F.col("x.u").alias("src"), F.col("y.u").alias("dst")
        )
        .agg(F.count("*").alias("n_common"))
    )
