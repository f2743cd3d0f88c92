"""Link extraction + integer PageRank tests."""

import pytest
from pyspark.sql import functions as F

from osm_spark.text.links import (
    degree_stats,
    extract_links,
    page_edges,
    resolve_href,
)
from osm_spark.text.pagerank import SCALE, pagerank


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


RESOLVE_CASES = [
    # (href, base, resolved-then-normalized dst)
    ("https://other.net/x", "https://example.org/page/1", "https://other.net/x"),
    ("//cdn.net/a.js", "https://example.org/page/1", "https://cdn.net/a.js"),
    ("/page/7", "https://example.org/page/1", "https://example.org/page/7"),
    ("sub/9", "https://example.org/page/1", "https://example.org/page/sub/9"),
    (
        "/p?utm_source=x#frag",
        "https://example.org/page/1",
        "https://example.org/p",
    ),
    (
        "https://www.example.org:443/page/3",
        "https://example.org/page/1",
        "https://example.org/page/3",
    ),
]


def test_resolve_and_normalize(spark):
    from osm_spark.text.urls import normalize_url

    df = spark.createDataFrame(
        [(h, b) for h, b, _ in RESOLVE_CASES], ["href", "base"]
    )
    got = df.select(
        normalize_url(resolve_href(F.col("href"), F.col("base"))).alias("dst")
    ).collect()
    for row, (_, _, want) in zip(got, RESOLVE_CASES):
        assert row["dst"] == want


def _html(anchors):
    body = "".join(f'<a href="{h}">x</a>' for h in anchors)
    return f"<html><body>{body}</body></html>".encode()


def test_extract_links_skips_non_http(spark):
    df = spark.createDataFrame(
        [
            (
                "https://example.org/page/1",
                _html(
                    [
                        "mailto:a@b.c",
                        "javascript:void(0)",
                        "tel:+123",
                        "#frag",
                        "",
                        "/page/2",
                    ]
                ),
            )
        ],
        ["url", "html"],
    )
    got = extract_links(df).collect()
    assert [(r["src"], r["dst"]) for r in got] == [
        ("https://example.org/page/1", "https://example.org/page/2")
    ]


def test_page_edges_self_free_distinct(spark):
    df = spark.createDataFrame(
        [
            (
                "https://example.org/page/1",
                _html(["/page/1", "/page/2", "/page/2?utm_source=x"]),
            )
        ],
        ["url", "html"],
    )
    got = page_edges(df).collect()
    assert [(r["src"], r["dst"]) for r in got] == [
        ("https://example.org/page/1", "https://example.org/page/2")
    ]


def test_degree_stats_includes_isolated(spark):
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["url"])
    edges = spark.createDataFrame([("a", "b"), ("c", "b")], ["src", "dst"])
    got = {
        r["url"]: (r["outdeg"], r["indeg"])
        for r in degree_stats(nodes, edges).collect()
    }
    assert got == {"a": (1, 0), "b": (0, 2), "c": (1, 0)}


def _pagerank_py(urls, edges, iterations=5, damping_pct=85):
    """Independent pure-python twin of the integer PageRank spec."""
    n = len(urls)
    base = SCALE // n
    teleport = (100 - damping_pct) * base // 100
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {u: base for u in urls}
    for _ in range(iterations):
        dangle = sum(r for u, r in rank.items() if u not in outdeg)
        sums = {u: 0 for u in urls}
        for s, d in edges:
            sums[d] += rank[s] // outdeg[s]
        rank = {
            u: teleport + damping_pct * (sums[u] + dangle // n) // 100
            for u in urls
        }
    return rank


def test_pagerank_two_cycle_stable(spark):
    nodes = spark.createDataFrame([("a",), ("b",)], ["url"])
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], ["src", "dst"])
    got = {r["url"]: r["rank"] for r in pagerank(nodes, edges, 4).collect()}
    # symmetric cycle: mass never moves; base = SCALE/2 divides evenly
    assert got == {"a": SCALE // 2, "b": SCALE // 2}


def test_pagerank_matches_python_twin(spark):
    urls = [f"u{i}" for i in range(12)]
    # star into u0, a chain, two dangling nodes (u10, u11)
    edges = [(f"u{i}", "u0") for i in range(1, 6)] + [
        ("u6", "u7"),
        ("u7", "u8"),
        ("u8", "u9"),
        ("u0", "u6"),
    ]
    nodes = spark.createDataFrame([(u,) for u in urls], ["url"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    want = _pagerank_py(urls, edges)
    got = {r["url"]: r["rank"] for r in pagerank(nodes, edf, 5).collect()}
    assert got == want


def test_pagerank_partitioning_invariant(spark):
    """Integer arithmetic => bit-identical ranks at any parallelism
    (the north rule's identical-output-at-N-and-4N property)."""
    urls = [f"u{i}" for i in range(30)]
    edges = [(f"u{i}", f"u{(i * 7 + 3) % 30}") for i in range(30) if i % 3]
    nodes = spark.createDataFrame([(u,) for u in urls], ["url"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    a = pagerank(nodes.repartition(1), edf.repartition(1), 4).collect()
    b = pagerank(nodes.repartition(16), edf.repartition(16), 4).collect()
    assert sorted((r["url"], r["rank"]) for r in a) == sorted(
        (r["url"], r["rank"]) for r in b
    )


def test_pagerank_checkpoint_every_same_result(spark):
    urls = [f"u{i}" for i in range(8)]
    edges = [(f"u{i}", f"u{(i + 1) % 8}") for i in range(6)]
    nodes = spark.createDataFrame([(u,) for u in urls], ["url"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    plain = pagerank(nodes, edf, 4).collect()
    ckpt = pagerank(nodes, edf, 4, checkpoint_every=2).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, ckpt))


def test_worldgen_links_outdegree(spark):
    """Page i carries exactly i % 4 anchors, all resolving into the
    canonical page-url space."""
    from osm_spark.data.pages import PagesSpec, pages_df

    pages = pages_df(spark, PagesSpec(n_pages=40))
    links = extract_links(pages)
    per_src = {
        r["src"]: r["n"]
        for r in links.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    for i in range(40):
        want = i % 4
        got = per_src.get(f"https://example.org/page/{i}", 0)
        assert got == want, (i, got, want)
    urls = {r["url"] for r in pages.select("url").collect()}
    assert {r["dst"] for r in links.collect()} <= urls


def test_host_graph_weights_and_distinct_pages(spark):
    from osm_spark.text.links import host_graph

    edges = [
        # a.com -> b.org : two pages, three page-edges
        ("https://a.com/1", "https://b.org/x"),
        ("https://a.com/1", "https://b.org/y"),
        ("https://a.com/2", "https://b.org/x"),
        # intra-host pair kept
        ("https://a.com/1", "https://a.com/2"),
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        (r["src_host"], r["dst_host"]): (r["n_links"], r["n_src_pages"])
        for r in host_graph(df).collect()
    }
    assert got == {
        ("a.com", "b.org"): (3, 2),
        ("a.com", "a.com"): (1, 1),
    }


def test_weighted_pagerank_matches_python_twin(spark):
    from osm_spark.text.pagerank import SCALE, WEIGHT_Q, pagerank

    nodes = ["a", "b", "c", "d"]  # d dangles
    edges_w = [("a", "b", 3), ("a", "c", 1), ("b", "c", 5), ("c", "a", 2)]
    iters, damping = 3, 85

    n = len(nodes)
    base = SCALE // n
    tele = (100 - damping) * base // 100
    w_tot = {}
    for s, _d, w in edges_w:
        w_tot[s] = w_tot.get(s, 0) + w
    wn = {(s, d): (w * WEIGHT_Q) // w_tot[s] for s, d, w in edges_w}
    r = {u: base for u in nodes}
    for _ in range(iters):
        dangle = sum(r[u] for u in nodes if u not in w_tot)
        shared = dangle // n
        acc = {u: 0 for u in nodes}
        for (a, b), q in wn.items():
            acc[b] += (r[a] * q) // WEIGHT_Q
        r = {
            u: tele + (damping * (acc[u] + shared)) // 100 for u in nodes
        }

    got = {
        row["url"]: row["rank"]
        for row in pagerank(
            spark.createDataFrame([(u,) for u in nodes], ["url"]),
            spark.createDataFrame(edges_w, ["src", "dst", "w"]),
            iterations=iters,
            damping_pct=damping,
            weight="w",
        ).collect()
    }
    assert got == r
    # weights matter: b (weight 3 of 4 from a) outranks nothing else
    # linking it, and c (5/5 from b + 1/4 from a) outranks b
    assert got["c"] > got["b"] > got["d"]


def test_extract_links_single_quoted_href_and_root_page_base(spark):
    from osm_spark.text.links import extract_links

    pages = [
        # single-quoted anchor form
        ("https://a.com/dir/p", b"<a class='x' href='https://b.org/q'>"),
        # relative href on a canonical site-root page (no path slash):
        # must resolve against origin + '/', not to a bare 'about'
        ("https://a.com", b'<a href="about">'),
    ]
    df = spark.createDataFrame(pages, ["url", "html"])
    got = sorted(map(tuple, extract_links(df).collect()))
    assert got == [
        ("https://a.com", "https://a.com/about"),
        ("https://a.com/dir/p", "https://b.org/q"),
    ]


def test_cocitation_and_coupling(spark):
    """Golden: hub h cites a,b,c → co-citation triangle abc; a,b both
    cite t → coupling pair (a,b); max_degree cap drops the hub's
    contribution entirely."""
    from osm_spark.text.links import cocitation_edges

    edges = spark.createDataFrame(
        [
            ("h", "a"), ("h", "b"), ("h", "c"),
            ("a", "t"), ("b", "t"),
            ("a", "t2"), ("b", "t2"),
        ],
        "src string, dst string",
    )
    co = sorted(
        map(tuple, cocitation_edges(edges, "cocitation").collect())
    )
    # h's out-set {a,b,c} → triangle; a and b each cite {t,t2} →
    # co-citation pair (t,t2) with two witnesses
    assert co == [
        ("a", "b", 1), ("a", "c", 1), ("b", "c", 1), ("t", "t2", 2),
    ]
    cp = sorted(
        map(tuple, cocitation_edges(edges, "coupling").collect())
    )
    # a and b share two targets (t, t2); h shares none
    assert cp == [("a", "b", 2)]
    capped = sorted(
        map(
            tuple,
            cocitation_edges(
                edges, "cocitation", max_degree=2
            ).collect(),
        )
    )
    # hub h (deg 3) is cut; witnesses a, b (deg 2) still co-cite t/t2
    assert capped == [("t", "t2", 2)]
    cap_cp = sorted(
        map(
            tuple,
            cocitation_edges(edges, "coupling", max_degree=2).collect(),
        )
    )
    assert cap_cp == [("a", "b", 2)]
