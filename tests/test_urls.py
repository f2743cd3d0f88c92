"""URL normalization tests."""

import pytest

from osm_spark.text.urls import host_stats, with_url_parts


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


CASES = [
    # (raw, norm, host, domain)
    (
        "HTTPS://WWW.News.Example.COM:443/Art/5?utm_source=x&id=5#top",
        "https://news.example.com/Art/5?id=5",
        "news.example.com",
        "example.com",
    ),
    (
        "http://blog.sample.com:80/post/",
        "http://blog.sample.com/post",
        "blog.sample.com",
        "sample.com",
    ),
    (
        "https://a.io/p?utm_medium=email",
        "https://a.io/p",
        "a.io",
        "a.io",
    ),
    (
        "https://a.io/p?utm_a=1&utm_b=2&keep=3",
        "https://a.io/p?keep=3",
        "a.io",
        "a.io",
    ),
    (
        "https://www.x.org/",
        "https://x.org",
        "x.org",
        "x.org",
    ),
    (
        "https://x.org:443",
        "https://x.org",
        "x.org",
        "x.org",
    ),
    # anchored-rule regressions: structural rewrites must never touch
    # path/query CONTENT
    (
        "https://a.com/r?to=https://www.b.com/x",
        "https://a.com/r?to=https://www.b.com/x",
        "a.com",
        "a.com",
    ),
    (
        "https://a.com/time:80/view",
        "https://a.com/time:80/view",
        "a.com",
        "a.com",
    ),
    (
        "https://a.com/p?xutm_a=1&b=2",
        "https://a.com/p?xutm_a=1&b=2",
        "a.com",
        "a.com",
    ),
    (  # port 8080 is NOT a default port
        "https://a.com:8080/x",
        "https://a.com:8080/x",
        "a.com",
        "a.com",
    ),
]


def test_normalize_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_rest) in enumerate(CASES)],
        "i long, url string",
    )
    got = {r.i: r for r in with_url_parts(df).collect()}
    for i, (_raw, norm, host, domain) in enumerate(CASES):
        assert got[i].norm_url == norm, (i, got[i].norm_url)
        assert got[i].host == host, (i, got[i].host)
        assert got[i].registered_domain == domain


def test_host_stats_counts_url_dups(spark):
    rows = [
        (1, "https://www.a.com/p1"),
        (2, "https://a.com/p1/"),  # same canonical as 1
        (3, "HTTPS://a.com/p2#x"),
        (4, "https://b.net/q?utm_source=s"),
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    got = {r.host: r for r in host_stats(df).collect()}
    assert got["a.com"].n_pages == 3
    assert got["a.com"].n_distinct_urls == 2
    assert got["a.com"].registered_domain == "a.com"
    assert got["b.net"].n_pages == 1 and got["b.net"].n_distinct_urls == 1


def test_latest_snapshot_keeps_newest_per_canonical_url(spark):
    from datetime import datetime

    from osm_spark.text.urls import latest_snapshot

    caps = [
        # three captures of one page, variants collapse under
        # normalization; newest (ts) must win
        ("https://www.a.com/x/", datetime(2024, 1, 1), "v1"),
        ("HTTPS://a.com/x", datetime(2024, 3, 1), "v3"),
        ("https://a.com:443/x", datetime(2024, 2, 1), "v2"),
        # a singleton
        ("https://b.org/y", datetime(2024, 1, 1), "only"),
    ]
    df = spark.createDataFrame(caps, ["url", "warc_ts", "text"])
    got = {
        r["norm_url"]: (r["n_captures"], r["text"], r["url"])
        for r in latest_snapshot(df).collect()
    }
    assert got == {
        "https://a.com/x": (3, "v3", "HTTPS://a.com/x"),
        "https://b.org/y": (1, "only", "https://b.org/y"),
    }


def test_latest_snapshot_tie_breaks_deterministically(spark):
    from osm_spark.text.urls import latest_snapshot

    caps = [  # equal bigint timestamps -> raw url string decides
        ("https://www.c.net/z", 100, "www-variant"),
        ("https://c.net/z", 100, "bare-variant"),
    ]
    df = spark.createDataFrame(caps, ["url", "warc_ts", "text"])
    rows = latest_snapshot(df).collect()
    assert len(rows) == 1
    # 'https://www...' > 'https://c...' in string order
    assert rows[0]["text"] == "www-variant"
    assert rows[0]["n_captures"] == 2
