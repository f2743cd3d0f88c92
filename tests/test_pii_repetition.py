"""PII scrub and repetition-quality signal tests."""

import pytest
from pyspark.sql import functions as F

from osm_spark.text.pii import with_pii_scrub
from osm_spark.text.repetition import with_repetition_stats


@pytest.fixture(scope="module")
def spark():
    from osm_spark.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (1, "mail me at jane.doe+spam@sub.example.co.uk today"),
        (2, "servers 10.0.0.1 and 192.168.255.254 are up"),
        (3, "call +1 555 0199 or +44 208 94621 now"),
        (4, "no pii here at all"),
        (5, "a@b.io x 1.2.3.4 y +9 123 5555"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_pii_scrub(df).collect()}
    assert (got[1].n_email, got[1].n_ipv4, got[1].n_phone) == (1, 0, 0)
    assert got[1].clean_text == "mail me at <EMAIL> today"
    assert (got[2].n_email, got[2].n_ipv4, got[2].n_phone) == (0, 2, 0)
    assert got[2].clean_text == "servers <IP> and <IP> are up"
    assert (got[3].n_email, got[3].n_ipv4, got[3].n_phone) == (0, 0, 2)
    assert got[3].clean_text == "call <PHONE> or <PHONE> now"
    assert got[4].clean_text == "no pii here at all"
    assert (got[5].n_email, got[5].n_ipv4, got[5].n_phone) == (1, 1, 1)
    assert got[5].clean_text == "<EMAIL> x <IP> y <PHONE>"


def test_repetition_stats_and_keep_flag(spark):
    rows = [
        # 8 tokens, all distinct: ratios 1.0, 1/8, 1/7 → keep
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        # 'spam' * 10: distinct 0.1, top 1.0, top bigram 1.0 → drop
        (2, " ".join(["spam"] * 10)),
        # single token: no bigrams, top_bigram_frac 0.0
        (3, "solo"),
        # bigram stuffing: 'buy now' * 6 → top bigram 6/11
        (4, " ".join(["buy", "now"] * 6)[: len("buy now " * 6) - 1]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_repetition_stats(df).collect()}
    r1 = got[1]
    assert r1.n_tokens == 8 and r1.distinct_ratio == 1.0
    assert r1.top_token_frac == 0.125
    assert r1.keep_repetition
    r2 = got[2]
    assert r2.distinct_ratio == 0.1 and r2.top_token_frac == 1.0
    assert r2.top_bigram_frac == 1.0 and not r2.keep_repetition
    r3 = got[3]
    assert r3.n_tokens == 1 and r3.top_bigram_frac == 0.0
    r4 = got[4]
    assert r4.n_tokens == 12
    # 'now buy' appears 5x, 'buy now' 6x over 11 bigrams
    assert abs(r4.top_bigram_frac - 6 / 11) < 1e-9
    assert not r4.keep_repetition


def test_repetition_empty_doc_dropped(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "ok fine")], "doc_id long, text string"
    )
    got = with_repetition_stats(df).collect()
    assert [r.doc_id for r in got] == [2]
