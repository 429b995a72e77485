"""URL normalization contract: canonical forms, default-port vs explicit-
port handling, tracking-param stripping with stable param order, public-
suffix registered domains, and the blocklist filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from pincspark.functions.url import (
    domain_blocklist_filter,
    normalize_url,
    registered_domain,
    url_host,
)

CASES = [
    # (raw, canonical)
    ("HTTP://Example.COM:80/A/b/", "http://example.com/A/b"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://www.example.com/", "http://example.com"),
    ("http://example.com/p?utm_source=a&id=1&utm_campaign=b", "http://example.com/p?id=1"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?fbclid=xyz", "http://example.com/p"),
    ("http://example.com/p#frag", "http://example.com/p"),
    ("http://example.com/p///", "http://example.com/p"),
    # path case is preserved; only scheme/host fold
    ("HtTpS://NeWs.ExAmPle.Co.Uk/Path?x=1#f", "https://news.example.co.uk/Path?x=1"),
]


def test_normalize_url_contract(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r["n"] for r in df.select(normalize_url(F.col("url")).alias("n")).collect()]
    assert got == [c for _, c in CASES]


def test_registered_domain_psl(spark):
    hosts = [
        ("example.com", "example.com"),
        ("a.b.example.com", "example.com"),
        ("news.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("docs.example.com.au", "example.com.au"),
        ("localhost", "localhost"),
    ]
    df = spark.createDataFrame(hosts, "host string, want string")
    rows = df.select("want", registered_domain(F.col("host")).alias("got")).collect()
    for r in rows:
        assert r["got"] == r["want"], (r["want"], r["got"])


def test_blocklist_filter_and_flag(spark):
    df = spark.createDataFrame(
        [
            ("http://a.Spam-Site.com/x",),
            ("https://www.good.org/y",),
            ("http://tracker.ads-net.com:8080/z?utm_source=t",),
        ],
        "url string",
    )
    kept = domain_blocklist_filter(df, "url", ["spam-site.com", "ads-net.com"])
    assert [r["url"] for r in kept.collect()] == ["https://www.good.org/y"]
    flagged = domain_blocklist_filter(
        df, "url", ["spam-site.com", "ads-net.com"], keep_col="kept"
    )
    assert [r["kept"] for r in flagged.collect()] == [0, 1, 0]


def test_url_host_strips_port_and_www(spark):
    df = spark.createDataFrame(
        [("HTTP://WWW.Example.COM:8080/p",)], "url string"
    )
    assert df.select(url_host(F.col("url")).alias("h")).collect()[0]["h"] == "example.com"
