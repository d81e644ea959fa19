"""URL canonicalization unit pins (functions/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multiomics_biocypher_kg_spark.functions.urls import canonical_url, url_host

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM:443/Path/9?b=2&a=1&utm_source=feed",
     "https://www.example.com/Path/9?a=1&b=2"),
    ("http://Example.com:80?id=5#frag", "http://example.com/?id=5"),
    ("https://CDN.example.net:8080/x/7", "https://cdn.example.net:8080/x/7"),
    ("http://h1.example.org/doc/3?utm_campaign=x", "http://h1.example.org/doc/3"),
    ("doc-42", "doc-42"),  # schemeless: pass through
    ("https://example.com/a%20b/1?z=9&y=8&fbclid=abc#sec",
     "https://example.com/a%20b/1?y=8&z=9"),
    ("  http://A.B/  ", "http://a.b/"),  # trim + lowercase host
    ("ftp://Host:21/f", "ftp://host:21/f"),  # non-http port kept
    ("https://example.com", "https://example.com/"),  # empty path -> '/'
    ("https://example.com/?utm_source=x&utm_medium=y", "https://example.com/"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "i int, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, (raw, got[i], want)


def test_canonical_url_idempotent(spark):
    """canonical(canonical(x)) == canonical(x) — required for a key."""
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c"))
    twice = once.select(F.col("c"), canonical_url(F.col("c")).alias("c2"))
    assert twice.where(F.col("c") != F.col("c2")).count() == 0


def test_url_host(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Example.COM:443/Path",), ("http://h1.example.org/d",)],
        "url string",
    )
    hosts = [r.h for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    assert hosts == ["www.example.com", "h1.example.org"]
