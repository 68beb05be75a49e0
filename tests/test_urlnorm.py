"""URL canonicalization rules (frozen; the oracle for q:url_dedup
states ground truth, these tests pin each individual rule)."""

import pytest
from pyspark.sql import functions as F

from webextract.operators.urlnorm import canonical_url, dedup_by_url

CASES = [
    # (raw, expected canonical)
    ("https://Host.Example/doc/1", "https://host.example/doc/1"),
    ("HTTPS://HOST.EXAMPLE/doc/1", "https://host.example/doc/1"),
    ("https://host.example/doc/1#frag", "https://host.example/doc/1"),
    ("https://host.example:443/doc/1", "https://host.example/doc/1"),
    ("http://host.example:80/doc/1", "http://host.example/doc/1"),
    ("http://host.example:8080/doc/1", "http://host.example:8080/doc/1"),
    ("https://host.example/doc/1/", "https://host.example/doc/1"),
    ("https://host.example/", "https://host.example/"),
    ("https://host.example", "https://host.example/"),
    ("https://host.example/doc?utm_source=x", "https://host.example/doc"),
    ("https://host.example/doc?a=1&utm_medium=m&b=2",
     "https://host.example/doc?a=1&b=2"),
    ("https://host.example/doc?a=1#f", "https://host.example/doc?a=1"),
    ("not a url", "not a url"),                       # passthrough
]


def test_canonical_url_rules(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    for (raw, want), g in zip(CASES, got):
        assert g == want, f"{raw!r} -> {g!r}, want {want!r}"


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    once = df.select(canonical_url(F.col("url")).alias("url"))
    twice = once.select(canonical_url(F.col("url")).alias("url"))
    assert [r[0] for r in once.collect()] == [r[0] for r in twice.collect()]


def test_dedup_by_url_groups_spellings(spark):
    rows = [
        ("https://a.example/p",),
        ("https://A.Example/p/",),
        ("https://a.example/p#x",),
        ("https://b.example/q",),
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {r.canon_url: (r.keeper, r.n_spellings)
           for r in dedup_by_url(df).collect()}
    assert got["https://a.example/p"] == ("https://A.Example/p/", 3)
    assert got["https://b.example/q"] == ("https://b.example/q", 1)
