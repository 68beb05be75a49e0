"""sitemap.xml parsing + crawl frontier: schema forms, W3C datetime
tolerance, index resolution, new/stale/fresh classification."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from webextract.operators.sitemap import (
    parse_sitemap,
    parse_sitemap_index,
    sitemap_frontier,
)


def _sm(spark, body: str, host: str = "h.example"):
    return spark.createDataFrame(
        [(host, body.encode("utf-8"))], "host string, body binary"
    )


BASIC = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://h.example/a </loc>
    <lastmod>2024-03-01T10:20:30Z</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://h.example/b</loc><lastmod>2024-03-02</lastmod></url>
  <url><loc>https://h.example/c</loc><lastmod>not-a-date</lastmod></url>
  <url><loc>https://h.example/d</loc><lastmod>2024-03-01T12:00:30+02:00</lastmod></url>
  <url><loc>https://h.example/e?a=1&amp;b=2</loc><lastmod>2024-03-01T10:20:30.000Z</lastmod></url>
  <url><loc>https://h.example/f</loc><lastmod>2024-03-01T10:20Z</lastmod></url>
  <url><priority>0.1</priority></url>
</urlset>"""


def test_parse_sitemap_forms(spark):
    rows = {r.loc: r for r in parse_sitemap(_sm(spark, BASIC)).collect()}
    assert set(rows) == {"https://h.example/a", "https://h.example/b",
                         "https://h.example/c", "https://h.example/d",
                         "https://h.example/e?a=1&b=2",  # XML-unescaped
                         "https://h.example/f"}  # loc-less entry dropped
    a = rows["https://h.example/a"]
    assert a.lastmod == dt.datetime(2024, 3, 1, 10, 20, 30)
    assert a.priority == 0.8
    b = rows["https://h.example/b"]
    assert b.lastmod == dt.datetime(2024, 3, 2)  # bare-date W3C form
    assert b.priority is None
    assert rows["https://h.example/c"].lastmod is None  # malformed → NULL
    # +02:00 zoned form: 12:00:30+02:00 = 10:00:30 UTC (session TZ)
    assert rows["https://h.example/d"].lastmod == dt.datetime(2024, 3, 1, 10, 0, 30)
    # fractional-second and minute-precision W3C forms
    assert rows["https://h.example/e?a=1&b=2"].lastmod == dt.datetime(2024, 3, 1, 10, 20, 30)
    assert rows["https://h.example/f"].lastmod == dt.datetime(2024, 3, 1, 10, 20)


def test_parse_sitemap_index(spark):
    body = """<sitemapindex>
      <sitemap><loc>https://h.example/sitemap-1.xml</loc>
               <lastmod>2024-01-05</lastmod></sitemap>
      <sitemap><loc>https://h.example/sitemap-2.xml</loc></sitemap>
    </sitemapindex>"""
    rows = sorted(
        parse_sitemap_index(_sm(spark, body)).collect(), key=lambda r: r.child_loc
    )
    assert [r.child_loc for r in rows] == [
        "https://h.example/sitemap-1.xml",
        "https://h.example/sitemap-2.xml",
    ]
    assert rows[0].lastmod == dt.datetime(2024, 1, 5)
    assert rows[1].lastmod is None


def test_frontier_statuses(spark):
    entries = spark.createDataFrame(
        [
            ("h", "https://h/new", dt.datetime(2024, 1, 1)),
            ("h", "https://h/stale", dt.datetime(2024, 6, 1)),
            ("h", "https://h/fresh", dt.datetime(2024, 1, 1)),
            ("h", "https://h/nolastmod", None),
        ],
        "host string, loc string, lastmod timestamp",
    )
    pages = spark.createDataFrame(
        [
            ("https://h/stale", dt.datetime(2024, 3, 1)),
            ("https://h/fresh", dt.datetime(2024, 3, 1)),
            ("https://h/nolastmod", dt.datetime(2024, 3, 1)),
        ],
        "url string, warc_ts timestamp",
    )
    got = {r.url: r.status for r in sitemap_frontier(entries, pages).collect()}
    assert got == {
        "https://h/new": "new",
        "https://h/stale": "stale",
        "https://h/fresh": "fresh",
        "https://h/nolastmod": "fresh",  # NULL lastmod can't prove staleness
    }


def test_frontier_prunes_corpus_to_two_columns(spark):
    import __spark_entry__ as entrymod

    plan = (
        entrymod.q_sitemap_frontier(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # both documents scans (sitemap synthesis + crawled side) derive
    # everything from doc_id — neither may read text/html
    import re

    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0] for c in m.split(",") if c]
        assert len(cols) <= 2, m


def test_frontier_judges_latest_capture(spark):
    import datetime as dt

    entries = spark.createDataFrame(
        [("h", "https://h/p", dt.datetime(2024, 3, 1))],
        "host string, loc string, lastmod timestamp",
    )
    pages = spark.createDataFrame(
        [
            ("https://h/p", dt.datetime(2024, 1, 1)),  # early capture
            ("https://h/p", dt.datetime(2024, 6, 1)),  # re-crawl AFTER lastmod
        ],
        "url string, warc_ts timestamp",
    )
    rows = sitemap_frontier(entries, pages).collect()
    # ONE row, judged against the LATEST capture -> fresh
    assert len(rows) == 1 and rows[0].status == "fresh"


def test_loc_numeric_character_references(spark):
    body = """<urlset>
      <url><loc>https://h.example/a&#47;b</loc></url>
      <url><loc>https://h.example/x&#x2F;y&#61;1</loc></url>
      <url><loc>https://h.example/dash&#8212;kept</loc></url>
      <url><loc>https://h.example/amp&amp;#47;literal</loc></url>
    </urlset>"""
    locs = {r.loc for r in parse_sitemap(_sm(spark, body)).collect()}
    assert "https://h.example/a/b" in locs            # decimal ref
    assert "https://h.example/x/y=1" in locs          # hex refs
    assert "https://h.example/dash&#8212;kept" in locs  # >255 left literal
    # single-pass semantics: '&amp;#47;' is the LITERAL text '&#47;'
    assert "https://h.example/amp&#47;literal" in locs
