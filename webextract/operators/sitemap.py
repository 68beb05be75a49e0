"""sitemap.xml parsing and crawl-frontier derivation, all JVM-side.

The discovery-side companion to robots.py (which gates what a crawler
MAY fetch, while the sitemap advertises what it SHOULD fetch):
parse per-host ``sitemap.xml`` files into (host, loc, lastmod,
priority) rows, resolve ``<sitemapindex>`` files to their child
sitemap locations, and join the advertised urls against the crawled
corpus to produce the incremental frontier — which advertised urls
are NEW (never crawled) or STALE (sitemap ``lastmod`` newer than our
capture). Reference analog: the dataset-manifest scan that tells the
reference WHAT to process before any per-item work
(``get_image_file_list``, ppocr/utils/utility.py:28-58).

Parsing is the sitemaps.org 0.9 schema over codegen regex (the same
tag-isolating approach as pagemeta.py): ``<url>`` elements isolated
non-greedily, ``<loc>``/``<lastmod>``/``<priority>`` extracted per
element with whitespace tolerance; ``<loc>`` values are XML-
unescaped (the spec REQUIRES entity escaping — an un-unescaped
``&amp;`` would miss the crawled corpus forever); ``lastmod``
accepts the full W3C datetime family (second, fractional-second and
minute precisions × Z/+01/+01:00/no zone, plus bare date) via
``try_to_timestamp`` fallbacks — a malformed value degrades to NULL,
never an error.

Scale shape: sitemap files are one row per HOST (KBs each — tiny next
to the corpus). Parsing explodes only the tiny side; the frontier
reduces the corpus to (url, warc_ts) AT THE SCAN (column-pruned),
collapses re-crawls to the latest capture with a partial-agg groupBy,
and equi-joins on url — both on the same key, and both free when the
corpus table is bucketed by url (sources/bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_ELEM_RE = r"(?is)<url>.*?</url>"
_SITEMAP_ELEM_RE = r"(?is)<sitemap>.*?</sitemap>"
_LOC_RE = r"(?is)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"
_PRIORITY_RE = r"(?is)<priority>\s*(.*?)\s*</priority>"


def _lastmod_ts(col):
    # Every W3C datetime precision (sitemaps.org mandates W3C forms):
    # second and fractional-second (generators commonly emit .000Z),
    # minute-precision, each with 'Z'/'+01' (X) or '+01:00' (XXX)
    # zones or none, plus the bare date. A form outside the family
    # degrades to NULL, never an error.
    pats = (
        "yyyy-MM-dd'T'HH:mm:ss.SSSX",
        "yyyy-MM-dd'T'HH:mm:ss.SSSXXX",
        "yyyy-MM-dd'T'HH:mm:ss.SSS",
        "yyyy-MM-dd'T'HH:mm:ssX",
        "yyyy-MM-dd'T'HH:mm:ssXXX",
        "yyyy-MM-dd'T'HH:mm:ss",
        "yyyy-MM-dd'T'HH:mmX",
        "yyyy-MM-dd'T'HH:mmXXX",
        "yyyy-MM-dd'T'HH:mm",
        "yyyy-MM-dd",
    )
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(p)) for p in pats])


def _decode_numeric_refs(col):
    """Decode numeric character references (``&#47;`` / ``&#x2F;``)
    for codepoints ≤ 255 — the range that covers every ASCII url
    delimiter real generators escape. Codepoints above 255 are left
    literal (Spark's ``char`` wraps mod 256, which would corrupt
    them). Runs in-row: split on '&#', decode each tail's leading
    ``code;`` and re-join — no Python, no shuffle."""
    parts = F.split(col, "&#")

    def _piece(p):
        cs = F.regexp_extract(p, r"^(x[0-9a-fA-F]{1,6}|[0-9]{1,7});", 1)
        num = (
            F.when(cs == "", F.lit(None))
            .when(
                cs.startswith("x"),
                F.conv(F.substr(cs, F.lit(2), F.length(cs)), 16, 10),
            )
            .otherwise(cs)
            .cast("long")
        )
        rest = F.substr(p, F.length(cs) + F.lit(2), F.length(p))
        ok = num.isNotNull() & (num >= 1) & (num <= 255)
        return F.when(ok, F.concat(F.char(num), rest)).otherwise(
            F.concat(F.lit("&#"), p)
        )

    decoded = F.concat(
        F.get(parts, 0),
        F.array_join(
            F.transform(F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0))), _piece),
            "",
        ),
    )
    return F.when(F.size(parts) > 1, decoded).otherwise(col)


def _xml_unescape(col):
    # sitemaps.org 0.9 REQUIRES loc values entity-escaped; undo
    # numeric character references FIRST (before '&amp;'→'&' can
    # fabricate new '&#..;' sequences — proper single-pass semantics:
    # '&amp;#47;' must yield the literal '&#47;', not '/'), then the
    # five predefined entities ('&amp;' LAST so '&amp;lt;'
    # round-trips to '&lt;').
    col = _decode_numeric_refs(col)
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def parse_sitemap(sitemaps: DataFrame, body_col: str = "body") -> DataFrame:
    """sitemaps(host, body:binary) → (host, loc, lastmod:timestamp,
    priority:double) — one row per advertised url.

    Entries missing ``<loc>`` are dropped (nothing to crawl);
    ``lastmod``/``priority`` are NULL when absent or malformed.
    """
    xml = F.decode(F.col(body_col), "UTF-8")
    ex = sitemaps.select(
        "host",
        F.explode(F.regexp_extract_all(xml, F.lit(_URL_ELEM_RE), 0)).alias("elem"),
    )
    loc = F.regexp_extract(F.col("elem"), _LOC_RE, 1)
    lastmod = F.regexp_extract(F.col("elem"), _LASTMOD_RE, 1)
    prio = F.regexp_extract(F.col("elem"), _PRIORITY_RE, 1)
    return (
        ex.select(
            "host",
            _xml_unescape(loc).alias("loc"),
            _lastmod_ts(F.nullif(lastmod, F.lit(""))).alias("lastmod"),
            F.nullif(prio, F.lit("")).try_cast("double").alias("priority"),
        )
        .filter(F.col("loc") != "")
    )


def parse_sitemap_index(sitemaps: DataFrame, body_col: str = "body") -> DataFrame:
    """sitemapindex files → (host, child_loc, lastmod) — the child
    sitemap urls a crawler fetches next (feed their bodies back
    through :func:`parse_sitemap`)."""
    xml = F.decode(F.col(body_col), "UTF-8")
    ex = sitemaps.select(
        "host",
        F.explode(
            F.regexp_extract_all(xml, F.lit(_SITEMAP_ELEM_RE), 0)
        ).alias("elem"),
    )
    loc = F.regexp_extract(F.col("elem"), _LOC_RE, 1)
    lastmod = F.regexp_extract(F.col("elem"), _LASTMOD_RE, 1)
    return (
        ex.select(
            "host",
            _xml_unescape(loc).alias("child_loc"),
            _lastmod_ts(F.nullif(lastmod, F.lit(""))).alias("lastmod"),
        )
        .filter(F.col("child_loc") != "")
    )


def sitemap_frontier(entries: DataFrame, pages: DataFrame) -> DataFrame:
    """(url, status, lastmod): every advertised url classified against
    the crawled corpus — ``new`` (never captured), ``stale``
    (advertised lastmod strictly newer than our capture), ``fresh``
    (captured and not out of date; a NULL lastmod can never prove
    staleness, so it reads fresh).

    Multi-capture corpora (the latest_snapshot/crawl_diff world) are
    judged against the LATEST capture per url — without that rollup a
    twice-captured page would emit two contradictory frontier rows.
    The corpus is reduced to (url, warc_ts) at the scan, collapsed to
    max(warc_ts) with a partial-agg groupBy; one url equi-join then
    decides everything.
    """
    crawled = pages.select("url", "warc_ts").groupBy("url").agg(
        F.max("warc_ts").alias("warc_ts")
    )
    return (
        entries.select(F.col("loc").alias("url"), "lastmod")
        .join(crawled, "url", "left")
        .select(
            "url",
            F.when(F.col("warc_ts").isNull(), F.lit("new"))
            .when(F.col("lastmod") > F.col("warc_ts"), F.lit("stale"))
            .otherwise(F.lit("fresh"))
            .alias("status"),
            "lastmod",
        )
    )
