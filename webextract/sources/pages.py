"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

The input contract (BASELINE.json input_hint) is
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``. No external data exists in this sandbox, so pages are
synthesized deterministically two ways:

 1. :func:`pages_from_documents` — pure Spark built-ins over the
    driver-provided ``documents`` parquet (doc text wrapped in a frozen
    page template with nav/aside/footer boilerplate). Used by the
    correctness harness: the oracle can state the expected extraction
    in ANSI SQL (`ORACLE_PAGE_PREFIX` mirrors the template). Hosts are
    skewed on purpose (half of all pages land on host0) to exercise the
    salted repartition.
 2. :func:`gen_fixture_pages` — pure-Python variety-matrix fixtures
    (FIXTURES.md): charsets, entities, malformed html, <pre>, RTL,
    giant pages… Used by pytest goldens (the analog of
    test_tipc/results/*.txt golden files).

This mirrors the reference's label-file datasets
(ppocr/data/simple_dataset.py:23-151): deterministic inputs + expected
outputs keyed by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# frozen page template (host formula + literals are mirrored in the
# DuckDB oracle SQL in __spark_entry__.py — change BOTH or neither).
_TPL_HEAD = (
    '<html><head><meta charset="utf-8"><title>doc </title></head><body>'
    '<header><nav><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a></nav></header><article><h1>'
)
_TPL_MID = "</h1><p>"
_TPL_TAIL = (
    "</p></article><aside><ul>"
    '<li><a href="/r/1">Related one</a></li>'
    '<li><a href="/r/2">Related two</a></li></ul></aside>'
    '<footer><p><a href="/terms">Terms of Service</a> '
    '<a href="/privacy">Privacy Policy</a></p></footer></body></html>'
)

# epoch of 2024-01-01T00:00:00Z for warc_ts synthesis
_EPOCH_2024 = 1_704_067_200


def page_host(doc_id):
    """The frozen skewed-host formula (mirrored by ``_HOST`` in the
    oracle SQL — change BOTH or neither): half of all pages land on
    host0 to exercise the salted repartition."""
    return F.when(doc_id % 2 == 0, F.lit(0)).otherwise(doc_id % 37)


def page_url(doc_id):
    """The frozen page url (mirrored by ``_URL`` in the oracle SQL)."""
    return F.concat(
        F.lit("https://host"),
        page_host(doc_id).cast("string"),
        F.lit(".example/doc/"),
        doc_id.cast("string"),
    )


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet → pages(url, warc_ts, html, text, lang).

    All columns built with JVM-side built-ins (zero Python UDFs);
    ``text`` carries the expected extraction body (golden), per the
    input_hint where ``text`` plays the ground-truth role.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_id = F.col("doc_id")
    headline = F.concat(
        F.lit("Document "), doc_id.cast("string"), F.lit(" from "), F.col("source")
    )
    html_str = F.concat(
        F.lit(_TPL_HEAD), headline, F.lit(_TPL_MID), F.col("text"), F.lit(_TPL_TAIL)
    )
    return docs.select(
        page_url(doc_id).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2024) + doc_id).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def expected_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The golden (url, text) the extractor must reproduce
    byte-identically for :func:`pages_from_documents` input."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_id = F.col("doc_id")
    return docs.select(
        page_url(doc_id).alias("url"),
        F.concat(
            F.lit("Document "),
            doc_id.cast("string"),
            F.lit(" from "),
            F.col("source"),
            F.lit("\n\n"),
            F.col("text"),
        ).alias("text"),
    )


def pages_with_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose article carries a deterministic doc_id-derived table —
    the table-structure-recovery fixture (ppstructure/table analog).

    Table shape: ``n_rows = doc_id % 3 + 2`` (incl. one ``<th>`` header
    row), ``n_cols = doc_id % 2 + 2``; header cell text ``h<c>``, body
    cell text ``v<doc_id*100 + r*10 + c>``. Pure JVM built-ins (nested
    ``transform`` over ``sequence``), and the whole grid is statable in
    ANSI SQL — the oracle enumerates the same cells from ``documents``
    directly. The frozen extraction template stays untouched: this is a
    SEPARATE source so extraction goldens keep their byte-identity.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_id = F.col("doc_id")
    n_rows = (doc_id % 3 + 2).cast("int")
    n_cols = (doc_id % 2 + 2).cast("int")

    def header_cell(c):
        return F.concat(F.lit("<th>h"), c.cast("string"), F.lit("</th>"))

    def body_row(r):
        return F.concat(
            F.lit("<tr>"),
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), n_cols - 1),
                    lambda c: F.concat(
                        F.lit("<td>v"),
                        (doc_id * 100 + r * 10 + c).cast("string"),
                        F.lit("</td>"),
                    ),
                ),
            ),
            F.lit("</tr>"),
        )

    table_html = F.concat(
        F.lit("<table><tr>"),
        F.concat_ws(
            "", F.transform(F.sequence(F.lit(0), n_cols - 1), header_cell)
        ),
        F.lit("</tr>"),
        F.concat_ws(
            "", F.transform(F.sequence(F.lit(1), n_rows - 1), body_row)
        ),
        F.lit("</table>"),
    )
    headline = F.concat(
        F.lit("Document "), doc_id.cast("string"), F.lit(" from "), F.col("source")
    )
    html_str = F.concat(
        F.lit(_TPL_HEAD),
        headline,
        F.lit(_TPL_MID),
        F.col("text"),
        F.lit("</p>"),
        table_html,
        F.lit("</article></body></html>"),
    )
    return docs.select(
        page_url(doc_id).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2024) + doc_id).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def pages_with_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose article body carries deterministic CROSS-HOST
    absolute links — the link-graph fixture. Each doc links to two
    other hosts (``(doc_id*7+1) % 37`` and ``(doc_id*13+2) % 37``) and
    one same-host doc, all in the frozen url scheme, so the outlink
    set, the host graph and even a fixed-iteration PageRank over it
    are statable in ANSI SQL from ``documents`` alone. A SEPARATE
    source (like :func:`pages_with_tables`) so extraction goldens keep
    their byte-identity."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    doc_id = F.col("doc_id")

    # anchor text varies deterministically with (src, target) so the
    # anchor-text profile per host is a real aggregation; DuckDB states
    # the same arithmetic with a 1-indexed list literal
    anchor_words = F.array(
        F.lit("ref"), F.lit("see also"), F.lit("source"), F.lit("details")
    )

    def link_to(host_expr, target_doc):
        return F.concat(
            F.lit('<a href="https://host'),
            host_expr.cast("string"),
            F.lit(".example/doc/"),
            target_doc.cast("string"),
            F.lit('">'),
            F.element_at(anchor_words, ((doc_id + target_doc) % 4 + 1).cast("int")),
            F.lit("</a> "),
        )

    body_links = F.concat(
        link_to((doc_id * 7 + 1) % 37, doc_id + 1),
        link_to((doc_id * 13 + 2) % 37, doc_id + 2),
        link_to(page_host(doc_id), doc_id),
    )
    headline = F.concat(
        F.lit("Document "), doc_id.cast("string"), F.lit(" from "), F.col("source")
    )
    html_str = F.concat(
        F.lit(_TPL_HEAD),
        headline,
        F.lit(_TPL_MID),
        F.col("text"),
        F.lit("</p><p>"),
        body_links,
        F.lit(_TPL_TAIL),
    )
    return docs.select(
        page_url(doc_id).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2024) + doc_id).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def pages_replicated(
    spark: SparkSession,
    sf_dir: str,
    replicas: int,
    body_repeat: int = 8,
    partitions: int | None = None,
) -> DataFrame:
    """The pages table blown up ``replicas``× with distinct urls — the
    benchmark fixture standing in for the 10^6-page sample of the 10^12
    schema. ``body_repeat`` repeats the body paragraph so page weight
    approaches real Common-Crawl html (tens of KB), keeping the
    per-page extraction cost representative. Replication is an
    ``explode(sequence(...))`` inside codegen (no driver loop, no extra
    storage); host skew is preserved because the replica index rides in
    the path, not the host."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if partitions:
        # spread the SMALL doc rows before the heavy html synthesis: the
        # shuffle moves kilobytes, and synth + explode + downstream
        # extraction then share one fully-parallel stage. (A real crawl
        # table scans as many splits natively; the tiny single-file
        # fixture would otherwise serialize the whole pipeline into one
        # task.) Salting on doc_id hash = the url-skew defense, applied
        # where it's cheap.
        docs = docs.repartition(partitions, F.xxhash64(F.col("doc_id")))
    doc_id = F.col("doc_id")
    headline = F.concat(
        F.lit("Document "), doc_id.cast("string"), F.lit(" from "), F.col("source")
    )
    body = F.concat_ws(
        "</p><p>", F.array_repeat(F.col("text"), body_repeat)
    )
    html_str = F.concat(
        F.lit(_TPL_HEAD), headline, F.lit(_TPL_MID), body, F.lit(_TPL_TAIL)
    )
    base = docs.select(
        page_url(doc_id).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2024) + doc_id).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    return base.select("*", rep).select(
        F.concat(F.col("url"), F.lit("/r/"), F.col("rep").cast("string")).alias("url"),
        "warc_ts",
        "html",
        "text",
        "lang",
    )


# ---------------------------------------------------------------------------
# pytest fixture pages (variety matrix, FIXTURES.md)
# ---------------------------------------------------------------------------

def gen_fixture_pages() -> list[dict]:
    """Deterministic fixture pages covering the FIXTURES.md matrix.

    Returns dicts with keys (url, html: bytes, lang, case). Goldens for
    these are cut once into tests/goldens/golden.json and frozen.
    """
    pages: list[dict] = []

    def add(case: str, i: int, html: bytes, lang: str = "en") -> None:
        pages.append(
            {
                "url": f"https://fixtures.example/{case}/{i}",
                "html": html,
                "lang": lang,
                "case": case,
            }
        )

    para = (
        "The quick brown fox jumps over the lazy dog while the band plays "
        "a slow waltz in the dusty town square and nobody minds at all."
    )
    for i in range(3):
        add(
            "plain_article",
            i,
            f"<html><body><article><h1>Title {i}</h1><p>{para} Variant {i}.</p>"
            f"<p>Second paragraph {i} with further prose about the weather and "
            f"the long road north through the hills.</p></article></body></html>".encode(),
        )
        add(
            "boilerplate_nav",
            i,
            (
                "<html><body><nav>"
                + " ".join(f'<a href="/l{j}">Link {j}</a>' for j in range(8))
                + f"</nav><div><p>{para} Case {i}.</p></div>"
                + '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'
                + "</body></html>"
            ).encode(),
        )
        add(
            "nested_divs",
            i,
            (
                "<html><body>"
                + "<div>" * (8 + i)
                + f"<p>{para} Nested {i}.</p>"
                + "</div>" * (8 + i)
                + "</body></html>"
            ).encode(),
        )
        add(
            "inline_markup",
            i,
            f"<html><body><p>Mix {i} of <b>bold</b>, <i>italic</i>, "
            f'<a href="/x">one inline link</a>, <sup>sup</sup> and <code>code()</code> '
            f"inside a single paragraph that keeps flowing with enough prose to "
            f"score as content easily.</p></body></html>".encode(),
        )
        add(
            "script_style",
            i,
            f"<html><head><style>p{{color:red}}</style></head><body>"
            f"<script>var hidden{i} = 'should never appear';</script>"
            f"<template><p>template ghost</p></template>"
            f"<!-- a comment that must vanish -->"
            f"<p>{para} Visible {i}.</p><noscript>no js</noscript></body></html>".encode(),
        )
        add(
            "entities",
            i,
            f"<html><body><p>Fish &amp; chips {i} &#8212; em dash, &#x2014; hex dash, "
            f"&lt;tag&gt; literal, &quot;quoted&quot;, caf&eacute;, and the paragraph "
            f"continues long enough to stay above the score threshold.</p></body></html>".encode(),
        )
        add(
            "whitespace",
            i,
            (
                f"<html><body><p>Spaces\r\n   collapse\t\there {i} &nbsp; including "
                f"nbsp runs   and the text flows on with plenty of length for "
                f"scoring purposes indeed.</p><pre>\nkeep  {i}\n  indent\tliteral\n</pre>"
                f"</body></html>"
            ).encode(),
        )
        add(
            "malformed",
            i,
            f"<html><body><div><p>Unclosed paragraph {i} {para}<div>Stray nested "
            f"text that still tokenizes fine</p></div></span></body>".encode(),
        )
        add(
            "dup_blocks",
            i,
            f"<html><body><p>{para} Dup {i}.</p><p>{para} Dup {i}.</p>"
            f"<p>A different closing paragraph {i} long enough to be kept as "
            f"content by the scorer with room to spare.</p></body></html>".encode(),
        )
        add(
            "two_column_table",
            i,
            f"<html><body><table><tr><td>Left column {i} {para}</td>"
            f"<td>Right column {i} tells a different story at length about the "
            f"harvest and the rains that came late this year.</td></tr></table>"
            f"</body></html>".encode(),
        )

    # charset cases
    add("charset_bom", 0, b"\xef\xbb\xbf" + f"<html><body><p>BOM page {para}</p></body></html>".encode())
    add(
        "charset_latin1",
        0,
        "<html><body><p>café naïve résumé - the latin-1 page keeps going with "
        "plenty of prose so the scorer is happy.</p></body></html>".encode("latin-1"),
    )
    add(
        "charset_meta",
        0,
        b'<html><head><meta http-equiv="Content-Type" content="text/html; '
        b'charset=iso-8859-1"></head><body><p>d\xe9clar\xe9e charset page with '
        b"sufficient length of prose for scoring to pass easily here.</p></body></html>",
    )
    add(
        "charset_mismatch",
        0,
        # declares utf-8 but bytes are latin-1 → utf-8 strict fails →
        # meta says utf-8 → decode w/ replace (frozen rule 3)
        b'<html><head><meta charset="utf-8"></head><body><p>mismatch caf\xe9 page '
        b"with enough text that the block clears the threshold fine.</p></body></html>",
    )
    # RTL passthrough
    add(
        "rtl_arabic",
        0,
        "<html><body><p>النص العربي يتدفق من اليمين إلى اليسار ويجب أن يمر عبر "
        "المستخرج دون تغيير في الترتيب أو المحتوى على الإطلاق.</p></body></html>".encode(),
        lang="ar",
    )
    # empty / whitespace-only
    add("empty_body", 0, b"<html><body></body></html>")
    add("whitespace_only", 0, b"<html><body><p>   \n\t  </p><div>  </div></body></html>")
    # giant page (> max_html_bytes when cfg small; here ~3 MB)
    add(
        "giant_page",
        0,
        (
            "<html><body>"
            + "".join(f"<p>Giant paragraph {j} {para}</p>" for j in range(12000))
            + "</body></html>"
        ).encode(),
    )
    return pages
