"""Facade API (``webextract.api``): the PaddleOCR/PPStructure flag
algebra (``paddleocr.py:513,652``) delegating to the frozen stack."""

import pytest
from pyspark.sql import functions as F

from webextract import WebExtractor, WebStructure
from webextract.sources.pages import pages_from_documents

SF = "/root/testdata/sf0.001"


def test_det_rec_equals_extract_pages(spark):
    from webextract.operators.extract import extract_pages

    pages = pages_from_documents(spark, SF).limit(50)
    a = WebExtractor().extract(pages).orderBy("url").collect()
    b = extract_pages(pages).orderBy("url").collect()
    assert a == b


def test_det_only_returns_regions_without_text(spark):
    pages = pages_from_documents(spark, SF).limit(20)
    det = WebExtractor().extract(pages, rec=False)
    assert det.columns == ["url", "spans", "blocks_total", "blocks_kept"]
    full = WebExtractor().extract(pages)
    a = {r.url: r.spans for r in det.collect()}
    b = {r.url: r.spans for r in full.collect()}
    assert a == b  # same region proposals as the full pipeline


def test_rec_only_keeps_every_block(spark):
    pages = pages_from_documents(spark, SF).limit(20)
    rec = WebExtractor().extract(pages, det=False)
    assert rec.columns == ["url", "text", "mean_score", "blocks_kept"]
    rows = rec.collect()
    # all 6 template blocks retained: nav + h1 + body + 2 li + footer
    assert all(r.blocks_kept == 6 for r in rows)
    assert all("Home About Contact" in r.text for r in rows)
    # the full pipeline drops that nav boilerplate
    full = {r.url: r.text for r in WebExtractor().extract(pages).collect()}
    assert all("Home About Contact" not in full[r.url] for r in rows)


def test_det_false_rec_false_raises(spark):
    pages = pages_from_documents(spark, SF).limit(1)
    with pytest.raises(ValueError, match="det/rec"):
        WebExtractor().extract(pages, det=False, rec=False)


def test_cls_flag_routes_through_mojibake_repair(spark):
    # a double-encoded page: cls=True repairs it, cls=False passes the
    # mojibake through (the use_angle_cls opt-in semantics)
    good = "<html><body><article><p>" + "Voilà un café bien serré. " * 8
    bad = good.encode("utf-8").decode("latin-1").encode("utf-8")
    pages = spark.createDataFrame(
        [("https://x.example/1", bytearray(bad))], "url string, html binary"
    )
    fixed = WebExtractor().extract(pages, cls=True).collect()[0].text
    raw = WebExtractor().extract(pages).collect()[0].text
    assert "café" in fixed and "café" not in raw


def test_structure_views_match_operators(spark):
    from webextract.operators.layout import layout_regions
    from webextract.operators.tables import table_cells

    pages = pages_from_documents(spark, SF).limit(20)
    st = WebStructure()
    assert (
        st.parse(pages).orderBy("url", "block_id").collect()
        == layout_regions(pages).orderBy("url", "block_id").collect()
    )
    # the plain template has no <table>: cells view is empty, not an error
    assert st.tables(pages).count() == table_cells(pages).count() == 0
    assert {"url", "key", "value"} <= set(st.kie(pages).columns)
