"""Skew-defense tests: the salted url-hash repartition must spread a
host-skewed corpus evenly (half of all pages live on host0 by
construction in pages_from_documents), and the lineage rows must show
balanced per-partition work — the scale property the reference's
static modulo sharding (predict_system.py:149,259-270) lacks."""

from pyspark.sql import functions as F

from webextract.operators.extract import (
    extract_pages,
    extract_pages_with_lineage,
    salted_repartition,
    split_lineage,
    to_json_lines,
)
from webextract.sources.pages import pages_from_documents

SF = "/root/testdata/sf0.001"


def test_salted_repartition_balances_skewed_hosts(spark):
    pages = pages_from_documents(spark, SF)
    # confirm the input IS skewed: host0 holds half the corpus
    host = F.regexp_extract("url", "^https://([^/]+)/", 1)
    top = (
        pages.groupBy(host.alias("h")).count().orderBy(F.desc("count")).first()
    )
    # all evens plus odd multiples of 37 land on host0 → ≥ half
    assert top["h"] == "host0.example" and top["count"] >= 250

    parts = 8
    uni = extract_pages_with_lineage(salted_repartition(pages, parts))
    _, lin = split_lineage(uni)
    rows = lin.collect()
    counts = [r["urls_in"] for r in rows]
    assert sum(counts) == 500
    # balanced: no partition holds more than 2x the ideal share
    assert max(counts) <= 2 * (500 / parts)
    # and strictly better than host-partitioning, where one partition
    # would hold 250
    assert max(counts) < 250


def test_sort_by_size_preserves_results(spark):
    pages = pages_from_documents(spark, SF)
    a = {(r["url"], r["text"]) for r in extract_pages(pages).collect()}
    b = {
        (r["url"], r["text"])
        for r in extract_pages(pages, sort_by_size=True).collect()
    }
    assert a == b


def test_json_lines_sink_roundtrip(spark):
    pages = pages_from_documents(spark, SF)
    ext = extract_pages(pages)
    lines = to_json_lines(ext)
    assert lines.columns == ["url", "result_json"]
    row = lines.first()
    import json

    payload = json.loads(row["result_json"])
    assert set(payload) >= {"text", "spans", "mean_score", "blocks_kept"}
    # text survives the json round-trip byte-identically
    orig = ext.filter(F.col("url") == row["url"]).first()["text"]
    assert payload["text"] == orig
