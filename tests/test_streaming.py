"""Structured Streaming tests: the batch operator under readStream
(availableNow drain) and the watermarked event-time rollup."""

import os

from pyspark.sql import functions as F

from webextract.sources.pages import pages_from_documents
from webextract.streaming.extract_stream import (
    run_extract_stream,
    streaming_hourly_hosts,
)

SF = "/root/testdata/sf0.001"


def test_stream_drain_matches_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = pages_from_documents(spark, SF)
    pages.repartition(4).write.parquet(inp)

    run_extract_stream(spark, inp, out, ckpt)

    streamed = spark.read.parquet(out)
    assert streamed.count() == 500
    # byte-identical to the batch path on the same input
    from webextract.operators.extract import extract_pages

    batch = extract_pages(pages).select("url", "text")
    joined = streamed.select("url", F.col("text").alias("stext")).join(
        batch, "url"
    )
    assert joined.filter(F.col("stext") != F.col("text")).count() == 0

    # exactly-once: a second availableNow drain adds nothing new
    run_extract_stream(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 500


def test_streaming_hourly_hosts_batch_parity(spark):
    pages = pages_from_documents(spark, SF)
    rolled = streaming_hourly_hosts(pages)
    row = rolled.agg(F.sum("n_pages")).first()
    assert row[0] == 500
    # warc_ts synthesis spans 500 seconds from the 2024 epoch → 1 window
    assert rolled.select("start").distinct().count() == 1


def test_streaming_dedup_drain_matches_batch_distinct(spark, tmp_path):
    from webextract.streaming.dedup_stream import run_dedup_stream

    inp = str(tmp_path / "din")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    pages = pages_from_documents(spark, SF)
    # plant duplicates: every page twice (distinct urls, same text)
    dup = pages.withColumn("url", F.concat(F.col("url"), F.lit("/copy")))
    pages.unionByName(dup).repartition(4).write.parquet(inp)

    run_dedup_stream(spark, inp, out, ckpt)

    streamed = spark.read.parquet(out)
    n_distinct = pages.select(F.md5("text")).distinct().count()
    # one survivor per distinct content hash, no hash seen twice
    assert streamed.count() == n_distinct
    assert streamed.select("content_h").distinct().count() == n_distinct
    # exactly-once: re-drain adds nothing
    run_dedup_stream(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == n_distinct


def test_streaming_dedup_watermarked_plan_is_streaming_safe(spark):
    from webextract.streaming.dedup_stream import streaming_dedup_watermarked
    from webextract.streaming.extract_stream import PAGES_SCHEMA

    # analysis-time check: the watermarked variant must be a valid
    # STREAMING plan (dropDuplicatesWithinWatermark rejects batch-only
    # constructs at analysis), verified without running a query
    src = spark.readStream.schema(PAGES_SCHEMA).parquet("/root/testdata")
    deduped = streaming_dedup_watermarked(src, "1 hour")
    assert deduped.isStreaming


def test_streaming_tables_drain_matches_batch(spark, tmp_path):
    from webextract.operators.tables import table_cells
    from webextract.sources.pages import pages_with_tables
    from webextract.streaming.extract_stream import run_tables_stream

    inp = str(tmp_path / "tin")
    out = str(tmp_path / "tout")
    ckpt = str(tmp_path / "tckpt")
    pages = pages_with_tables(spark, SF)
    pages.repartition(4).write.parquet(inp)

    run_tables_stream(spark, inp, out, ckpt)

    streamed = spark.read.parquet(out)
    batch = table_cells(pages)
    assert streamed.count() == batch.count()
    key = ["url", "table_id", "row_id", "col_id"]
    diff = (
        streamed.select(*key, F.col("cell_text").alias("stext"))
        .join(batch.select(*key, "cell_text"), key)
        .filter(F.col("stext") != F.col("cell_text"))
    )
    assert diff.count() == 0


def test_streaming_dedup_watermarked_drain(spark, tmp_path):
    from webextract.streaming.dedup_stream import streaming_dedup_watermarked
    from webextract.streaming.extract_stream import read_pages_stream

    inp = str(tmp_path / "win")
    out = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")
    pages = pages_from_documents(spark, SF)
    # duplicates share warc_ts (re-fetch within the horizon): the
    # watermarked dedup must always drop them
    dup = pages.withColumn("url", F.concat(F.col("url"), F.lit("/copy")))
    pages.unionByName(dup).repartition(4).write.parquet(inp)

    q = (
        streaming_dedup_watermarked(read_pages_stream(spark, inp), "1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = spark.read.parquet(out)
    n_distinct = pages.select(F.md5("text")).distinct().count()
    assert streamed.count() == n_distinct
    assert streamed.select("content_h").distinct().count() == n_distinct


def test_streaming_warc_ingest_drain_matches_batch(spark, tmp_path):
    from webextract.operators.extract import extract_pages
    from webextract.sources.warc import synth_warc_segments
    from webextract.streaming.warc_stream import run_warc_extract_stream

    inp = str(tmp_path / "warc_in")
    out = str(tmp_path / "warc_out")
    ckpt = str(tmp_path / "warc_ckpt")
    os.makedirs(inp)
    pages = pages_from_documents(spark, SF)
    for r in synth_warc_segments(pages, n_segments=6).collect():
        with open(f"{inp}/seg-{r.segment_id}.warc", "wb") as f:
            f.write(bytes(r.payload))

    run_warc_extract_stream(spark, inp, out, ckpt)

    streamed = spark.read.parquet(out)
    assert streamed.count() == 500
    batch = extract_pages(pages).select("url", "text")
    j = streamed.select("url", F.col("text").alias("stext")).join(batch, "url")
    assert j.count() == 500
    assert j.filter(F.col("stext") != F.col("text")).count() == 0

    # exactly-once: re-drain adds nothing
    run_warc_extract_stream(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == 500


def test_streaming_count_min_matches_batch_sketch(spark, tmp_path):
    """The stream-drained cell table equals the batch sketch exactly
    (same frozen md5 cells, cell-wise counts) — the mergeability the
    count-min deployment relies on."""
    from webextract.operators.sampling import cm_cells
    from webextract.streaming.cm_stream import run_cm_stream

    inp = str(tmp_path / "in")
    pages = pages_from_documents(spark, SF)
    pages.repartition(4).write.parquet(inp)

    streamed = run_cm_stream(spark, inp)
    batch = (
        cm_cells(spark.read.parquet(inp))
        .groupBy("j", "cell")
        .agg(F.count("*").alias("c"))
    )
    s = {(r.j, r.cell): r.c for r in streamed.collect()}
    b = {(r.j, r.cell): r.c for r in batch.collect()}
    assert s == b
    assert sum(s.values()) == 500 * 4
