"""Bucketed storage layout: the shuffle is paid at write time, never
again — joins, aggregations and point lookups on the bucket key must
run Exchange-free against the bucket files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webextract.sources.bucketed import (
    cobucketed_join,
    read_bucketed,
    write_bucketed,
)

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    docs = spark.range(0, 400).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/doc/"), F.col("id").cast("string")).alias("url"),
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("fp"),
    )
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.withColumn(
        "fp", F.when(F.col("doc_id") % 3 == 0, F.lit("changed")).otherwise(F.col("fp"))
    )
    write_bucketed(old, "crawl_old", "url", N_BUCKETS, str(base / "old"))
    write_bucketed(new, "crawl_new", "url", N_BUCKETS, str(base / "new"))
    yield "crawl_old", "crawl_new"
    spark.sql("DROP TABLE IF EXISTS crawl_old")
    spark.sql("DROP TABLE IF EXISTS crawl_new")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_no_shuffle(spark, bucketed_tables):
    # hint("merge") stands in for the statistics a 100 TB table would
    # bring (tiny fixtures broadcast, which hides the layout win)
    t_old, t_new = bucketed_tables
    j = cobucketed_join(
        read_bucketed(spark, t_old).hint("merge"),
        read_bucketed(spark, t_new),
        "url",
    )
    plan = _plan(j.select("url"))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides pre-bucketed: zero shuffle
    assert j.count() == 320  # 400 minus the 80 missing from old


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    t_old, _ = bucketed_tables
    agg = read_bucketed(spark, t_old).groupBy("url").agg(F.count("*").alias("n"))
    plan = _plan(agg)
    assert "Exchange" not in plan
    assert agg.count() == 320


def test_unbucketed_side_still_shuffles(spark, bucketed_tables):
    # control: joining a NON-bucketed side must shuffle it — proves the
    # Exchange-free plans above come from the layout, not the data size
    t_old, _ = bucketed_tables
    flat = spark.range(0, 50).select(
        F.concat(F.lit("https://h0.example/doc/"), F.col("id").cast("string")).alias("url")
    )
    plan = _plan(read_bucketed(spark, t_old).join(flat, "url"))
    assert "Exchange" in plan


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    # the planner's autoBucketedScan turns bucketed reading OFF for
    # scan-only queries (no distribution requirement to satisfy),
    # which also forfeits bucket pruning — a point lookup wants it on
    t_old, _ = bucketed_tables
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        one = read_bucketed(spark, t_old).filter(
            F.col("url") == "https://h1.example/doc/1"
        )
        # SelectedBucketsCount: 1 out of N — the scan skipped 7/8 files
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in _plan(one)
        assert one.count() == 1
    finally:
        spark.conf.set(key, prev)


def test_join_results_match_unbucketed(spark, bucketed_tables):
    t_old, t_new = bucketed_tables
    old, new = read_bucketed(spark, t_old), read_bucketed(spark, t_new)
    got = (
        cobucketed_join(old, new.withColumnRenamed("fp", "fp_new"), "url")
        .filter(F.col("fp") != F.col("fp_new"))
        .count()
    )
    # changed docs present in both: doc_id % 3 == 0 and % 5 != 0
    expected = sum(1 for i in range(400) if i % 3 == 0 and i % 5 != 0)
    assert got == expected
