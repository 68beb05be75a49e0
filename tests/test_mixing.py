"""Dataset-mixing tests: deterministic hash-sampling properties."""

from pyspark.sql import functions as F

from webextract.sources.mixing import hash_sample, union_sampled

SF = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_ratio(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5).collect()}
    b = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5).collect()}
    assert a == b                      # stable across runs
    assert 0.35 <= len(a) / 500 <= 0.65  # ~ratio on 500 docs
    # nested property: a 0.25 sample is a subset of the 0.5 sample
    c = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.25).collect()}
    assert c <= a


def test_hash_sample_stable_under_repartition(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(17), "doc_id", 0.3).collect()
    }
    assert a == b


def test_union_sampled_mixes_sources(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    evens = docs.filter(F.col("doc_id") % 2 == 0)
    odds = docs.filter(F.col("doc_id") % 2 == 1)
    mixed = union_sampled([(evens, 1.0), (odds, 0.0)], key="doc_id")
    ids = {r["doc_id"] for r in mixed.select("doc_id").collect()}
    assert ids == {r["doc_id"] for r in evens.select("doc_id").collect()}
