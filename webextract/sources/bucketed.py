"""Bucketed table layout: pre-shuffled storage for url-keyed joins.

At 10^12 documents the dominant shuffles are the url/host-keyed joins
and aggregations every downstream stage repeats — crawl diffs between
snapshots, latest-capture dedup, eval joins, exact dedup. A table
written with Spark's ``bucketBy(url)`` is ALREADY hash-partitioned on
disk: each bucket file holds exactly the urls whose
``hash(url) % n_buckets`` matches, so a join or groupBy on the bucket
key reads co-located data and Catalyst drops the Exchange entirely —
the 100 TB shuffle is paid ONCE at write time and amortized over every
subsequent read. (Reference analog: the reference pre-sorts its
dataset once and streams it in that order every epoch,
ppocr/data/simple_dataset.py — pay the organization cost at ingest,
never per query.)

Rules that make bucketing actually remove the Exchange (each is
asserted in tests/test_bucketed.py):

- both join sides bucketed with the SAME bucket count on the join key
  (mismatched counts shuffle the smaller-bucketed side);
- ``sortBy`` the same key at write time so SortMergeJoin's sorts read
  pre-sorted bucket files (Spark still re-sorts when a bucket holds
  multiple files — write with one task per bucket to avoid);
- bucket pruning: an equality filter on the bucket key scans ONE
  bucket (``spark.sql.sources.bucketing.enabled`` is on by default).

Bucketed writes require a table catalog (``saveAsTable`` — bucket
metadata lives in the catalog, not the parquet footer). The sandbox
uses the session-scoped in-memory catalog; production points the same
code at a real metastore. Iceberg carries the equivalent layout as a
``bucket(n, url)`` partition transform on its write spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "url",
    n_buckets: int = DEFAULT_BUCKETS,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed + sorted by ``key``.

    ``path`` makes it an external table (data survives catalog loss;
    re-register by calling this again). One shuffle to route rows to
    their buckets — the LAST time this key shuffles.
    """
    w = (
        df.repartition(n_buckets, key)  # one file per bucket per write
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(key)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata rides the catalog)."""
    return spark.table(table)


def cobucketed_join(
    left: DataFrame, right: DataFrame, key: str = "url", how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    Plain ``join`` — the point is what Catalyst does with it: both
    sides' outputPartitioning already satisfies the join's
    distribution requirement, so the plan is SortMergeJoin over two
    bucket scans with NO Exchange on either side (asserted in
    tests/test_bucketed.py::test_cobucketed_join_no_shuffle).
    """
    return left.join(right, key, how)
