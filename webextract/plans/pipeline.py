"""Resumable extraction pipeline: bucketed waves + manifest checkpoint.

The production driver (the analog of the reference's CLI batch runner
``tools/infer/predict_system.py:147-270``, which shards statically and
has NO failure recovery) — ours is resumable and idempotent:

 * the corpus is split into ``n_buckets`` url-hash buckets
   (``pmod(xxhash64(url), B)``) — the unit of checkpointing;
 * buckets are processed in WAVES (one Spark job per wave, each wave a
   group of buckets) writing ``output/pages/bucket=K/`` partitions plus
   a lineage partition per wave;
 * a wave COMMITS by appending one snapshot to the SNAPSHOT LOG
   (``plans/snapshots.py`` — atomic append, parent-chained snapshot
   ids, per-snapshot data-file manifest: Iceberg commit semantics,
   executable without the Iceberg jar this sandbox cannot have); a
   human-readable wave manifest mirrors each commit;
 * resume = VALIDATE the snapshot chain (gaps / broken parents /
   double-committed buckets raise), skip committed buckets, reprocess
   the rest. A half-written wave is safely overwritten (dynamic
   partition overwrite) because its snapshot was never appended — and
   snapshot readers (``SnapshotLog.read_as_of``) never see its files
   at all, because scans plan from the log, not directory listing.

When an Iceberg catalog IS on the classpath, the same protocol rides
the real table format: :func:`run_extraction_iceberg` commits each
wave with ``writeTo(...).overwritePartitions()`` (the table must be
partitioned by ``bucket`` — overwrite is what keeps a crashed,
unlogged wave idempotent on rerun) and records Iceberg's OWN snapshot
id in the log (:func:`iceberg_available` gates it; it has never
executed here — the jar does not exist in the sandbox — but the
wave/commit/resume logic it shares with the parquet path is fully
tested).

The checkpoint unit mirrors the reference's resumable training
checkpoints (tools/program.py:218-224, load via tools/train.py:174).
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webextract.config import DEFAULT_CONFIG, ExtractConfig
from webextract.operators.extract import extract_pages_with_lineage, split_lineage
from webextract.plans.snapshots import SnapshotLog


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
    """Buckets already committed: the VALIDATED snapshot chain (a
    corrupt chain raises rather than resuming wrong), unioned with the
    legacy wave manifests so outputs from before the snapshot log
    still resume."""
    done = SnapshotLog(cfg.output_dir).buckets_as_of()
    d = _manifest_dir(cfg)
    if os.path.isdir(d):
        for name in os.listdir(d):
            if name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    done.update(json.load(f)["buckets"])
    return done


def _wave_files(out_pages: str, buckets: list[int]) -> list[str]:
    """Data files a wave just wrote (its snapshot's file manifest)."""
    files: list[str] = []
    for b in buckets:
        files.extend(glob.glob(os.path.join(out_pages, f"bucket={b}", "*.parquet")))
    return files


def _commit_wave(
    cfg: JobConfig, buckets: list[int], files: list[str], stats: dict
) -> dict:
    """THE wave commit: append one snapshot (atomic), then mirror a
    human-readable wave manifest carrying the snapshot id. A crash
    before the snapshot append leaves the wave uncommitted (rerun +
    dynamic overwrite); a crash after it is a completed commit."""
    rec = SnapshotLog(cfg.output_dir).append(buckets, files, **stats)
    d = _manifest_dir(cfg)
    os.makedirs(d, exist_ok=True)
    payload = {"buckets": buckets, "snapshot_id": rec["snapshot_id"], **stats}
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, os.path.join(d, f"wave-{min(buckets):05d}.json"))
    return rec


def _bucket_col(cfg: JobConfig):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(cfg.n_buckets)).cast("int")


def _bucketed_waves(
    pages: DataFrame, cfg: JobConfig, done: set[int]
) -> tuple[DataFrame, list[list[int]]]:
    """Shared wave planner (parquet AND Iceberg paths): url-hash
    bucketing + the remaining buckets sliced into waves."""
    bucketed = pages.withColumn("bucket", _bucket_col(cfg))
    todo = sorted(set(range(cfg.n_buckets)) - done)
    waves = [
        todo[i : i + cfg.wave_size] for i in range(0, len(todo), cfg.wave_size)
    ]
    return bucketed, waves


def _extract_wave(
    bucketed: DataFrame, wave: list[int], cfg: JobConfig
) -> DataFrame:
    """One wave's unified extraction frame (pages + lineage rows)."""
    wave_pages = bucketed.filter(F.col("bucket").isin(wave))
    return extract_pages_with_lineage(
        wave_pages.repartition(len(wave), "bucket").select(
            "url", "html", "bucket"
        ),
        cfg.extract,
    )


def run_extraction(
    spark: SparkSession, pages: DataFrame, cfg: JobConfig
) -> dict:
    """Run (or resume) the full extraction over ``pages``.

    Returns summary stats. Safe to re-invoke after any failure: only
    un-manifested buckets are (re)processed.
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    done = done_buckets(cfg)
    bucketed, waves = _bucketed_waves(pages, cfg, done)
    out_pages = os.path.join(cfg.output_dir, "extracted")
    out_lineage = os.path.join(cfg.output_dir, "lineage")

    total = {"waves": 0, "buckets_done": len(done), "urls": 0}
    for wave in waves:
        t0 = time.perf_counter()
        # one job: repartition by bucket so each output partition is
        # written by the tasks that own it (no tiny-file explosion)
        uni = _extract_wave(bucketed, wave, cfg).persist()
        try:
            extracted, lineage = split_lineage(uni)
            # re-derive the bucket from the url (the UDF consumed it)
            extracted = extracted.withColumn("bucket", _bucket_col(cfg))
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
            _wave_files(out_pages, wave),
            {"urls": n_urls, "sec": round(time.perf_counter() - t0, 3)},
        )
        total["waves"] += 1
        total["buckets_done"] += len(wave)
        total["urls"] += n_urls
    return total


def run_extraction_iceberg(
    spark: SparkSession, pages: DataFrame, cfg: JobConfig, table: str
) -> dict:
    """The Iceberg-catalog variant of :func:`run_extraction` (same
    wave planner, same lineage side-output, same stats contract): each
    wave commits with ``writeTo(table).overwritePartitions()`` — the
    v2 dynamic-partition overwrite, so the ``table`` MUST be
    partitioned by ``bucket``. Overwrite (not append) is what makes a
    crash between the Iceberg commit and the snapshot-log append safe:
    the rerun REPLACES the orphan wave's bucket partitions instead of
    appending the same rows twice. The log records Iceberg's OWN
    snapshot id, read back from ``<table>.snapshots``; resume
    cross-checks that every recorded snapshot id still exists in the
    table history — a dropped/rolled-back table raises instead of
    resuming against missing data.

    GATED: requires the Iceberg Spark runtime on the classpath
    (:func:`iceberg_available`); this sandbox has no jar and no way to
    install one, so this path is untested here by construction — the
    wave/commit/resume machinery it shares with the parquet path
    (:func:`_bucketed_waves`, :func:`_extract_wave`, ``SnapshotLog``)
    is the tested code.

    Vendoring attempts, recorded per round: no iceberg artifact exists
    anywhere on the image (`find / -name '*iceberg*'` empty, no jar in
    the pyspark jars dir, no ivy cache), and the sandbox has no DNS —
    both `urllib` against repo1.maven.org and `pip download` fail with
    name resolution errors. The commit semantics this path needs
    (atomic append, parent-chain validation, time travel, orphan
    vacuum) are implemented and pytest-pinned by ``SnapshotLog``
    (plans/snapshots.py), which this function treats as the contract.
    """
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; use run_extraction "
            "(parquet + snapshot log) instead"
        )
    log = SnapshotLog(cfg.output_dir)
    done = log.buckets_as_of()
    # snapshot-validated resume: every committed wave's Iceberg
    # snapshot must still exist in the table history
    known = {
        r["snapshot_id"]
        for r in spark.sql(f"SELECT snapshot_id FROM {table}.snapshots").collect()
    }
    for rec in log.entries():
        if "iceberg_snapshot_id" not in rec:
            raise RuntimeError(
                f"snapshot log entry for bucket {rec.get('bucket')} was "
                "committed by the parquet path (no iceberg_snapshot_id) — "
                "mixed commit paths in one output_dir; resume with "
                "run_extraction or restart from a clean output_dir"
            )
        if rec["iceberg_snapshot_id"] not in known:
            raise RuntimeError(
                f"snapshot {rec.get('iceberg_snapshot_id')} in the log is "
                f"missing from {table}.snapshots — table was rewritten; "
                "restart from a clean output_dir"
            )
    bucketed, waves = _bucketed_waves(pages, cfg, done)
    out_lineage = os.path.join(cfg.output_dir, "lineage")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    total = {"waves": 0, "buckets_done": len(done), "urls": 0}
    for wave in waves:
        t0 = time.perf_counter()
        uni = _extract_wave(bucketed, wave, cfg).persist()
        try:
            extracted, lineage = split_lineage(uni)
            (
                extracted.withColumn("bucket", _bucket_col(cfg))
                .writeTo(table)
                .overwritePartitions()
            )
            n_urls = int(lineage.agg(F.sum("urls_in")).first()[0] or 0)
            lineage.withColumn(
                "wave_start_bucket", F.lit(min(wave))
            ).write.mode("overwrite").partitionBy("wave_start_bucket").parquet(
                out_lineage
            )
        finally:
            uni.unpersist()
        snap = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()[0]
        log.append(
            wave,
            [],  # Iceberg owns the file manifest; the log keeps its id
            iceberg_snapshot_id=snap,
            urls=n_urls,
            sec=round(time.perf_counter() - t0, 3),
        )
        total["waves"] += 1
        total["buckets_done"] += len(wave)
        total["urls"] += n_urls
    return total
