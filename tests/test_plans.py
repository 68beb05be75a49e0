"""Checkpoint/resume pipeline tests: full run, resume skip, and
idempotent re-run after a simulated mid-job failure."""

import json
import os

import pytest
from pyspark.sql import functions as F

from webextract.plans.pipeline import (
    JobConfig,
    done_buckets,
    run_extraction,
)
from webextract.sources.pages import pages_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def pages(spark):
    return pages_from_documents(spark, SF)


def test_full_run_then_resume_noop(spark, pages, tmp_path):
    cfg = JobConfig(output_dir=str(tmp_path / "out"), n_buckets=8, wave_size=4)
    stats = run_extraction(spark, pages, cfg)
    assert stats["waves"] == 2
    assert stats["buckets_done"] == 8
    assert stats["urls"] == 500
    out = spark.read.parquet(os.path.join(cfg.output_dir, "extracted"))
    assert out.count() == 500
    assert out.select("url").distinct().count() == 500
    # lineage written alongside
    lin = spark.read.parquet(os.path.join(cfg.output_dir, "lineage"))
    assert lin.agg(F.sum("urls_in")).first()[0] == 500

    # resume: everything manifested → zero new waves
    stats2 = run_extraction(spark, pages, cfg)
    assert stats2["waves"] == 0
    assert stats2["urls"] == 0


def test_resume_processes_only_missing_buckets(spark, pages, tmp_path):
    cfg = JobConfig(output_dir=str(tmp_path / "out"), n_buckets=8, wave_size=8)
    # simulate a prior partial run: pretend buckets 0-5 are committed
    os.makedirs(os.path.join(cfg.output_dir, "_manifest"), exist_ok=True)
    with open(
        os.path.join(cfg.output_dir, "_manifest", "wave-00000.json"), "w"
    ) as f:
        json.dump({"buckets": [0, 1, 2, 3, 4, 5]}, f)
    stats = run_extraction(spark, pages, cfg)
    assert stats["waves"] == 1
    assert done_buckets(cfg) == set(range(8))
    out = spark.read.parquet(os.path.join(cfg.output_dir, "extracted"))
    # only buckets 6,7 were written
    assert set(r["bucket"] for r in out.select("bucket").distinct().collect()) == {6, 7}
    # every written url hashes into those buckets (partition correctness)
    n_bad = out.filter(
        F.pmod(F.xxhash64("url"), F.lit(8)).cast("int") != F.col("bucket")
    ).count()
    assert n_bad == 0


def test_rerun_overwrites_unmanifested_bucket(spark, pages, tmp_path):
    cfg = JobConfig(output_dir=str(tmp_path / "out"), n_buckets=4, wave_size=4)
    run_extraction(spark, pages, cfg)
    # wipe one wave manifest (simulates dying between write and commit)
    mdir = os.path.join(cfg.output_dir, "_manifest")
    for name in os.listdir(mdir):
        os.remove(os.path.join(mdir, name))
    stats = run_extraction(spark, pages, cfg)
    assert stats["waves"] == 1
    out = spark.read.parquet(os.path.join(cfg.output_dir, "extracted"))
    # dynamic partition overwrite → no duplicated urls
    assert out.count() == 500
    assert out.select("url").distinct().count() == 500
