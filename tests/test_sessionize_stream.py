"""Stateful-streaming sessionization: closed sessions emitted across
micro-batch boundaries must equal the batch sessionizer's non-final
sessions on the same input."""

import os

from pyspark.sql import functions as F

from webextract.operators.events import sessionize
from webextract.streaming.sessionize_stream import run_sessionize_stream

SF = "/root/testdata/sf0.001"


def test_stream_sessions_match_batch(spark, tmp_path):
    events = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    inp = str(tmp_path / "in")
    # time-range files in name order → micro-batches arrive time-ordered,
    # so cross-batch state stitching is exercised AND batch parity holds
    events.repartitionByRange(4, "ts").sortWithinPartitions(
        "ts", "event_id"
    ).write.parquet(inp)
    # FileStreamSource orders files by modification time; equal mtimes
    # make arrival order nondeterministic — stagger them in name order
    import time as _time

    base = _time.time() - 1000
    for k, name in enumerate(sorted(os.listdir(inp))):
        if name.startswith("part"):
            os.utime(os.path.join(inp, name), (base + k * 10, base + k * 10))

    out = str(tmp_path / "out")
    run_sessionize_stream(spark, inp, out, str(tmp_path / "ckpt"))

    streamed = spark.read.parquet(out)
    # batch truth: every session except each user's LAST (still open in
    # streaming state at drain end)
    batch = sessionize(events)
    last = batch.groupBy("user_id").agg(
        F.max("session_id").alias("last_sid")
    )
    closed_truth = batch.join(last, "user_id").filter(
        F.col("session_id") < F.col("last_sid")
    )
    n_truth = closed_truth.count()
    assert streamed.count() == n_truth
    if n_truth:
        j = streamed.select(
            "user_id",
            "session_id",
            F.col("n_events").alias("s_n"),
            F.col("t_start").alias("s_start"),
            F.col("t_end").alias("s_end"),
        ).join(closed_truth, ["user_id", "session_id"], "inner")
        assert j.count() == n_truth
        mism = j.filter(
            (F.col("s_n") != F.col("n_events"))
            | (F.col("s_start") != F.col("t_start"))
            | (F.col("s_end") != F.col("t_end"))
        ).count()
        assert mism == 0
    # multiple micro-batches actually ran (state crossed batches)
    assert len(os.listdir(str(tmp_path / "ckpt") + "/commits")) >= 4
