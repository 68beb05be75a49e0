"""Event-stream operators over ``events(event_id, ts, user_id, event_type, value, props)``.

The batch expression of the pipeline's streaming surface: tumbling-
window aggregation and gap-based sessionization. The reference's
serving DAG (deploy/pdserving/web_service.py:30-120) processes a
request stream with per-stage re-batching; these operators are the
relational equivalents, and ``webextract/streaming`` runs the same
logic under Structured Streaming with watermarks.

Sums over ``value`` go through DECIMAL(38,6) so partial/final
aggregation order cannot perturb the result (exact arithmetic —
oracle-portable), then surface as doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30  # minutes of silence that close a session (frozen)


def hourly_rollup(events: DataFrame, approx_users: bool = False) -> DataFrame:
    """Tumbling 1-hour rollup per event_type: counts, users, exact sum.

    Partial+final agg is native (one shuffle on (hour, event_type)).
    ``approx_users=True`` swaps the user count to
    ``approx_count_distinct`` (HLL++, rsd 2%) — the 100 TB choice:
    exact distinct shuffles every (group, user_id) pair, the sketch
    shuffles one fixed-size buffer per group. Default stays exact so
    the oracle matches bit-for-bit.
    """
    users = (
        F.approx_count_distinct(F.col("user_id"), 0.02)
        if approx_users
        else F.count_distinct(F.col("user_id"))
    )
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            users.alias("n_users"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions per user: a >gap_min silence starts a new
    session. lag + running-sum over a per-user window — the standard
    two-window sessionization (shuffles once on user_id; both windows
    share the partitioning so Spark plans a single exchange).

    Returns (user_id, session_id, n_events, t_start, t_end).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (cast-to-long would truncate fractional
    # seconds and could disagree with the oracle on boundary gaps)
    # parquet ts is TIMESTAMP_NTZ; cast to TIMESTAMP (lossless — session
    # TZ is pinned to UTC) because unix_micros rejects NTZ
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_min * 60 * 1_000_000), 1).otherwise(0)
    sess = (
        events.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(w))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
    )


def top_users_by_value(events: DataFrame, k: int = 10) -> DataFrame:
    """Top-k users by exact total value (rank window over one agg;
    deterministic tie-break on user_id)."""
    totals = events.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        F.count("*").alias("n_events"),
    )
    # distributed top-k (TakeOrderedAndProject) — never a global
    # unpartitioned window over the full user set
    order = [F.col("total_value").desc(), F.col("user_id").asc()]
    top = totals.orderBy(*order).limit(k)
    # single-group key derived from a column (bare literals fold away
    # and the global-window warning returns); ≤k rows, so one group
    # costs nothing. coalesce keeps the key constant for NULL users
    # (substring of NULL is NULL, which would split the group).
    w = Window.partitionBy(
        F.coalesce(F.substring(F.col("user_id").cast("string"), 0, 0), F.lit(""))
    ).orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "user_id", "total_value", "n_events"
    )
