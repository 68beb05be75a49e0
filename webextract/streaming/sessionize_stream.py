"""Stateful streaming sessionization: ``applyInPandasWithState``.

The custom-stateful-operator face of the engine (the batch twin is
``webextract.operators.events.sessionize``). Each user's events stream
through micro-batches; per-user state carries the OPEN session
(session_id, start, last_ts, n_events); a gap > ``gap_min`` closes the
session, which is emitted downstream ("append" semantics — a session
is only known complete once the gap that ends it has been seen, so
each user's final open session stays in state for the next run).

At 10^12 scale: state is one tiny tuple per active user, partitioned
by the groupBy key; Spark's state store checkpoints it with the
stream, so resume is exactly-once without any custom code.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("t_start", T.TimestampType(), False),
        T.StructField("t_end", T.TimestampType(), False),
    ]
)

# state: (session_id, n_events, start_us, last_us)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
    ]
)


def _session_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    gap_us = SESSION_GAP_MIN * 60 * 1_000_000
    (user_id,) = key
    if state.exists:
        sid, n, start_us, last_us = state.get
    else:
        sid, n, start_us, last_us = 0, 0, None, None

    closed: list[tuple] = []
    frames = [pdf for pdf in pdfs if len(pdf)]
    if frames:
        # one sort across ALL chunks of this group in the batch —
        # per-chunk order is not guaranteed
        whole = pd.concat(frames) if len(frames) > 1 else frames[0]
        whole = whole.sort_values(["ts", "event_id"])
        for ts in whole["ts"]:
            us = int(ts.value // 1000)  # pandas ns → µs
            if start_us is None:
                sid, n, start_us, last_us = 1, 1, us, us
            elif us - last_us > gap_us:
                closed.append((user_id, sid, n, start_us, last_us))
                sid += 1
                n, start_us, last_us = 1, us, us
            else:
                n += 1
                last_us = us
    state.update((sid, n, start_us, last_us))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_id": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
                "t_start": [pd.Timestamp(c[3] * 1000) for c in closed],
                "t_end": [pd.Timestamp(c[4] * 1000) for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming DataFrame of events → append-mode stream of CLOSED
    sessions (schema = the batch sessionize output)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        SESSION_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_sessionize_stream(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """Drain an events parquet directory through the stateful operator
    (availableNow), writing closed sessions to parquet."""
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    events = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    q = (
        sessionize_stream(events)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
