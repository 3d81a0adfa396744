"""Sessionization over the events table.

Batch form: classic gap-based sessions with window functions (lag → new
session flag → running sum), one shuffle on user_id. Streaming form: the
same semantics over an unbounded source via watermark + session window —
``events.withWatermark("ts", ...).groupBy(session_window("ts", gap),
"user_id")`` — provided for readStream sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap from
    the previous event exceeds ``gap_seconds``. Returns the input plus
    ``session_id`` (1-based per user). Deterministic ordering: (ts,
    event_id)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_session = F.when(
        prev.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev)) > gap_seconds),
        1,
    ).otherwise(0)
    return events.withColumn("session_id", F.sum(new_session).over(w))


def sessionize_counts(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, n_sessions, n_events) aggregate of :func:`sessionize`."""
    s = sessionize(events, gap_seconds)
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def sessionize_streaming(events_stream: DataFrame, gap: str = "30 minutes"):
    """Structured-Streaming session aggregation: event-time session windows
    with a watermark for late data. Returns (user_id, session_window,
    n_events) as an unbounded aggregation suitable for ``writeStream``."""
    return (
        events_stream.withWatermark("ts", gap)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
