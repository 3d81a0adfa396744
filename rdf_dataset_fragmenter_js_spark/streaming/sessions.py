"""Sessionization over the events table.

Batch form: classic gap-based sessions with window functions (lag → new
session flag → running sum), one shuffle on user_id. Streaming forms: the
same semantics over an unbounded source via watermark + session window
(``sessionize_streaming``), and a CUSTOM stateful operator via
``applyInPandasWithState`` (``sessionize_stateful``) for semantics the
built-in session window cannot express — closed-session emission with
explicit per-user state and processing-time timeouts, checkpoint-restored
across query restarts.
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


def sessionize_stateful(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    state_timeout_ms: int = 60_000,
):
    """CUSTOM stateful sessionization via ``applyInPandasWithState`` — the
    arbitrary-state path for semantics ``session_window`` cannot express
    (here: emit one row per CLOSED session, closing on gap or on
    processing-time timeout, with explicit per-user state that survives
    restarts through the checkpointed state store).

    Per user the state is (last_ts, session_start, n_events) as epoch
    seconds; a new event more than ``gap_seconds`` after ``last_ts``
    closes the open session and emits (user_id, session_start,
    session_end, n_events). A user idle past ``state_timeout_ms`` of
    processing time has their open session flushed and state removed.
    Output mode: append."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id long, session_start double, session_end double, n_events long"
    )
    state_schema = "last_ts double, session_start double, n_events long"
    cols = ["user_id", "session_start", "session_end", "n_events"]

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.hasTimedOut:
            last_ts, session_start, n = state.get
            state.remove()
            yield pd.DataFrame([(user_id, session_start, last_ts, n)], columns=cols)
            return
        if state.exists:
            last_ts, session_start, n = state.get
        else:
            last_ts = session_start = None
            n = 0
        closed = []
        stamps = []
        for pdf in pdf_iter:
            stamps.extend(t.timestamp() for t in pdf["ts"])
        for t in sorted(stamps):
            if last_ts is not None and t - last_ts > gap_seconds:
                closed.append((user_id, session_start, last_ts, n))
                session_start, n = None, 0
            if session_start is None:
                session_start = t
            last_ts = t
            n += 1
        state.update((last_ts, session_start, n))
        state.setTimeoutDuration(state_timeout_ms)
        yield pd.DataFrame(closed, columns=cols)

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
