"""Streaming sessionization — ``applyInPandasWithState`` form of the
batch gap-sessionizer.

The batch operator (``operators/sessionize.py::sessionize_by_gap``,
gate `sessionize`) assigns session ids with a lag-window over the whole
history; a stream can't window history, so the streaming form keeps ONE
tiny state row per user — (open session seq, first/last event micros,
count) — and closes a session when the gap exceeds the threshold or the
event-time watermark passes it.

State shape (what survives at scale): per-key state is 4 integers
regardless of event volume; Spark's state store shards it by the group
key, and watermark-driven timeouts bound it to ACTIVE users.  Late
events beyond the watermark are dropped by the engine before they reach
the function — the same late-data policy the batch/stream parity test
acknowledges by comparing only closed sessions.

This is the engine's demonstration of the *generic* stateful-UDF API;
the trace assembler deliberately uses its own snapshot state instead
(rewind-to-batch recovery needs state versioning the GroupState API
doesn't expose — see streaming/trace_assembler.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)
# after a timeout-close, the per-user row (4 ints) is retained this long
# so session numbering stays monotone across visits; after retention the
# counter is dropped and numbering may restart (documented trade-off:
# state stays bounded by RECENTLY-active users)
SEQ_RETENTION_US = 30 * 86400 * 1_000_000

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)


def streaming_sessions(
    events: DataFrame,
    gap_us: int,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Closed sessions per user from a streaming events DataFrame.

    Emits a row when a session CLOSES — either a new event arrives past
    the gap, or the event-time timeout fires (watermark passed the open
    session's end + gap).  Session numbering matches the batch operator
    (consecutive per user from 1) with two documented streaming caveats:
    an in-watermark straggler OLDER than the open session closes as its
    own session whose seq reflects session-open order, not time order;
    and after ``SEQ_RETENTION_US`` of inactivity the per-user counter row
    is dropped, so numbering restarts for users idle longer than that.
    Exact batch parity holds when the watermark delay ≤ the gap (events
    later than that are dropped by the engine on both paths).
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.exists:
            seq, n, start, end = state.get
        else:
            seq, n, start, end = 0, 0, None, None
        closed: list[tuple] = []
        if state.hasTimedOut:
            if n:
                # emit the open session but KEEP the sequence counter:
                # removing state here would restart numbering at 1 on the
                # user's next visit, colliding (user_id, session_seq) keys
                # with already-emitted sessions
                closed.append((user, seq, n, start, end))
                state.update((seq, 0, 0, end))
                state.setTimeoutTimestamp(
                    (end + SEQ_RETENTION_US) // 1000 + 1
                )
            else:
                state.remove()  # retention passed: drop the counter row
        else:
            ts_all = pd.concat(
                [pdf["_ts_us"] for pdf in pdfs], ignore_index=True
            ).sort_values(kind="mergesort")
            for ts in ts_all:
                ts = int(ts)
                if n and ts - end > gap_us:
                    closed.append((user, seq, n, start, end))
                    n, start = 0, None
                elif n and ts < start - gap_us:
                    # in-watermark straggler older than the open session:
                    # it can't belong to it — emit it as its own (earlier)
                    # session rather than folding it in and corrupting the
                    # open session's start/count.  Its seq reflects
                    # session-OPEN order, not time order (documented).
                    seq += 1
                    closed.append((user, seq, 1, ts, ts))
                    continue
                if n == 0:
                    seq, start = seq + 1, ts
                    n, end = 1, ts
                else:
                    n, end = n + 1, max(end, ts)
                    start = min(start, ts)
            state.update((seq, n, start, end))
            # close via timeout once the watermark passes end + gap
            state.setTimeoutTimestamp((end + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_seq", "n_events", "start_us",
                    "end_us",
                ],
            )

    from ton_indexer_spark.functions.timecols import epoch_us

    ev = events.withWatermark(ts_col, watermark)
    ev = ev.withColumn("_ts_us", epoch_us(ev, ts_col))
    return (
        ev.groupBy(F.col(user_col).alias("user_id"))
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
