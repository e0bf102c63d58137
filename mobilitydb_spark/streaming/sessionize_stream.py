"""Stateful streaming sessionization — the custom stateful operator
shape (`applyInPandasWithState`) for the events stream.

Batch twin: `queries.q_sessionize` (gaps-and-islands, 30-min gap).
Here the per-user open session lives in GroupState; a session is
emitted when a new event arrives more than ``gap`` after the last one
(gap split) or when the event-time watermark passes last+gap
(timeout), so state is bounded and late data inside the watermark
still joins its session.

Arrow-batched per group — no per-row Python beyond the session scan,
which is O(events of that user in this micro-batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EVENTS_SCHEMA = ("event_id bigint, ts timestamp, user_id bigint, "
                 "event_type string, value double, props string")

OUT_SCHEMA = ("user_id bigint, session_start timestamp, "
              "session_end timestamp, n_events int")
STATE_SCHEMA = "start bigint, last bigint, n int"


def stream_sessions(events_stream: DataFrame, gap_min: int = 30,
                    watermark: str = "1 hour") -> DataFrame:
    """(user_id, session_start, session_end, n_events) of CLOSED
    sessions, append mode."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_min * 60 * 1_000_000

    def fn(key, pdf_iter, state):
        uid = int(key[0])
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((uid, start, last, n))
            state.remove()
        else:
            ts = np.sort(np.concatenate(
                [pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                 for pdf in pdf_iter] or [np.empty(0, dtype=np.int64)]))
            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0
            for t in ts:
                t = int(t)
                if last is not None and t - last > gap_us:
                    closed.append((uid, start, last, n))
                    start, n = None, 0
                if start is None:
                    start = t
                last = t
                n += 1
            if last is not None:
                state.update((start, last, n))
                # event-time timeout: close when the watermark passes
                # last + gap (ms granularity per the GroupState API)
                state.setTimeoutTimestamp(last // 1000 + gap_min * 60_000)
        if not closed:
            yield pd.DataFrame(columns=["user_id", "session_start",
                                        "session_end", "n_events"])
            return
        yield pd.DataFrame(
            [(u, np.datetime64(s, "us"), np.datetime64(e, "us"), k)
             for u, s, e, k in closed],
            columns=["user_id", "session_start", "session_end", "n_events"])

    return (events_stream
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(fn, OUT_SCHEMA, STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
