"""Streaming sessionization — the stateful-operator surface.

Two implementations of the same gap-based session semantics as the batch
``q_sessionize`` oracle (30-min inactivity gap), for streams:

- ``streaming_session_window``: the BUILT-IN path — ``withWatermark`` +
  ``F.session_window`` aggregation. This is what to reach for first:
  state is managed by Spark's streaming aggregation (RocksDB-capable at
  scale), late events within the watermark merge into their window, and
  append mode emits a session exactly once when the watermark passes its
  close. No Python in the loop.

- ``stateful_sessionize``: the CUSTOM path — ``applyInPandasWithState``,
  for semantics the built-in can't express (here: deterministic
  ``session_no`` numbering per user and successor-closure emission, the
  exact shape of the batch oracle). Per user the state holds the open
  session accumulator; an event arriving more than ``gap_s`` after the
  previous one closes and emits the predecessor. State is O(1) per key —
  no event buffering — so 10^8 users hold 10^8 small rows of state,
  partitioned by the groupBy hash like any shuffle.

Correctness contract (pinned by tests/test_streaming_sessions.py): fed
the same events in event-time order, ``stateful_sessionize`` emits exactly
the batch ``q_sessionize`` sessions (closed ones — the final open session
per user flushes when a later event or sentinel arrives). Reference scope
note: the reference has no stateful operators at all (its policy loop is
stateless per file); this is Spark-native capability mandated by the
training-pipeline brief.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

# open-session accumulator per user: (next_session_no, start, end, n, value_sum)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_no", T.LongType()),
        T.StructField("start", T.TimestampType()),
        T.StructField("end", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def streaming_session_window(
    events: DataFrame, gap_s: int = 1800, watermark: str = "1 hour"
) -> DataFrame:
    """Built-in streaming sessionization: watermarked session_window agg.
    Works on a streaming OR batch frame (same plan, Catalyst-native)."""
    e = events
    if e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            "user_id", "n_events", "session_start", "session_end", "session_value"
        )
    )


def stateful_sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState.

    Emits a session when its successor event arrives (> gap after the
    session's last event). Requires event-time-ordered delivery per key
    across micro-batches (enforce with a watermark + sorted sources; the
    engine's per-file offsets deliver appended records in write order).
    """
    gap = float(gap_s)

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            session_no, start, end, n, vsum = state.get
        else:
            session_no, start, end, n, vsum = 1, None, None, 0, 0.0
        out = []
        # ONE sort over the whole micro-batch: the runtime delivers a key's
        # rows as multiple Arrow chunks in shuffle-fetch order, so
        # per-chunk sorting would let chunk 2 carry timestamps earlier
        # than chunk 1's tail and move `end` backwards
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for ts, value in zip(pdf["ts"], pdf["value"]):
                if start is None:
                    start, end, n, vsum = ts, ts, 1, float(value)
                # WHOLE-SECOND gap, matching the pinned q_sessionize batch
                # oracle (it casts ts to epoch seconds): sub-second
                # fractions must not split sessions the oracle keeps
                elif int(ts.timestamp()) - int(end.timestamp()) > gap:
                    out.append(
                        (user_id, session_no, n, start, end, round(vsum, 4))
                    )
                    session_no += 1
                    start, end, n, vsum = ts, ts, 1, float(value)
                else:
                    end, n, vsum = ts, n + 1, vsum + float(value)
        state.update((session_no, start, end, n, vsum))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "session_no", "n_events",
                    "session_start", "session_end", "session_value",
                ],
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
