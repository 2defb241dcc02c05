"""Streaming sessionization: the `session_window` twin of the batch
operator (operators/sessionize.py) plus a custom stateful operator via
`applyInPandasWithState`.

Beyond-reference (SURVEY.md §2.9 — the reference has no streaming).

Two paths, same semantics:
  * `session_window_aggs` — built-in gap-based session windows. The
    watermark closes a session once event-time passes gap+watermark, so
    state is bounded; this is the production path (JVM-side state store,
    AQE-independent).
  * `running_user_totals` — `applyInPandasWithState` with an explicit
    GroupState, the escape hatch for session logic the built-in window
    can't express (e.g. cart-abandonment state machines, per-user model
    state). Shown here maintaining per-user running (n_events,
    value_sum) with a processing-time timeout.

Both work identically in batch mode: `session_window` is a plain groupBy
key on a static DataFrame — tests assert it agrees with the batch
sessionize operator's per-session counts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def session_window_aggs(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours"
) -> DataFrame:
    """Per-(user, session) aggregate using the built-in gap-based session
    window. Pass watermark=None for batch DataFrames (watermarks are a
    streaming-only concept; the groupBy itself is batch-compatible)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
            "value_sum",
        )
    )


STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def make_running_totals_update(timeout_ms: int = 0):
    """The GroupState update function behind `running_user_totals`,
    exposed at module scope so the timeout path is unit-testable
    without a wall-clock streaming harness."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Timeout invocation: the batch iterator is empty. Drop the
            # idle user's state WITHOUT re-arming the timeout — updating
            # here would re-register the key and state would grow
            # O(all users ever seen), never expiring. Emit the final
            # cumulative row so downstreams see the last value.
            n, total = state.get if state.exists else (0, 0.0)
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [round(total, 2)],
                }
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if timeout_ms > 0:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [round(total, 2)],
            }
        )

    return update


def running_user_totals(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful operator: per-user running totals kept in an
    explicit GroupState across micro-batches.

    State is one (count, sum) pair per user — O(users), not O(events);
    set a processing-time timeout (timeout_ms>0) to expire idle users on
    unbounded key spaces (state is removed, not re-armed, when the
    timeout fires). Each micro-batch emits the user's updated cumulative
    row (update output mode).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        make_running_totals_update(timeout_ms),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
