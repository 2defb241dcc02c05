"""Gap-based sessionization — the classic user-behavior operator the
reference's batch model never needed (journeys arrive pre-grouped by
journey_id), included beyond-reference for event streams.

Batch form: two windows over one shuffle —
  new_session = gap_to_previous > timeout (or first event)
  session_idx = running sum of new_session flags
then a per-session aggregate. The streaming twin would be
`session_window(ts, timeout)` in Structured Streaming (state-bounded by
watermark); the batch form here is oracle-checkable and used for
backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    timeout_min: float = 30.0,
) -> DataFrame:
    """Per-session aggregate: (user, session_idx, n_events, start/end
    strings, value_sum). Deterministic via the unique (ts, tiebreak)
    order key; one hash-partition shuffle on the user key."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap_us = F.unix_micros(F.col(ts_col)) - F.lag(
        F.unix_micros(F.col(ts_col))
    ).over(w)
    new_session = F.when(
        gap_us.isNull() | (gap_us > int(timeout_min * 60_000_000)), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_ids = events.withColumn("session_idx", F.sum(new_session).over(run))
    return with_ids.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


def sessionize_sql(timeout_min: float = 30.0) -> str:
    timeout_us = int(timeout_min * 60_000_000)
    return f"""
        WITH flagged AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                          OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {timeout_us}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        ids AS (
            SELECT *, CAST(SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING
            ) AS BIGINT) AS session_idx
            FROM flagged
        )
        SELECT user_id, session_idx, COUNT(*) AS n_events,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
               ROUND(SUM(value), 2) AS value_sum
        FROM ids GROUP BY 1, 2
    """
