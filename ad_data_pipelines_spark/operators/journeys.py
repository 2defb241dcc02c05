"""Journey/sequence window operators.

Reference parity (SURVEY.md §2.5 W1-W5): the reference computed
next/previous-leg times with pandas ``shift`` after a sort
(scripts/ads_passenger_travel_info_mi.py:195-198) and R ``lag`` after
``arrange`` (scripts/ads_passenger_travel_time_di.R:165-173). Spark window
functions express this globally — no chunk-boundary journey splits
(SURVEY.md §4.4-3), and the shuffle is a single hash-partition on the
journey key, so it scales linearly with data size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def journey_window(
    partition_cols: Sequence[str], order_cols: Sequence[str | Column]
):
    """Window spec partitioned by journey identity, ordered by leg order.

    Order columns should be a *unique* key within the partition (e.g.
    leg_id, or (start_time, leg_id)) so lead/lag are deterministic under
    shuffle — the reference relied on file order, which Spark must not
    (SURVEY.md §4.4-6).
    """
    return Window.partitionBy(*partition_cols).orderBy(*order_cols)


def with_next_start(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    time_col: str = "start_time",
    out_col: str = "next_start_time",
) -> DataFrame:
    """LEAD of the next leg's start time per journey (W1)."""
    w = journey_window(partition_cols, order_cols)
    return df.withColumn(out_col, F.lead(time_col).over(w))


def with_prev_end(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    time_col: str = "end_time",
    out_col: str = "prev_end_time",
) -> DataFrame:
    """LAG of the previous leg's end time per journey (W2)."""
    w = journey_window(partition_cols, order_cols)
    return df.withColumn(out_col, F.lag(time_col).over(w))


def with_last_leg_flag(
    df: DataFrame,
    partition_cols: Sequence[str],
    leg_col: str = "leg_id",
    out_col: str = "is_last_leg",
) -> DataFrame:
    """max(leg) over journey == this leg (W3). Frame-free aggregate window;
    reference zeroed transfer_time on the last leg
    (scripts/ads_passenger_travel_info_mi.py:209-210)."""
    w = Window.partitionBy(*partition_cols)
    return df.withColumn(out_col, (F.max(leg_col).over(w) == F.col(leg_col)).cast("int"))


def keep_last_by(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """row_number()==1 over a descending (or any explicit) order (W4/A16).

    Deterministic replacement for pandas ``rank(method='first',
    ascending=False)==1`` (scripts/ads_stop_…py:62-65) and
    ``drop_duplicates(keep='first')`` — the explicit order key makes the
    kept row well-defined under Spark's shuffle.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
