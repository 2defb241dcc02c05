"""Ordered-bucket labeling expressions.

Reference parity (SURVEY.md §2.2 P15, P16): pandas ``pd.cut`` right-closed
bins (scripts/ads_passenger_travel_distance_di.py:210-220) and the 9-bucket
``case_when`` travel-time bins (scripts/ads_passenger_travel_time_di.R:140-151).
Implemented as `when()` chains so exact boundary semantics (right-closed,
include-lowest) are explicit and codegen-friendly — `Bucketizer` is
left-closed and would silently flip boundaries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def right_closed_bins(
    col: Column | str,
    edges: Sequence[float],
    labels: Sequence[str],
    *,
    include_lowest: bool = True,
) -> Column:
    """pd.cut semantics: bins (e0,e1], (e1,e2], …; first bin [e0,e1] when
    include_lowest (P15). len(labels) == len(edges)-1; +inf allowed as the
    last edge."""
    if len(labels) != len(edges) - 1:
        raise ValueError("need len(labels) == len(edges) - 1")
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for i, label in enumerate(labels):
        lo, hi = edges[i], edges[i + 1]
        lower = (c >= lo) if (i == 0 and include_lowest) else (c > lo)
        cond = lower if hi == float("inf") else (lower & (c <= hi))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr


def threshold_bins(
    col: Column | str,
    thresholds: Sequence[float],
    labels: Sequence[str],
) -> Column:
    """case_when ≤t1 / ≤t2 / … / >tn chain (P16): len(labels) ==
    len(thresholds)+1, last label is the overflow bucket."""
    if len(labels) != len(thresholds) + 1:
        raise ValueError("need len(labels) == len(thresholds) + 1")
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for t, label in zip(thresholds, labels[:-1]):
        expr = F.when(c <= t, label) if expr is None else expr.when(c <= t, label)
    return expr.otherwise(labels[-1])
