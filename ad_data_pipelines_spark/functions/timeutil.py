"""Date/time column expressions.

Reference parity (SURVEY.md §2.2 P13, P17-P19; §2.7): duration-in-minutes,
calendar helpers, month grains, days-in-month. The reference computed
days-in-month with a manual next-month-minus-a-day loop
(scripts/ads_passenger_travel_info_mi.py:346-361); here it is
``dayofmonth(last_day(...))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def minutes_between(end: Column | str, start: Column | str) -> Column:
    """(end - start) in fractional minutes (P13).

    Microsecond-exact: uses unix_micros, not second-truncating
    unix_timestamp. Reference:
    scripts/ads_passenger_travel_info_mi.py:233 (pandas total_seconds/60).
    """
    return (F.unix_micros(_c(end)) - F.unix_micros(_c(start))) / F.lit(60_000_000.0)


def clamp_outliers(
    col: Column | str, lo: float, hi: float, fill: float = 0.0
) -> Column:
    """Out-of-range values → fill (P14).

    Reference transfer-time clamp <0 or >240 min → 0
    (scripts/ads_passenger_travel_info_mi.py:204-205).
    """
    c = _c(col)
    return F.when((c < lo) | (c > hi), F.lit(fill)).otherwise(c)


def month_str(col: Column | str) -> Column:
    """'yyyy-MM' month grain, the reference's ``to_period('M')`` (P17)."""
    return F.date_format(_c(col), "yyyy-MM")


def days_in_month(col: Column | str) -> Column:
    """Calendar days in the month of a date/timestamp (P19)."""
    return F.dayofmonth(F.last_day(_c(col)))


def quarter_month_part(col: Column | str) -> Column:
    """Quarter-month slice index 1-4 (day 1-7 / 8-14 / 15-21 / 22-end).

    The reference re-ran scans per quarter-month slice purely as a memory
    workaround (scripts/ads_route_…py:56-76) with inclusive boundaries that
    double-counted boundary days (SURVEY.md §4.4-1). This half-open
    derivation is the *correct* labeling; the engine computes it as a
    column and never re-scans.
    """
    d = F.dayofmonth(_c(col))
    return (
        F.when(d <= 7, 1).when(d <= 14, 2).when(d <= 21, 3).otherwise(4)
    )
