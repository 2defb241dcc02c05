"""Geospatial scalar expressions.

Reference parity (SURVEY.md §2.2 P20): VDV stores coordinates as signed
DDDMMSSmmm integers (degrees·10^7 + minutes·10^5 + milli-seconds-of-arc);
the reference converted them with a row-wise R function
(scripts/ads_passenger_travel_time_di.R:29-48, duplicated in
dwd_bus_route_info_mf & other 2.R:32-51 and
ads_fare_revenue_region_mi.R:39-58). Pure column arithmetic here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dddmmss_to_decimal(col: Column | str, precision: int = 6) -> Column:
    """Signed DDDMMSSmmm integer → decimal degrees, rounded.

    sign · (DDD + MM/60 + SS.mmm/3600), floor-decomposed exactly like
    the reference (sign-aware: decomposition runs on abs(v)).
    """
    c = F.col(col) if isinstance(col, str) else col
    a = F.abs(c).cast("long")
    sign = F.when(c < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    ddd = F.floor(a / 10_000_000)
    mm = F.floor((a % 10_000_000) / 100_000)
    ss = (a % 100_000) / 1_000.0
    return F.round(sign * (ddd + mm / 60.0 + ss / 3600.0), precision)


def dddmmss_to_decimal_sql(expr: str, precision: int = 6) -> str:
    """DuckDB oracle twin with identical floor decomposition."""
    return (
        f"ROUND((CASE WHEN {expr} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(FLOOR(ABS({expr}) / 10000000) "
        f"+ FLOOR((ABS({expr}) % 10000000) / 100000) / 60.0 "
        f"+ ((ABS({expr}) % 100000) / 1000.0) / 3600.0), {precision})"
    )
