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


#: milliarcseconds per degree (3600 arcsec · 1000)
_MAS_PER_DEG = 3_600_000


def _idiv(n: Column, d: int) -> Column:
    """Exact integer division for non-negative longs: (n - n%d)/d is an
    exact multiple, so the double divide is exact (inputs < 2^53)."""
    return ((n - F.pmod(n, F.lit(d))) / F.lit(d)).cast("long")


def dddmmss_to_decimal(col: Column | str, precision: int = 6) -> Column:
    """Signed DDDMMSSmmm integer → decimal degrees, rounded half-up.

    sign · (DDD + MM/60 + SS.mmm/3600), floor-decomposed exactly like
    the reference (sign-aware: decomposition runs on abs(v)).

    Rounding happens in INTEGER arithmetic: the input is exact
    milliarcseconds, so round(deg, p) = ⌊(2·mas·10^p + MAS_PER_DEG) /
    (2·MAS_PER_DEG)⌋ — no float ROUND involved. Engine ROUND
    implementations disagree within 1 ulp of the .5 boundary (Spark vs
    DuckDB diverged on 1 of 20k coords at sf0.1); exact integer
    rounding is bit-identical everywhere by construction.
    """
    c = F.col(col) if isinstance(col, str) else col
    a = F.abs(c).cast("long")
    sign = F.when(c < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    ddd = _idiv(a, 10_000_000)
    mm = _idiv(F.pmod(a, F.lit(10_000_000)), 100_000)
    mas = ddd * _MAS_PER_DEG + mm * 60_000 + F.pmod(a, F.lit(100_000))
    scale = 10 ** precision
    scaled = _idiv(mas * (2 * scale) + _MAS_PER_DEG, 2 * _MAS_PER_DEG)
    return sign * scaled / F.lit(float(scale))


def dddmmss_to_decimal_sql(expr: str, precision: int = 6) -> str:
    """DuckDB oracle twin: identical integer decomposition and exact
    integer rounding (// is bigint division on bigint operands)."""
    scale = 10 ** precision
    a = f"CAST(ABS({expr}) AS BIGINT)"
    mas = (
        f"(({a} // 10000000) * {_MAS_PER_DEG} "
        f"+ (({a} % 10000000) // 100000) * 60000 "
        f"+ ({a} % 100000))"
    )
    return (
        f"((CASE WHEN {expr} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(({mas} * {2 * scale} + {_MAS_PER_DEG}) // {2 * _MAS_PER_DEG}) "
        f"/ {float(scale)})"
    )
