"""Categorical mapping expressions (region / service-type / patches).

Reference parity (SURVEY.md §2.2 P8-P11): the reference used row-wise
`apply` functions for these; all are `when()` chains here.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def prefix_map(
    col: Column | str,
    prefixes: Mapping[str, str],
    default: str = "Unknown",
) -> Column:
    """First-matching-prefix → label, else default (P8).

    Reference: OP_DEP_ABBR prefixes AD/ER/WR → region
    (scripts/ads_passenger_travel_info_mi.py:121-132).
    """
    c = F.col(col) if isinstance(col, str) else col
    expr: Column | None = None
    for prefix, label in prefixes.items():
        cond = c.startswith(prefix)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def first_digit_map(
    col: Column | str,
    digits: Mapping[str, str],
    default: str = "Unknown",
) -> Column:
    """first digit of abs(int col) → label (P9).

    Reference: scripts/ads_passenger_travel_time_di.R:104-108.
    """
    c = F.col(col) if isinstance(col, str) else col
    first = F.substring(F.abs(c).cast("string"), 1, 1)
    expr: Column | None = None
    for digit, label in digits.items():
        cond = first == digit
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def pair_case(
    left: Column | str,
    right: Column | str,
    table: Mapping[tuple[str, str], str],
    default: str = "Unknown",
) -> Column:
    """(left, right) 2-key CASE → label (P10).

    Reference: (Region × ServiceType) → 7 service labels, implemented as a
    rowwise ``apply(axis=1)`` (scripts/ads_ridership_…py:129-148).
    """
    lc = F.col(left) if isinstance(left, str) else left
    rc = F.col(right) if isinstance(right, str) else right
    expr: Column | None = None
    for (lv, rv), label in table.items():
        cond = (lc == lv) & (rc == rv)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(default) if expr is not None else F.lit(default)


def patch_values(
    col: Column | str,
    key: Column | str,
    patches: Mapping[str, str],
) -> Column:
    """Manual row fix-ups: where key==k, replace col with v (P11).

    Reference: ``.loc[route=='ADL', Region]='Abu Dhabi'``
    (scripts/ads_ridership_…py:124-125).
    """
    c = F.col(col) if isinstance(col, str) else col
    k = F.col(key) if isinstance(key, str) else key
    expr = c
    for kv, vv in patches.items():
        expr = F.when(k == kv, F.lit(vv)).otherwise(expr)
    return expr
