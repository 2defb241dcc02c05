"""Key-cleaning / null-policy column expressions.

Reference parity (SURVEY.md §2.2): the reference applied a row-wise Python
`deep_clean` UDF to join keys on both sides of every AFC⋈VDV join
(reference: scripts/ads_passenger_travel_info_mi.py:145-151, duplicated in
ads_passenger_transfer_count_di.py:121-128 and
ads_passenger_travel_distance_di.py:161-167). Here it is a pure Column
expression — JVM-side, codegen'd, no Python round trip.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: NA spellings the reference ingestion normalized to NULL
#: (reference: data_ingestion/pg_import.R:83).
NA_STRINGS = ["", "NA", "NULL", "null", "N/A", "#N/A"]


def deep_clean(col: Column | str) -> Column:
    """strip → drop non-alphanumerics → uppercase (P7).

    Equivalent of the reference's ``deep_clean`` join-key scrubber
    (scripts/ads_passenger_travel_info_mi.py:145-151).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.upper(F.regexp_replace(F.trim(c), r"[^0-9A-Za-z]", ""))


def strip_quotes(col: Column | str) -> Column:
    """Remove literal double quotes (reference VDV parsing,
    scripts/ads_passenger_travel_info_mi.py:113)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, '"', "")


def nullify_na_strings(col: Column | str) -> Column:
    """Map the reference's NA-string list to real NULLs (P6/S4)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c).isin(NA_STRINGS), F.lit(None)).otherwise(c)
