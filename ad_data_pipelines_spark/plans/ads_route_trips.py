"""ads_route_passenger_trips_di — daily passenger trips per route and
direction.

Reference: scripts/ads_route_passenger_trips_di- first 6 months 2025.py.
Its quarter-month scan loop (:56-133) existed purely as a pandas memory
workaround and double-counted boundary days via inclusive `BETWEEN`
(SURVEY.md §4.4-1); the Spark plan is ONE pushed-down range scan and ONE
aggregation — partition pruning replaces the manual slicing.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.plans.transit_common import with_audit


def build(
    afc: DataFrame,
    start: dt.date | str | None = None,
    end: dt.date | str | None = None,
) -> DataFrame:
    """[start, end) half-open window → groupBy(date, route, dir).count().

    Output grain: (ope_date, route_no, direction) with passenger_trips.
    """
    df = afc
    if start is not None:
        df = df.filter(F.col("start_time") >= F.lit(str(start)))
    if end is not None:
        df = df.filter(F.col("start_time") < F.lit(str(end)))
    counts = df.groupBy(
        F.to_date("start_time").alias("ope_date"),
        F.col("route").alias("route_no"),
        F.col("tripdir").alias("direction"),
    ).agg(F.count("*").alias("passenger_trips"))
    return with_audit(counts)
