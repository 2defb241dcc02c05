"""ads_stop_passenger_trips_di — daily boarding/alighting counts per
station, with first-boarding and last-alighting journey endpoints.

Reference: scripts/ads_stop_passenger_trips_di - first 6 months 2025.py:
  * boarding / alighting counts per station (:44-60, '-' sentinel rows
    dropped per side),
  * first-boarding = leg_id==1 (:48-52),
  * last-alighting = rank(desc start_time)==1 per (uid, journey) (:62-65),
  * station-date spine = union of start/end keys (:39-41),
  * 4 chained left joins + zero-fill (:77-81),
  * AVM day-type joined after per-date dedup (:84-85).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ad_data_pipelines_spark.plans.transit_common import with_audit


def build(afc: DataFrame, avm: DataFrame | None = None) -> DataFrame:
    # reference drops legs touching '-' on EITHER side before every count
    # (scripts/ads_stop_…py:36: start != '-' AND end != '-')
    legs = (
        afc.withColumn("ope_date", F.to_date("start_time"))
        .filter((F.col("start_station_no") != "-") & (F.col("end_station_no") != "-"))
        .na.drop(subset=["start_station_no", "end_station_no"])
    )

    boarding = legs.groupBy(
        "ope_date", F.col("start_station_no").alias("station_no")
    ).agg(F.count("*").alias("boarding_num"))
    alighting = legs.groupBy(
        "ope_date", F.col("end_station_no").alias("station_no")
    ).agg(F.count("*").alias("alighting_num"))
    first_boarding = (
        legs.filter(F.col("leg_id") == 1)
        .groupBy("ope_date", F.col("start_station_no").alias("station_no"))
        .agg(F.count("*").alias("first_boarding_num"))
    )
    # rank over the SAME filtered frame (reference :62-65): a journey whose
    # true last leg was dropped counts its last *valid* leg as alighting
    w = Window.partitionBy("uid", "journey_id").orderBy(
        F.col("start_time").desc(), F.col("leg_id").desc()
    )
    last_alighting = (
        legs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy("ope_date", F.col("end_station_no").alias("station_no"))
        .agg(F.count("*").alias("last_alighting_num"))
    )

    spine = (
        boarding.select("ope_date", "station_no")
        .union(alighting.select("ope_date", "station_no"))
        .distinct()
    )
    out = (
        spine.join(boarding, ["ope_date", "station_no"], "left")
        .join(alighting, ["ope_date", "station_no"], "left")
        .join(first_boarding, ["ope_date", "station_no"], "left")
        .join(last_alighting, ["ope_date", "station_no"], "left")
        .na.fill(
            {
                "boarding_num": 0,
                "alighting_num": 0,
                "first_boarding_num": 0,
                "last_alighting_num": 0,
            }
        )
    )
    if avm is not None:
        wd = Window.partitionBy("OPD_DATE").orderBy("DAY_TYPE")
        avm_d = (
            avm.withColumn("__rn", F.row_number().over(wd))
            .filter(F.col("__rn") == 1)
            .select(F.col("OPD_DATE").alias("ope_date"), F.col("DAY_TYPE").alias("day_type"))
        )
        out = out.join(F.broadcast(avm_d), "ope_date", "left")
    else:
        out = out.withColumn("day_type", F.lit(None).cast("string"))
    return with_audit(out)
