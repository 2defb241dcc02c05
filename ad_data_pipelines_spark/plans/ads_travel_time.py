"""ads_passenger_travel_time_di — trips/journeys/transfers by travel-time
band per day and region.

Reference: scripts/ads_passenger_travel_time_di.R. Three aggregate
branches off one enriched leg table:
  * trips by 9-bucket travel-time bin (:130-152),
  * transfers (multi-leg journeys' non-first boardings) by bin (:157-194),
  * journeys (journey-level travel time rollup) by bin (:200-254),
joined 3-way FULL OUTER on (date, bin, region) (:258-262) and rolled up
to 'Overall' (:265-282).

Bug-compat note (SURVEY.md §4.4-4): the reference bins transfers by LEG
travel time, not transfer wait time (R:182-193 uses travel_time_minutes).
Default here bins by transfer wait (the evident intent);
``bug_compat=True`` reproduces the reference's column choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions import minutes_between, threshold_bins
from ad_data_pipelines_spark.functions.mapping import first_digit_map
from ad_data_pipelines_spark.functions import deep_clean
from ad_data_pipelines_spark.plans.transit_common import REGION_DIGITS, with_audit

TIME_THRESHOLDS = [10, 20, 30, 40, 50, 60, 90, 120]
TIME_LABELS = [
    "0-10", "10-20", "20-30", "30-40", "40-50", "50-60", "60-90", "90-120", "120+",
]


def _bins(col):
    return threshold_bins(col, TIME_THRESHOLDS, TIME_LABELS)


def build(afc: DataFrame, line: DataFrame, bug_compat: bool = False) -> DataFrame:
    # region via abs(OP_DEP_NO) first digit (this script's convention, P9)
    # deterministic one-region-per-line (dropDuplicates keeps an arbitrary
    # row under shuffle when duplicate LINE_ABBRs disagree — §4.4-6):
    # resolve by the lowest OP_DEP_NO, matching transit_common.dedup_line.
    route_region = (
        line.select(
            deep_clean("LINE_ABBR").alias("line_key"),
            "OP_DEP_NO",
        )
        .groupBy("line_key")
        .agg(F.min("OP_DEP_NO").alias("OP_DEP_NO"))
        .select(
            "line_key",
            first_digit_map("OP_DEP_NO", REGION_DIGITS).alias("region_id"),
        )
    )
    legs = (
        afc.withColumn("route_key", deep_clean("route"))
        .join(F.broadcast(route_region), F.col("route_key") == F.col("line_key"), "left")
        .na.fill({"region_id": "Unknown"})
        .withColumn("ope_date", F.to_date("start_time"))
        .withColumn("travel_min", minutes_between("end_time", "start_time"))
    )

    trips = legs.groupBy(
        "ope_date", _bins(F.col("travel_min")).alias("time_range_type"), "region_id"
    ).agg(F.sum("boarding").alias("passenger_trips"))

    w = Window.partitionBy("uid", "journey_id").orderBy("leg_id")
    transfers_base = (
        legs.filter(F.col("is_multi_leg_journey_leg") == 1)
        .withColumn("prev_end", F.lag("end_time").over(w))
        .withColumn("transfer_min", minutes_between("start_time", F.col("prev_end")))
        .filter(F.col("prev_end").isNotNull())
    )
    transfer_bin_col = (
        F.col("travel_min") if bug_compat else F.col("transfer_min")
    )
    transfers = transfers_base.groupBy(
        "ope_date", _bins(transfer_bin_col).alias("time_range_type"), "region_id"
    ).agg(F.count("*").alias("transfer_num"))

    journeys = (
        legs.groupBy("ope_date", "uid", "journey_id", "region_id")
        .agg(F.sum("travel_min").alias("journey_min"))
        .groupBy(
            "ope_date", _bins(F.col("journey_min")).alias("time_range_type"), "region_id"
        )
        .agg(F.count("*").alias("journey_num"))
    )

    keys = ["ope_date", "time_range_type", "region_id"]
    joined = (
        trips.join(journeys, keys, "full")
        .join(transfers, keys, "full")
        .na.fill({"passenger_trips": 0, "journey_num": 0, "transfer_num": 0})
    )

    overall = joined.groupBy("ope_date", "time_range_type").agg(
        F.sum("passenger_trips").alias("passenger_trips"),
        F.sum("journey_num").alias("journey_num"),
        F.sum("transfer_num").alias("transfer_num"),
    ).withColumn("region_id", F.lit("Overall"))

    out = joined.unionByName(overall).select(
        "ope_date", "time_range_type", "region_id",
        "passenger_trips", "journey_num", "transfer_num",
    )
    return with_audit(out)
