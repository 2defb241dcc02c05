"""ads_ridership_passenger_trips_di — daily ridership per service type.

Reference: scripts/ads_ridership_passenger_trips_di - first 6 months
2025.py. Per (date, route): total legs (trip_num), first legs
(leg1_num = journeys), transfers = difference; route → (Region, Service
Type) via the Excel service-type lookup (S8) with the manual ADL patch
(P11, :124-125); (Region × Service Type) → 7 service labels (P10,
:129-148); final rollup to (service_type, region, date).

Spark-first deltas from the reference (SURVEY.md §4.4):
  * leg1 counts via ONE conditional aggregate (A2) instead of the
    groupby + left join + fillna chain (J4, :91-99) — no second shuffle;
  * the 6×4 quarter-month loop with inclusive boundaries (:129-133,
    double-counts shared days, partially papered over by
    drop_duplicates) is replaced by one full-range scan — no
    duplication by construction;
  * audit timestamps via current_timestamp at write time.

Scale: one shuffle on (date, route) [pre-aggregation] + one on the
3-key output grain; both lookups broadcast. Skew-free keys (dates ×
routes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions.mapping import pair_case, patch_values
from ad_data_pipelines_spark.operators.agg import count_if
from ad_data_pipelines_spark.plans.transit_common import with_audit

#: (Region × Service Type) → service label (reference :129-148).
SERVICE_LABELS: dict[tuple[str, str], str] = {
    ("Abu Dhabi", "Local"): "AD Local",
    ("Abu Dhabi", "Regional"): "AD Regional",
    ("Abu Dhabi", "Link"): "AD Link",
    ("Al Ain", "Local"): "AA Local",
    ("Al Ain", "Regional"): "AA Regional",
    ("Al Dhafra", "Local"): "DH Local",
    ("Al Dhafra", "Regional"): "DH Regional",
}

#: Manual route patches (reference :124-125).
ADL_PATCHES_REGION = {"ADL": "Abu Dhabi"}
ADL_PATCHES_SERVICE = {"ADL": "Link"}


def build(
    afc: DataFrame,
    line: DataFrame,
    servicetype: DataFrame,
    create_by: str = "Ejane",
) -> DataFrame:
    """afc(route, leg_id, start_time) × line(LINE_ABBR, OP_DEP_NO) ×
    servicetype(Route, Region, ServiceType) → daily service-type
    ridership rows."""
    daily = (
        afc.filter(F.col("route") != "-")
        .groupBy(F.to_date("start_time").alias("t_date"), "route")
        .agg(
            F.count("*").alias("trip_num"),
            count_if(F.col("leg_id") == 1).alias("leg1_num"),
        )
        .withColumn("transfer_num", F.col("trip_num") - F.col("leg1_num"))
    )
    # Reference dedups (LINE_ABBR, OP_DEP_NO) pairs (:104), which still
    # fans out daily rows when a LINE_ABBR maps to several departments —
    # and OP_DEP_NO is never used downstream. Engine policy (§4.4-6):
    # one deterministic row per LINE_ABBR (min OP_DEP_NO).
    line_sub = line.groupBy("LINE_ABBR").agg(F.min("OP_DEP_NO").alias("OP_DEP_NO"))
    svc = servicetype.select(
        F.col("Route").alias("__svc_route"), "Region", "ServiceType"
    )
    enriched = (
        daily.join(
            F.broadcast(line_sub),
            daily.route == line_sub.LINE_ABBR,
            "left",
        )
        .drop("LINE_ABBR")
        .join(F.broadcast(svc), F.col("route") == F.col("__svc_route"), "left")
        .drop("__svc_route")
        .withColumn("Region", patch_values("Region", "route", ADL_PATCHES_REGION))
        .withColumn(
            "ServiceType", patch_values("ServiceType", "route", ADL_PATCHES_SERVICE)
        )
        .withColumn(
            "service_type", pair_case("Region", "ServiceType", SERVICE_LABELS)
        )
    )
    summary = (
        enriched.groupBy("service_type", "Region", "t_date")
        .agg(
            F.sum("trip_num").alias("passenger_trips_num"),
            F.sum("leg1_num").alias("journey_num"),
            F.sum("transfer_num").alias("transfer_num"),
        )
        .select(
            "service_type",
            F.col("Region").alias("region_id"),
            F.date_format("t_date", "yyyy-MM-dd").alias("t_date"),
            F.lit("day").alias("date_type"),
            "passenger_trips_num",
            "journey_num",
            "transfer_num",
        )
    )
    return with_audit(summary, create_by=create_by, update_by=create_by)
