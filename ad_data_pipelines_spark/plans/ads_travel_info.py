"""ads_passenger_travel_info_mi — the monthly passenger KPI table (the
reference's hardest pipeline).

Reference: scripts/ads_passenger_travel_info_mi.py (chunked
partial-aggregation architecture traced in SURVEY.md §3.1). The Spark
restatement is one declarative DAG:

  scan → broadcast enrich (J1,J2) → transfer-time window (W1,W3) →
  daily agg (with distinct users) → monthly agg + avg-of-daily-ratios
  (A11) → guarded averages (A12) → 'overall' rollup (A9, same shuffle
  via grouping sets).

Catalyst supplies the partial/final aggregation the reference
hand-rolled with dict accumulators + HLL sketches (:244-344); journeys
spanning chunk boundaries are handled correctly by construction
(SURVEY.md §4.4-3).

`exact_distinct=True` (default) uses count(distinct uid) for
oracle-comparable output. `exact_distinct=False` is the production
path and matches the reference's HyperLogLog(0.01) sketches
(:244-344) structurally, not just numerically: the daily
grouping-sets pass carries a MERGEABLE DataSketches HLL of uids
(`hll_sketch_agg`, lg_k=14 ≈ 0.8% rsd) as just another aggregate
column, daily `users` reads it via `hll_sketch_estimate`, and the
monthly `unique_passengers` is `hll_union_agg` over the (tiny) daily
rows — sketch algebra, ZERO re-scan of the legs. The exact path
scans legs twice (daily measures + monthly distinct); the sketch
path scans once, which at 100 TB is the whole point — and the same
daily sketch table is the artifact `sketch.hll_shard_table` /
`hll_union_estimate` persist for any-grain rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions import clamp_outliers, minutes_between, month_str
from ad_data_pipelines_spark.operators.agg import count_if, guarded_ratio
from ad_data_pipelines_spark.plans.transit_common import enrich_with_region, with_audit


def build(
    afc: DataFrame,
    line: DataFrame,
    opdep: DataFrame,
    exact_distinct: bool = True,
    hll_lg_k: int = 14,
) -> DataFrame:
    enriched = enrich_with_region(afc, line, opdep).filter(
        F.col("region_id") != "Unknown"
    )

    w = Window.partitionBy("uid", "journey_id").orderBy("leg_id")
    legs = (
        enriched.withColumn("ope_date", F.to_date("start_time"))
        .withColumn("month", month_str("start_time"))
        .withColumn("distance_km", F.col("distance") / 1000.0)
        .withColumn("travel_min", minutes_between("end_time", "start_time"))
        .withColumn("next_start", F.lead("start_time").over(w))
        .withColumn(
            "transfer_min",
            F.when(
                F.col("next_start").isNull(), F.lit(0.0)  # last leg → 0 (W3)
            ).otherwise(
                clamp_outliers(
                    minutes_between(F.col("next_start"), F.col("end_time")), 0, 240
                )
            ),
        )
    )

    def measures() -> list[Column]:
        return [
            F.count("*").alias("passenger_trips"),
            count_if(F.col("leg_id") == 1).alias("journey_num"),
            count_if(F.col("leg_id") != 1).alias("transfer_num"),
            F.sum("distance_km").alias("travel_distance_km"),
            F.sum("travel_min").alias("travel_time_minutes"),
            F.sum("transfer_min").alias("transfer_time_minutes"),
        ]

    # ---- daily grain (both per-region and overall, one shuffle) ----
    daily_sets = [("month", "ope_date", "region_id"), ("month", "ope_date")]
    if exact_distinct:
        daily = legs.groupingSets(
            daily_sets, "month", "ope_date", "region_id"
        ).agg(*measures(), F.countDistinct("uid").alias("users"))
    else:
        # production path: the distinct-user STATE travels as a
        # mergeable HLL sketch column through the same aggregate —
        # daily users is its point estimate, and every coarser grain
        # below is sketch union, never a re-scan
        daily = (
            legs.groupingSets(daily_sets, "month", "ope_date", "region_id")
            .agg(
                *measures(),
                F.hll_sketch_agg(
                    F.col("uid").cast("string"), F.lit(hll_lg_k)
                ).alias("__uid_hll"),
            )
            .withColumn("users", F.hll_sketch_estimate("__uid_hll"))
        )
    daily = daily.withColumn(
        "region_id", F.coalesce("region_id", F.lit("overall"))
    ).withColumn(
        "daily_ratio",
        F.when(F.col("users") > 0, F.col("passenger_trips") / F.col("users")).otherwise(
            F.lit(0.0)
        ),
    )

    # ---- monthly uniques: exact mode re-scans legs (a distinct can't
    # be re-aggregated from daily counts); sketch mode unions the daily
    # sketches — the rollup the reference rebuilt per grain, done here
    # as algebra over rows already in hand ----
    if exact_distinct:
        monthly_users = (
            legs.groupingSets(
                [("month", "region_id"), ("month",)], "month", "region_id"
            )
            .agg(F.countDistinct("uid").alias("unique_passengers"))
            .withColumn(
                "region_id", F.coalesce("region_id", F.lit("overall"))
            )
        )
    else:
        monthly_users = daily.groupBy("month", "region_id").agg(
            F.hll_sketch_estimate(F.hll_union_agg("__uid_hll")).alias(
                "unique_passengers"
            )
        )

    monthly = daily.groupBy("month", "region_id").agg(
        F.sum("passenger_trips").alias("passenger_trips"),
        F.sum("journey_num").alias("journey_num"),
        F.sum("transfer_num").alias("transfer_num"),
        F.round(F.sum("travel_distance_km"), 4).alias("travel_distance_km"),
        F.round(F.sum("travel_time_minutes"), 4).alias("travel_time_minutes"),
        F.round(F.sum("transfer_time_minutes"), 4).alias("transfer_time_minutes"),
        # A11: Σ(daily trips/users) ÷ calendar days of the month
        F.round(
            F.sum("daily_ratio")
            / F.dayofmonth(F.last_day(F.min("ope_date"))),
            6,
        ).alias("avg_daily_trips_per_passenger"),
    )

    out = monthly.join(F.broadcast(monthly_users), ["month", "region_id"], "left")

    # A12 zero-guarded averages (reference :442-445, :492-495)
    out = out.select(
        F.col("month").alias("ope_month"),
        "region_id",
        "passenger_trips",
        "journey_num",
        "transfer_num",
        "travel_distance_km",
        "travel_time_minutes",
        "transfer_time_minutes",
        "unique_passengers",
        "avg_daily_trips_per_passenger",
        F.round(
            guarded_ratio(F.col("travel_time_minutes"), F.col("passenger_trips")), 6
        ).alias("avg_travel_time"),
        F.round(
            guarded_ratio(F.col("travel_distance_km"), F.col("passenger_trips")), 6
        ).alias("avg_travel_distance"),
        F.round(
            guarded_ratio(F.col("transfer_time_minutes"), F.col("transfer_num")), 6
        ).alias("avg_transfer_time"),
    )
    return with_audit(out)
