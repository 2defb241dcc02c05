"""ads_passenger_transfer_count_di — journeys by exact transfer count per
day and region.

Reference: scripts/ads_passenger_transfer_count_di.py. The core trick
(:216-244): with leg histogram h(k) = #legs with leg_id==k per (date,
region), the number of journeys with exactly k transfers is
h(k+1) − h(k+2) (a journey with n legs contributes to h(1..n)); legs ≥6
are floored into the 6+ bucket; negative differences (data
inconsistency) are dropped (SURVEY.md §4.4-7). 'overall' region rollup
per A9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators.agg import rollup_overall
from ad_data_pipelines_spark.plans.transit_common import enrich_with_region, with_audit

MAX_LEG = 6  # reference floor: max(6, …) scripts/ads_passenger_transfer_count_di.py:219


def build(afc: DataFrame, line: DataFrame, opdep: DataFrame) -> DataFrame:
    enriched = enrich_with_region(afc, line, opdep)
    legs = enriched.select(
        F.to_date("start_time").alias("ope_date"),
        "region_id",
        F.least(F.col("leg_id").cast("int"), F.lit(MAX_LEG)).alias("leg"),
    )
    # histogram with the 'overall' grain produced in the same shuffle
    hist = rollup_overall(
        legs,
        ["ope_date", "leg"],
        "region_id",
        [F.count("*").alias("cnt")],
    )
    w = Window.partitionBy("ope_date", "region_id").orderBy("leg")
    nxt = F.coalesce(F.lead("cnt").over(w), F.lit(0))
    out = (
        hist.withColumn(
            "journey_num",
            F.when(F.col("leg") == MAX_LEG, F.col("cnt")).otherwise(
                F.col("cnt") - nxt
            ),
        )
        .filter(F.col("journey_num") >= 0)
        .select(
            "ope_date",
            "region_id",
            (F.col("leg") - 1).alias("transfer_count"),
            "journey_num",
        )
    )
    return with_audit(out)
