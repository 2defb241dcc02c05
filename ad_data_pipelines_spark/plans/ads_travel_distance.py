"""ads_passenger_travel_distance_di — passenger trips by distance band
per day and region.

Reference: scripts/ads_passenger_travel_distance_di.py. Two reference
defects fixed by design (SURVEY.md §4.4-2, §2.1 S13):
  * per-chunk group emission (same key appended once per 500k-row chunk,
    :322-330) → ONE global groupBy here;
  * the SQLite first-creation-time store (:9-52) → a join against the
    previous output snapshot (`merge_first_seen` in
    sources/firstseen.py) — no side database.
Bins are pd.cut right-closed with include-lowest (:210-220).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions import right_closed_bins
from ad_data_pipelines_spark.operators.agg import rollup_overall
from ad_data_pipelines_spark.plans.transit_common import enrich_with_region, with_audit

DIST_EDGES = [0, 5, 10, 15, 20, float("inf")]
DIST_LABELS = ["0-5km", "5-10km", "10-15km", "15-20km", "20km+"]


def build(afc: DataFrame, line: DataFrame, opdep: DataFrame) -> DataFrame:
    enriched = enrich_with_region(afc, line, opdep)
    binned = enriched.select(
        F.to_date("start_time").alias("ope_date"),
        "region_id",
        right_closed_bins(F.col("distance") / 1000.0, DIST_EDGES, DIST_LABELS).alias(
            "distance_range"
        ),
    )
    out = rollup_overall(
        binned,
        ["ope_date", "distance_range"],
        "region_id",
        [F.count("*").alias("passenger_trips")],
    )
    return with_audit(
        out.select("ope_date", "region_id", "distance_range", "passenger_trips")
    )
