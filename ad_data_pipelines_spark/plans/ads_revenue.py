"""ads_csc_sales_revenue_region_mi / ads_fare_revenue_region_mi —
monthly sales & revenue by region with contactless (CSC) breakdown.

Reference: scripts/ads_csc_sales_revenue_region_mi.R:26-42 and
ads_fare_revenue_region_mi.R:119-124: per (month, region) sums of
quantity/amount with a conditional sum over `grepl('CSC', PRODUCT)`
(P21 + A4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators.agg import sum_if
from ad_data_pipelines_spark.plans.transit_common import with_audit


def build(sales: DataFrame) -> DataFrame:
    is_csc = F.col("PRODUCT").contains("CSC")
    out = sales.groupBy(
        F.col("V_MONTH").alias("ope_month"), F.col("REGION").alias("region_id")
    ).agg(
        F.sum("QTY").alias("tickets_num"),
        F.round(F.sum("AMOUNT"), 2).alias("revenue"),
        sum_if(is_csc, F.col("QTY")).alias("contactless_smart_tickets_num"),
        F.round(sum_if(is_csc, F.col("AMOUNT")), 2).alias("contactless_revenue"),
    )
    return with_audit(out)
