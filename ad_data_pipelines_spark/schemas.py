"""Declared StructTypes for the engine's table families.

Reference parity (SURVEY.md §1): the reference mixed inferred, declared
and positional schemas; the engine declares everything. Output-table
schemas follow the PostgreSQL DDL in the reference's
docs/ads_all_20250804.csv (varchar → StringType, numeric(p,s) → Decimal,
timestamp(6) without tz → TimestampNTZ-equivalent with UTC session TZ,
bigint counters → LongType). The AFC fact is the column superset across
all consumer scripts (FIXTURES.md F1).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: F1 AFC journey-leg fact — one row per passenger boarding.
#: (reference consumers: scripts/ads_passenger_travel_info_mi.py:20-21,
#: ads_route_…py:91, ads_stop_…py:36-62, ads_passenger_travel_time_di.R:120-173)
AFC_LEGS = StructType(
    [
        StructField("uid", StringType()),
        StructField("journey_id", StringType()),
        StructField("leg_id", ByteType()),
        StructField("start_time", TimestampType()),
        StructField("end_time", TimestampType()),
        StructField("route", StringType()),
        StructField("distance", FloatType()),  # metres
        StructField("tripdir", IntegerType()),
        StructField("start_station_no", StringType()),
        StructField("end_station_no", StringType()),
        StructField("boarding", IntegerType()),
        StructField("is_multi_leg_journey_leg", IntegerType()),
    ]
)

#: F2 VDV LINE dimension (scripts/ads_passenger_travel_info_mi.py:74-77;
#: full list dwd_bus_route_info_mf & other 2.R:237-254)
VDV_LINE = StructType(
    [
        StructField("BASE_VERSION", LongType()),
        StructField("LINE_NO", IntegerType()),
        StructField("LINE_ABBR", StringType()),
        StructField("OP_DEP_NO", IntegerType()),
        StructField("LINE_DESC", StringType()),
    ]
)

#: F3 VDV OPERATING_DEPARTMENT (scripts/ads_passenger_travel_info_mi.py:110-114)
VDV_OPERATING_DEPARTMENT = StructType(
    [
        StructField("OP_DEP_NO", IntegerType()),
        StructField("OP_DEP_ABBR", StringType()),
    ]
)

#: F7 VDV stop with DDDMMSSmmm coords
#: (dwd_bus_route_info_mf & other 2.R:80-94)
VDV_STOP = StructType(
    [
        StructField("BASE_VERSION", LongType()),
        StructField("POINT_NO", IntegerType()),
        StructField("POINT_TYPE", IntegerType()),
        StructField("POINT_LONGITUDE", LongType()),
        StructField("POINT_LATITUDE", LongType()),
        StructField("STOP_DESC", StringType()),
    ]
)

VDV_ROUTE_SEQUENCE = StructType(
    [
        StructField("BASE_VERSION", LongType()),
        StructField("LINE_NO", IntegerType()),
        StructField("ROUTE_ABBR", StringType()),
        StructField("ROUTE_NO", IntegerType()),
        StructField("SEQUENCE_NO", IntegerType()),
        StructField("POINT_NO", IntegerType()),
        StructField("POINT_TYPE", IntegerType()),
    ]
)

#: Standard audit-column quartet carried by every output table
#: (scripts/ads_passenger_travel_info_mi.py:462-465).
AUDIT_FIELDS = [
    StructField("create_by", StringType()),
    StructField("update_by", StringType()),
    StructField("create_time", TimestampType()),
    StructField("update_time", TimestampType()),
]


def with_audit(fields: list[StructField]) -> StructType:
    return StructType(fields + AUDIT_FIELDS)


#: ads_route_passenger_trips_di (reference scripts/ads_route_…py:107-118)
ADS_ROUTE_PASSENGER_TRIPS_DI = with_audit(
    [
        StructField("ope_date", DateType()),
        StructField("route_no", StringType()),
        StructField("direction", IntegerType()),
        StructField("passenger_trips", LongType()),
    ]
)

#: ads_stop_passenger_trips_di (reference scripts/ads_stop_…py:74-118)
ADS_STOP_PASSENGER_TRIPS_DI = with_audit(
    [
        StructField("ope_date", DateType()),
        StructField("station_no", StringType()),
        StructField("boarding_num", LongType()),
        StructField("alighting_num", LongType()),
        StructField("first_boarding_num", LongType()),
        StructField("last_alighting_num", LongType()),
        StructField("day_type", StringType()),
    ]
)

#: ads_passenger_transfer_count_di (reference ads_passenger_transfer_count_di.py:216-263)
ADS_PASSENGER_TRANSFER_COUNT_DI = with_audit(
    [
        StructField("ope_date", DateType()),
        StructField("region_id", StringType()),
        StructField("transfer_count", IntegerType()),
        StructField("journey_num", LongType()),
    ]
)

#: ads_passenger_travel_distance_di (reference ads_passenger_travel_distance_di.py:210-330)
ADS_PASSENGER_TRAVEL_DISTANCE_DI = with_audit(
    [
        StructField("ope_date", DateType()),
        StructField("region_id", StringType()),
        StructField("distance_range", StringType()),
        StructField("passenger_trips", LongType()),
    ]
)

#: ads_passenger_travel_time_di (reference ads_passenger_travel_time_di.R:15-26)
ADS_PASSENGER_TRAVEL_TIME_DI = with_audit(
    [
        StructField("ope_date", DateType()),
        StructField("time_range_type", StringType()),
        StructField("region_id", StringType()),
        StructField("passenger_trips", LongType()),
        StructField("journey_num", LongType()),
        StructField("transfer_num", LongType()),
    ]
)

#: ads_passenger_travel_info_mi (reference ads_passenger_travel_info_mi.py:407-516)
ADS_PASSENGER_TRAVEL_INFO_MI = with_audit(
    [
        StructField("ope_month", StringType()),
        StructField("region_id", StringType()),
        StructField("passenger_trips", LongType()),
        StructField("journey_num", LongType()),
        StructField("transfer_num", LongType()),
        StructField("travel_distance_km", DoubleType()),
        StructField("travel_time_minutes", DoubleType()),
        StructField("transfer_time_minutes", DoubleType()),
        StructField("unique_passengers", LongType()),
        StructField("avg_daily_trips_per_passenger", DoubleType()),
        StructField("avg_travel_time", DoubleType()),
        StructField("avg_travel_distance", DoubleType()),
        StructField("avg_transfer_time", DoubleType()),
    ]
)
