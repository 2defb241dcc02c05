"""Deterministic transit fixtures per FIXTURES.md F1-F7: small enough to
hand-verify, covering the reference's edge cases (sentinel '-' stations,
case/punct route variants, negative durations, >240min transfers, journeys
spanning midnight, duplicate LINE_ABBR, negative OP_DEP_NO)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession

from ad_data_pipelines_spark.schemas import (
    AFC_LEGS,
    VDV_LINE,
    VDV_OPERATING_DEPARTMENT,
)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def afc_legs(spark: SparkSession):
    rows = [
        # uid, journey, leg, start, end, route, dist_m, dir, s_st, e_st, boarding, multi
        # u1 j1: clean 2-leg journey on route A1 (region AD), 10min transfer
        ("u1", "j1", 1, ts("2025-01-05 08:00:00"), ts("2025-01-05 08:30:00"), "A1", 5000.0, 1, "101", "102", 1, 1),
        ("u1", "j1", 2, ts("2025-01-05 08:40:00"), ts("2025-01-05 09:00:00"), "a-1", 3000.0, 2, "102", "103", 1, 1),
        # u1 j2: single-leg, same day, route B2 (region ER)
        ("u1", "j2", 1, ts("2025-01-05 18:00:00"), ts("2025-01-05 18:20:00"), "B2", 12000.0, 1, "103", "101", 1, 0),
        # u2 j3: 3-leg journey w/ >240min gap (clamped) and negative duration leg
        ("u2", "j3", 1, ts("2025-01-05 09:00:00"), ts("2025-01-05 09:30:00"), "A1", 4000.0, 1, "101", "104", 1, 1),
        ("u2", "j3", 2, ts("2025-01-05 14:00:00"), ts("2025-01-05 13:50:00"), "B2", 2000.0, 1, "104", "105", 1, 1),
        ("u2", "j3", 3, ts("2025-01-05 14:30:00"), ts("2025-01-05 15:00:00"), "C9", 8000.0, 2, "105", "-", 1, 1),
        # u3 j4: unmatched route (region Unknown), '-' start station
        ("u3", "j4", 1, ts("2025-01-06 07:00:00"), ts("2025-01-06 07:45:00"), "ZZ", 22000.0, 1, "-", "106", 1, 0),
        # u2 j5: next day single leg, boundary day 08 (quarter-month edge)
        ("u2", "j5", 1, ts("2025-01-08 10:00:00"), ts("2025-01-08 10:15:00"), "A1", 1500.0, 2, "106", "101", 1, 0),
        # u4 j6: journey spanning midnight (legs on different dates)
        ("u4", "j6", 1, ts("2025-01-31 23:30:00"), ts("2025-01-31 23:55:00"), "B2", 6000.0, 1, "101", "102", 1, 1),
        ("u4", "j6", 2, ts("2025-02-01 00:05:00"), ts("2025-02-01 00:25:00"), "B2", 7000.0, 1, "102", "103", 1, 1),
    ]
    return spark.createDataFrame(rows, AFC_LEGS)


def vdv_line(spark: SparkSession):
    rows = [
        # BASE_VERSION, LINE_NO, LINE_ABBR (joins deep_clean(route)), OP_DEP_NO, DESC
        (1, 10, "A1", 11, "Route A1"),
        (1, 10, "A1", 99, "Route A1 dup"),  # duplicate LINE_ABBR → keep-first
        (1, 20, "B2", 22, "Route B2"),
        (1, 30, "C9", -33, "Route C9"),  # negative OP_DEP_NO (abs for region)
    ]
    return spark.createDataFrame(rows, VDV_LINE)


def vdv_operating_department(spark: SparkSession):
    rows = [
        (11, "AD-City"),   # prefix AD → Abu Dhabi
        (22, "ER-East"),   # prefix ER → Al Ain
        (-33, "WR-West"),  # prefix WR → Al Dhafra
        (99, "XX-Other"),  # unknown prefix → Unknown
    ]
    return spark.createDataFrame(rows, VDV_OPERATING_DEPARTMENT)


def avm_day_types(spark: SparkSession):
    rows = [
        (dt.date(2025, 1, 5), "weekend"),
        (dt.date(2025, 1, 5), "weekend-dup"),  # duplicate date → dedup keeps one
        (dt.date(2025, 1, 6), "weekday"),
        (dt.date(2025, 1, 8), "weekday"),
    ]
    return spark.createDataFrame(rows, "OPD_DATE date, DAY_TYPE string")


def sales(spark: SparkSession):
    rows = [
        ("202501", "CSC Card", 10, 100.0, "Abu Dhabi"),
        ("202501", "Paper Ticket", 5, 25.0, "Abu Dhabi"),
        ("202501", "CSC Topup", 2, 50.0, "Al Ain"),
        ("202502", "Paper Ticket", 7, 35.0, "Al Ain"),
    ]
    return spark.createDataFrame(
        rows, "V_MONTH string, PRODUCT string, QTY int, AMOUNT double, REGION string"
    )


def service_types(spark: SparkSession):
    """Excel service-type lookup (S8): Route → (Region, Service Type).
    ADL deliberately wrong/missing so the manual patch (P11) must fix it."""
    rows = [
        ("A1", "Abu Dhabi", "Local"),
        ("B2", "Al Ain", "Regional"),
        ("C9", "Al Dhafra", "Local"),
        ("ADL", None, None),  # patched to (Abu Dhabi, Link)
    ]
    return spark.createDataFrame(
        rows, "Route string, Region string, ServiceType string"
    )


def route_sequence(spark: SparkSession):
    from ad_data_pipelines_spark.schemas import VDV_ROUTE_SEQUENCE

    rows = [
        # BASE_VERSION, LINE_NO, ROUTE_ABBR, ROUTE_NO, SEQUENCE_NO, POINT_NO, POINT_TYPE
        (1, 10, "A1-OUT", 1, 1, 101, 1),
        (1, 10, "A1-OUT", 1, 2, 102, 1),
        (1, 10, "A1-OUT", 1, 3, 103, 1),
        (1, 20, "B2-OUT", 1, 1, 103, 1),
        (1, 20, "B2-OUT", 1, 2, 101, 1),
    ]
    return spark.createDataFrame(rows, VDV_ROUTE_SEQUENCE)


def routes_dim(spark: SparkSession):
    rows = [(10, 1, "OUTBOUND"), (20, 1, "OUTBOUND")]
    return spark.createDataFrame(
        rows, "LINE_NO int, ROUTE_NO int, DIRECTION string"
    )


def vdv_stops(spark: SparkSession):
    from ad_data_pipelines_spark.schemas import VDV_STOP

    rows = [
        # DDDMMSSmmm coords: 543000000 = 54.5°E, 243000000 = 24.5°N
        (1, 101, 1, 543000000, 243000000, "Central"),     # inside 'west' square
        (1, 102, 1, 550000000, 240000000, "Mid"),          # 55.0, 24.0 'east'
        (1, 103, 1, 560000000, 250000000, "Far"),          # 56.0, 25.0 outside
    ]
    return spark.createDataFrame(rows, VDV_STOP)


#: Two square test regions (lon, lat rings).
TEST_POLYGONS = {
    "west": [(54.0, 24.2), (54.8, 24.2), (54.8, 24.8), (54.0, 24.8)],
    "east": [(54.8, 23.8), (55.5, 23.8), (55.5, 24.4), (54.8, 24.4)],
}


REGION_PREFIXES = {"AD": "Abu Dhabi", "ER": "Al Ain", "WR": "Al Dhafra"}
