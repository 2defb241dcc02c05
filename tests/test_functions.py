"""Unit tests for the column-expression library against hand-computed
expectations (the reference's row-UDF semantics, SURVEY.md §2.2/§2.7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions import (
    deep_clean,
    days_in_month,
    minutes_between,
    nullify_na_strings,
    prefix_map,
    quarter_month_part,
    right_closed_bins,
    threshold_bins,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_deep_clean(spark):
    df = spark.createDataFrame(
        [(" ab-12 x ",), ("A.B c",), ("",), (None,)], ["s"]
    )
    out = [r.v for r in df.select(deep_clean("s").alias("v")).collect()]
    assert out == ["AB12X", "ABC", "", None]


def test_prefix_map(spark):
    df = spark.createDataFrame([("ADX",), ("ERQ",), ("zz",), (None,)], ["s"])
    m = prefix_map("s", {"AD": "Abu Dhabi", "ER": "Al Ain"})
    out = [r.v for r in df.select(m.alias("v")).collect()]
    assert out == ["Abu Dhabi", "Al Ain", "Unknown", "Unknown"]


def test_nullify_na_strings(spark):
    df = spark.createDataFrame([("N/A",), (" NA ",), ("ok",)], ["s"])
    out = [r.v for r in df.select(nullify_na_strings("s").alias("v")).collect()]
    assert out == [None, None, "ok"]


def test_right_closed_bins_boundaries(spark):
    """pd.cut parity: right-closed, include-lowest (reference P15)."""
    df = spark.createDataFrame([(0.0,), (5.0,), (5.1,), (20.0,), (25.0,)], ["d"])
    b = right_closed_bins(
        "d", [0, 5, 10, 15, 20, float("inf")],
        ["0-5", "5-10", "10-15", "15-20", "20+"],
    )
    out = [r.v for r in df.select(b.alias("v")).collect()]
    assert out == ["0-5", "0-5", "5-10", "15-20", "20+"]


def test_threshold_bins(spark):
    df = spark.createDataFrame([(5.0,), (10.0,), (130.0,)], ["m"])
    b = threshold_bins("m", [10, 20, 120], ["<=10", "<=20", "<=120", ">120"])
    out = [r.v for r in df.select(b.alias("v")).collect()]
    assert out == ["<=10", "<=10", ">120"]


def test_minutes_between_subsecond(spark):
    df = spark.sql(
        "SELECT timestamp'2025-01-01 00:00:00' AS s, "
        "timestamp'2025-01-01 00:01:30.500' AS e"
    )
    v = df.select(minutes_between("e", "s").alias("v")).first().v
    assert v == pytest.approx(1.5083333, abs=1e-6)


def test_days_in_month_leap(spark):
    df = spark.sql("SELECT date'2024-02-05' AS d UNION ALL SELECT date'2025-02-05'")
    out = sorted(r.v for r in df.select(days_in_month("d").alias("v")).collect())
    assert out == [28, 29]


def test_quarter_month_part_boundaries(spark):
    df = spark.sql(
        "SELECT explode(sequence(date'2025-03-01', date'2025-03-31')) AS d"
    )
    out = df.select(F.dayofmonth("d").alias("day"), quarter_month_part("d").alias("p"))
    rows = {r.day: r.p for r in out.collect()}
    assert rows[1] == 1 and rows[7] == 1 and rows[8] == 2
    assert rows[14] == 2 and rows[15] == 3 and rows[21] == 3
    assert rows[22] == 4 and rows[31] == 4
