"""Volume smoke for the transit pipelines: the fixture tests prove exact
semantics on 10 rows; this file proves the same plans run end-to-end on
~60k derived legs (sf0.01 events reshaped into AFC form) with sane
physical plans — no Python eval, broadcast joins for dims, non-empty
output at every grain.
"""

from __future__ import annotations

import pytest

from ad_data_pipelines_spark.plans import testdata_queries as tq
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_MEDIUM


@pytest.fixture(scope="module")
def afc_volume(spark):
    """events → AFC legs via the shared adapter
    (transit_common.afc_legs_from_events — bench.py times the same
    derivation): user sessions become journeys (30-min gap), events
    become legs, event ids map onto a small route set."""
    from ad_data_pipelines_spark.plans.transit_common import (
        afc_legs_from_events,
    )

    legs = afc_legs_from_events(tq.t(spark, SF_MEDIUM, "events"))
    legs = legs.cache()
    legs.count()
    return legs


@pytest.fixture(scope="module")
def line_dim(spark):
    from ad_data_pipelines_spark.schemas import VDV_LINE

    rows = [(1, 10 + i, f"R{i}", 11 if i < 2 else 22, f"Route {i}") for i in range(4)]
    return spark.createDataFrame(rows, VDV_LINE)


@pytest.fixture(scope="module")
def opdep_dim(spark):
    from ad_data_pipelines_spark.schemas import VDV_OPERATING_DEPARTMENT

    return spark.createDataFrame([(11, "AD-X"), (22, "ER-Y")], VDV_OPERATING_DEPARTMENT)


def _no_python_eval(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    return plan


def test_travel_info_volume(afc_volume, line_dim, opdep_dim):
    from ad_data_pipelines_spark.plans import ads_travel_info

    out = ads_travel_info.build(afc_volume, line_dim, opdep_dim)
    plan = _no_python_eval(out)
    assert "BroadcastHashJoin" in plan
    rows = out.collect()
    assert len(rows) > 0
    months = {r.ope_month for r in rows}
    assert len(months) >= 1
    # overall rollup present and consistent at month grain
    assert any(r.region_id == "overall" for r in rows)


def test_travel_time_volume(afc_volume, line_dim):
    from ad_data_pipelines_spark.plans import ads_travel_time

    out = ads_travel_time.build(afc_volume, line_dim)
    _no_python_eval(out)
    rows = out.collect()
    assert len(rows) > 0
    assert any(r.region_id == "Overall" for r in rows)


def test_transfer_count_volume(afc_volume, line_dim, opdep_dim):
    from ad_data_pipelines_spark.plans import ads_transfer_count

    out = ads_transfer_count.build(afc_volume, line_dim, opdep_dim)
    _no_python_eval(out)
    rows = out.collect()
    assert len(rows) > 0
    # transfer-count identity: non-negative counts everywhere
    assert all(r.journey_num >= 0 for r in rows)
    assert all(r.transfer_count >= 0 for r in rows)


def test_ridership_volume(afc_volume, line_dim, spark):
    from ad_data_pipelines_spark.plans import ads_ridership

    svc = spark.createDataFrame(
        [("R0", "Abu Dhabi", "Local"), ("R1", "Abu Dhabi", "Regional"),
         ("R2", "Al Ain", "Local"), ("R3", "Al Dhafra", "Regional")],
        "Route string, Region string, ServiceType string",
    )
    out = ads_ridership.build(afc_volume, line_dim, svc)
    _no_python_eval(out)
    rows = out.collect()
    assert len(rows) > 0
    # conservation: passenger trips == journeys + transfers per row
    for r in rows:
        assert r.passenger_trips_num == r.journey_num + r.transfer_num


def test_revenue_volume(spark):
    """events → sales via the shared adapter (transit_common.
    sales_from_events — bench.py times the same derivation), then the
    revenue pipeline at ~60k rows: ticket/revenue conservation against
    a direct aggregate of the adapter output."""
    from ad_data_pipelines_spark.plans import ads_revenue
    from ad_data_pipelines_spark.plans.transit_common import (
        sales_from_events,
    )

    sales = sales_from_events(tq.t(spark, SF_MEDIUM, "events"))
    out = ads_revenue.build(sales)
    _no_python_eval(out)
    rows = out.collect()
    assert len(rows) > 0
    total_tickets = sum(r.tickets_num for r in rows)
    total_contactless = sum(r.contactless_smart_tickets_num for r in rows)
    n_sales, n_csc = sales.agg(
        F.count("*"),
        F.sum(F.when(F.col("PRODUCT").contains("CSC"), 1).otherwise(0)),
    ).first()
    assert total_tickets == n_sales
    assert total_contactless == n_csc
    # month x region grain: keys unique
    assert len({(r.ope_month, r.region_id) for r in rows}) == len(rows)


def test_stop_trips_route_trips_distance_dwd_volume(spark, afc_volume,
                                                    line_dim, opdep_dim):
    """The remaining benched pipelines run end-to-end at volume with
    sane plans: stop_trips (day-type calendar dim), route_trips,
    travel_distance, and the dwd_bus_route DAG over generated VDV
    dims (the same shapes bench.py times)."""
    from ad_data_pipelines_spark.plans import (
        ads_route_trips,
        ads_stop_trips,
        ads_travel_distance,
        dwd_bus_route,
    )
    from ad_data_pipelines_spark.schemas import VDV_ROUTE_SEQUENCE, VDV_STOP

    avm = spark.sql(
        "SELECT d AS OPD_DATE, CASE WHEN weekday(d) >= 5 THEN 'weekend' "
        "ELSE 'weekday' END AS DAY_TYPE FROM (SELECT "
        "explode(sequence(DATE'2020-01-01', DATE'2029-12-31')) AS d)"
    )
    st = ads_stop_trips.build(afc_volume, avm)
    _no_python_eval(st)
    assert st.count() > 0

    rt = ads_route_trips.build(afc_volume)
    _no_python_eval(rt)
    assert rt.count() > 0

    td = ads_travel_distance.build(afc_volume, line_dim, opdep_dim)
    _no_python_eval(td)
    assert td.count() > 0

    route_seq = spark.range(200 * 30).selectExpr(
        "CAST(1 AS bigint) AS BASE_VERSION",
        "CAST(id DIV 30 AS int) AS LINE_NO",
        "concat('L', id DIV 30, '-OUT') AS ROUTE_ABBR",
        "CAST(1 AS int) AS ROUTE_NO",
        "CAST(id % 30 + 1 AS int) AS SEQUENCE_NO",
        "CAST((id * 37) % 2000 AS int) AS POINT_NO",
        "CAST(1 AS int) AS POINT_TYPE",
    ).to(VDV_ROUTE_SEQUENCE)
    routes = spark.range(200).selectExpr(
        "CAST(id AS int) AS LINE_NO",
        "CAST(1 AS int) AS ROUTE_NO",
        "'OUTBOUND' AS DIRECTION",
    )
    # DDMMSSmmm lattice: whole arc-minutes, lon 54.0-54.783, lat
    # 24.0-24.317; polygon edges deliberately OFF the minute lattice
    # so no point sits on a boundary (ray-cast edge cases)
    stops = spark.range(2000).selectExpr(
        "CAST(1 AS bigint) AS BASE_VERSION",
        "CAST(id AS int) AS POINT_NO",
        "CAST(1 AS int) AS POINT_TYPE",
        "CAST(540000000 + (id % 48) * 100000 AS bigint) AS POINT_LONGITUDE",
        "CAST(240000000 + (id DIV 100) * 100000 AS bigint) AS POINT_LATITUDE",
        "concat('Stop ', id) AS STOP_DESC",
    ).to(VDV_STOP)
    polygons = {
        "west": [(53.95, 23.95), (54.405, 23.95), (54.405, 24.95),
                 (53.95, 24.95)],
        "east": [(54.405, 23.95), (54.95, 23.95), (54.95, 24.95),
                 (54.405, 24.95)],
    }
    rsi = dwd_bus_route.build_route_stop_info(route_seq, routes)
    _no_python_eval(rsi)
    assert rsi.count() == 200 * 30
    si = dwd_bus_route.build_stop_info(stops, polygons)
    _no_python_eval(si)
    assert si.count() == 2000
    # every generated stop falls in one of the two squares
    assert si.filter(F.col("region_id") == "Unknown").count() == 0
    ri = dwd_bus_route.build_route_info(route_seq, stops)
    _no_python_eval(ri)
    assert ri.count() == 200
