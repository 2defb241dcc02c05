"""dwd_bus_route_info_mf + dwd_bus_route_stop_info_mf + dwd_bus_stop_info_mf
— the DWD/geometry layer.

Reference: scripts/dwd_bus_route_info_mf & other 2.R. Key operators:
  * next-stop LEAD over route sequence (W5, :160-165),
  * first/last stop per route via ordered first/last (A13, :185-192),
  * composite-key link joins (J9/J10, :97-125, :174-181),
  * DDDMMSSmmm → decimal coords (P20, :32-51),
  * ordered geometry assembly → WKT (A14, :109-119, :259),
  * route length = Σ link distance (:174-181),
  * stop→region point-in-polygon labeling (J12, :338-340) — see
    operators/geo.py:label_by_polygons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions.geo import dddmmss_to_decimal
from ad_data_pipelines_spark.operators.geo import linestring_wkt
from ad_data_pipelines_spark.plans.transit_common import with_audit


def route_stop_sequence(route_seq: DataFrame) -> DataFrame:
    """Per (line, route): ordered stops with next-stop lead (W5)."""
    w = Window.partitionBy("LINE_NO", "ROUTE_ABBR").orderBy("SEQUENCE_NO")
    return (
        route_seq.withColumn("TO_POINT_NO", F.lead("POINT_NO").over(w))
        .withColumn("TO_POINT_TYPE", F.lead("POINT_TYPE").over(w))
    )


def route_endpoints(route_seq: DataFrame) -> DataFrame:
    """First/last stop per route without a sort (A13: min_by/max_by)."""
    return route_seq.groupBy("LINE_NO", "ROUTE_ABBR").agg(
        F.min_by("POINT_NO", "SEQUENCE_NO").alias("first_stop_no"),
        F.max_by("POINT_NO", "SEQUENCE_NO").alias("last_stop_no"),
        F.count("*").alias("stop_count"),
    )


def stops_decimal(stop: DataFrame) -> DataFrame:
    """VDV stop table with decimal-degree coordinates (P20)."""
    return stop.select(
        "BASE_VERSION",
        "POINT_NO",
        "POINT_TYPE",
        dddmmss_to_decimal("POINT_LONGITUDE").alias("lon"),
        dddmmss_to_decimal("POINT_LATITUDE").alias("lat"),
        "STOP_DESC",
    )


def route_geometry(route_seq: DataFrame, stop: DataFrame) -> DataFrame:
    """Route polyline WKT + endpoints + stop count.

    route_sequence ⋈ stops (broadcast dim) → ordered WKT assembly (A14).
    """
    stops = stops_decimal(stop).select("POINT_NO", "POINT_TYPE", "lon", "lat")
    seq = route_seq.join(F.broadcast(stops), ["POINT_NO", "POINT_TYPE"], "left")
    geom = linestring_wkt(
        seq, ["LINE_NO", "ROUTE_ABBR"], "SEQUENCE_NO", "lon", "lat"
    )
    ends = route_endpoints(route_seq)
    return geom.join(ends, ["LINE_NO", "ROUTE_ABBR"])


def build_route_stop_info(
    route_seq: DataFrame,
    routes: DataFrame,
    create_by: str = "system",
) -> DataFrame:
    """dwd_bus_route_stop_info_mf: one row per (line, route, stop_index)
    with travel direction from the routes dim.

    Reference: scripts/dwd_bus_route_info_mf & other 2.R:287-313 —
    select/rename route_sequence + left join routes + output ordering.
    The reference joins its renamed route_no (= ROUTE_ABBR) against the
    routes dim's numeric ROUTE_NO, which only resolves when abbrs are
    numeric strings; route_sequence carries an explicit ROUTE_NO, so we
    join on that unambiguous key instead (documented divergence).
    Broadcast join (routes is KB-sized); the orderBy is a presentation
    sort on the final output, not a shuffle of the fact path.
    """
    lkp = routes.select(
        F.col("LINE_NO").alias("line_no"),
        F.col("ROUTE_NO").alias("__route_key"),
        F.col("DIRECTION").alias("direction"),
    ).distinct()
    out = (
        route_seq.select(
            F.col("ROUTE_ABBR").alias("route_no"),
            F.col("ROUTE_NO").alias("__route_key"),
            F.col("BASE_VERSION").alias("version"),
            F.col("POINT_NO").alias("stop_no"),
            F.col("SEQUENCE_NO").alias("stop_index"),
            F.col("LINE_NO").alias("line_no"),
        )
        .join(F.broadcast(lkp), ["line_no", "__route_key"], "left")
        .drop("__route_key")
    )
    return with_audit(out, create_by, create_by).orderBy(
        "line_no", "route_no", "stop_index"
    )


def build_stop_info(
    stop: DataFrame,
    polygons: dict,
    create_by: str = "system",
) -> DataFrame:
    """dwd_bus_stop_info_mf: stops with decimal WGS84 coords, POINT WKT
    geometry and point-in-polygon region label.

    Reference: scripts/dwd_bus_route_info_mf & other 2.R:326-355 —
    st_join(stops, regions, st_within) + st_as_text(geometry). Here the
    spatial join is the ray-cast when()-chain over broadcast polygon
    literals (operators/geo.py:label_by_polygons) — a narrow map, no
    shuffle at any corpus size; attribute columns the reference fills
    with NA (is_afc, bay_size, …) are left to the writer's schema
    alignment.
    """
    from ad_data_pipelines_spark.operators.geo import label_by_polygons

    stops = stops_decimal(stop).select(
        F.col("BASE_VERSION").alias("version"),
        F.col("POINT_NO").cast("string").alias("stop_no"),
        F.col("STOP_DESC").alias("stop_name"),
        F.round("lon", 6).alias("longitude"),
        F.round("lat", 6).alias("latitude"),
    )
    labeled = label_by_polygons(stops, "longitude", "latitude", polygons)
    out = labeled.withColumn(
        "geom",
        F.concat(
            F.lit("POINT ("),
            F.col("longitude").cast("string"),
            F.lit(" "),
            F.col("latitude").cast("string"),
            F.lit(")"),
        ),
    )
    return with_audit(out, create_by, create_by)


def build_route_info(
    route_seq: DataFrame,
    stop: DataFrame,
    link: DataFrame | None = None,
) -> DataFrame:
    """dwd_bus_route_info_mf: geometry + endpoints (+ length when link
    distances are available: Σ LINK_DISTANCE over consecutive stop pairs,
    J10 composite-key join)."""
    out = route_geometry(route_seq, stop)
    if link is not None:
        seq = route_stop_sequence(route_seq).filter(F.col("TO_POINT_NO").isNotNull())
        lk = link.select(
            "POINT_NO", "TO_POINT_NO", "POINT_TYPE", "TO_POINT_TYPE", "LINK_DISTANCE"
        )
        length = (
            seq.join(
                F.broadcast(lk),
                ["POINT_NO", "TO_POINT_NO", "POINT_TYPE", "TO_POINT_TYPE"],
                "left",
            )
            .groupBy("LINE_NO", "ROUTE_ABBR")
            .agg(F.round(F.sum("LINK_DISTANCE") / 1000.0, 3).alias("route_length_km"))
        )
        out = out.join(length, ["LINE_NO", "ROUTE_ABBR"], "left")
    return with_audit(out)
