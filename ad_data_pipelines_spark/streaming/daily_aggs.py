"""Structured Streaming variants of the daily aggregate pipelines.

Beyond-reference (SURVEY.md §2.9): the reference is strictly batch —
"incremental" meant re-running a month's script. Here the same daily
aggregation runs as an incremental stream:

    readStream(parquet dir) → withWatermark → window(1 day) → agg →
    writeStream(append/complete)

Watermarking bounds state: late events beyond the watermark are dropped,
so state size is O(groups × watermark/window) regardless of stream
length — the property that lets the same query run forever on a real
cluster. `run_available_now` drains whatever data exists and stops
(used by tests and backfills; identical code path to a live stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: events stream schema (streams must declare schemas — no inference)
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def daily_event_aggs(stream: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Windowed daily aggregate with late-data watermark: one row per
    (day, event_type) with count / value sum / approx distinct users
    (HLL — exact distinct is unsupported in streaming, and ±1% matches
    the batch pipeline's production path)."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
            F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("ope_date"),
            "event_type",
            "n_events",
            "value_sum",
            "approx_users",
        )
    )


def run_available_now(
    spark: SparkSession,
    source_path: str,
    checkpoint: str,
    sink_table: str = "daily_events_stream",
) -> None:
    """Drain all currently-available files into an in-memory sink and
    stop — the batch-equivalent execution of the streaming query
    (Trigger.AvailableNow). Query results land in `sink_table`."""
    agg = daily_event_aggs(read_events_stream(spark, source_path))
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_stream(
    stream: DataFrame, dim: DataFrame, key: str, how: str = "left"
) -> DataFrame:
    """Stream-static broadcast enrichment: the streaming twin of the
    batch J1/J2 dimension chain (plans/transit_common.py).

    Stream-static joins need no watermark and keep NO state: each
    micro-batch hash-joins against the static side, and broadcasting
    the dim means the stream never shuffles for enrichment — the same
    invariant the batch pipelines hold (CLAUDE.md). The static side is
    re-read per micro-batch, so a dim refreshed in place is picked up
    without restarting the query."""
    return stream.join(F.broadcast(dim), key, how)
