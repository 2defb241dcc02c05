"""Stream-static AS-OF enrichment: attach the dimension version in
effect AT EVENT TIME to each streamed event.

Beyond-reference (SURVEY.md §2.9). The plain stream-static equi-join
(`streaming/daily_aggs.enrich_stream`) attaches the CURRENT dimension
row; when the dimension is versioned (an SCD2 history, price books,
driver rosters), correctness requires the row whose validity covers the
event's timestamp — the batch `operators/asof.asof_join` semantic,
ridden along the ingest stream.

Plan shape: the as-of match is EVENT-LOCAL (each event independently
picks its predecessor row in the static history), so `foreachBatch`
applies the exact batch operator to every micro-batch — streamed
results are identical to a batch run over the union of batches by
construction, and no streaming state exists beyond checkpoint offsets.
The batch side stays one exchange per micro-batch (asof_join's union +
window), with the small history side typically broadcastable.

Dimension freshness: `dim_history` may be a DataFrame (resolved once —
static per drain) or a zero-arg provider callable, re-invoked INSIDE
`foreachBatch` so every micro-batch re-resolves the history table.
The provider form is the long-running production stream's shape: the
upstream SCD job rebuilds the history table between triggers, and
each trigger enriches against the version current at that moment
(e.g. `lambda: spark.read.parquet(history_path)` — a fresh read per
trigger, picking up newly landed files).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ad_data_pipelines_spark.operators.asof import asof_join

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


def run_asof_enrich_available_now(
    spark: SparkSession,
    source_path: str,
    dim_history: DataFrame | Callable[[], DataFrame],
    checkpoint: str,
    out_path: str,
    on: Sequence[str] = ("user_id",),
    left_ts: str = "ts",
    right_ts: str = "valid_from",
    right_cols: Sequence[str] = (),
    tolerance: Column | None = None,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain available event files, as-of-joining each micro-batch to
    `dim_history` (one row per (key, valid_from) version) and
    appending the enriched events to `out_path`. Events with no
    version at-or-before their timestamp carry NULL dimension columns
    — visible, not dropped (the caller's quarantine policy).

    Pass a zero-arg callable as `dim_history` to re-resolve the
    history PER MICRO-BATCH (per-trigger dimension refresh — see
    module docstring); a plain DataFrame is enriched against
    unchanged for the whole drain."""
    resolve = dim_history if callable(dim_history) else lambda: dim_history

    def _enrich(batch: DataFrame, _id: int) -> None:
        asof_join(
            batch,
            resolve(),
            on=list(on),
            left_ts=left_ts,
            right_ts=right_ts,
            right_cols=list(right_cols),
            tolerance=tolerance,
        ).write.mode("append").parquet(out_path)

    q = (
        read_events_stream(
            spark, source_path, max_files_per_trigger=max_files_per_trigger
        )
        .writeStream.foreachBatch(_enrich)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
