"""Streaming distribution-drift monitor: score every micro-batch's
value distribution against a PINNED reference histogram (PSI) and
append per-group scores — the observability loop a production ingest
runs continuously ("did today's traffic stop looking like the
training period?").

Beyond-reference (SURVEY.md §2.9). The batch operator
(`operators/agg.psi_vs_reference`) needs only the reference
PROPORTIONS — constants, not data — so each micro-batch scores alone:
zero streaming state, no baseline re-read, and streamed results equal
running the batch operator on each batch by construction. Alerting is
a downstream filter on the appended scores (psi > 0.25 = shifted),
kept out of the monitor so thresholds can change without replaying.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators.agg import psi_vs_reference
from ad_data_pipelines_spark.streaming.enrich_asof import (
    read_events_stream,
)


def run_psi_monitor_available_now(
    spark: SparkSession,
    source_path: str,
    checkpoint: str,
    out_path: str,
    ref_props: Sequence[float],
    lo: float,
    hi: float,
    value_col: str = "value",
    group_cols: Sequence[str] = ("event_type",),
    max_files_per_trigger: int = 8,
) -> None:
    """Drain available event files; for each micro-batch append one
    row per group: (batch_id, group..., n_values, psi). Batches with
    no usable values emit nothing (no group reaches the aggregate)."""

    def _score(batch: DataFrame, batch_id: int) -> None:
        psi_vs_reference(
            batch, value_col, list(group_cols), list(ref_props), lo, hi
        ).withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_path)

    q = (
        read_events_stream(
            spark, source_path, max_files_per_trigger=max_files_per_trigger
        )
        .writeStream.foreachBatch(_score)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
