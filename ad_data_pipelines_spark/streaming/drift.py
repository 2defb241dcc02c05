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

from ad_data_pipelines_spark.operators.agg import (
    psi_vs_reference,
    psi_vs_reference_edges,
)
from ad_data_pipelines_spark.streaming.enrich_asof import (
    read_events_stream,
)


def run_psi_monitor_available_now(
    spark: SparkSession,
    source_path: str,
    checkpoint: str,
    out_path: str,
    ref_props: Sequence[float],
    lo: float = 0.0,
    hi: float = 1.0,
    value_col: str = "value",
    group_cols: Sequence[str] = ("event_type",),
    max_files_per_trigger: int = 8,
    edges: Sequence[float] | None = None,
) -> None:
    """Drain available event files; for each micro-batch append one
    row per group: (batch_id, group..., n_values, psi). Batches with
    no usable values emit nothing (no group reaches the aggregate).

    Bins: equal-width on [lo, hi) by default; pass `edges` (the
    trained quantile boundaries from `agg.quantile_bin_edges` on the
    reference period, with ref_props the training proportions of the
    SAME bins) to monitor a heavy-tailed metric without starving the
    tails — either way the boundaries are pinned literals, so every
    micro-batch still scores alone with zero streaming state."""

    def _score(batch: DataFrame, batch_id: int) -> None:
        if edges is not None:
            scored = psi_vs_reference_edges(
                batch, value_col, list(group_cols), list(ref_props),
                list(edges),
            )
        else:
            scored = psi_vs_reference(
                batch, value_col, list(group_cols), list(ref_props),
                lo, hi,
            )
        scored.withColumn("batch_id", F.lit(batch_id)).write.mode(
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
