"""Streaming CDC apply: micro-batches of keyed change events MERGEd
into the versioned parquet table — the ingest-time twin of the batch
`operators/merge.merge_apply` (registry s16_merge_apply), the same way
`streaming/neardedup.py` twins the batch incremental dedup.

Beyond-reference (SURVEY.md §2.1-S13 names Delta `MERGE` as the
general restatement of the reference's first-seen/append ingest —
`scripts/ads_passenger_travel_distance_di.py:26-52`,
`data_ingestion/folder_import.R:94-98`). A warehouse fed by a CDC log
applies inserts/updates/deletes continuously; on Spark that is
Structured Streaming + `foreachBatch`, with each micro-batch running
the EXACT batch merge operator:

  * Per-batch streaming state is ZERO — no aggregation, no watermark;
    the table itself (versioned directory + atomic `_CURRENT`
    pointer) carries all state, and the checkpoint carries offsets.
  * Each batch collapses to its latest change per key (`seq_col`,
    deterministic) before applying, so replay order within a batch
    cannot matter; ACROSS batches the source must be seq-ordered
    (a CDC log is), making the final state equal to one collapsed
    batch apply — proven by the stream-vs-batch parity test.
  * Crash mid-batch: the pointer commit is atomic, so the table is
    either pre- or post-batch. On restart Spark replays the batch;
    re-applying the same changes is idempotent in effect (same
    values upsert, absent keys delete as no-ops). NULL-key rows are
    the one exception — merge_plan pins them as always-INSERT, so a
    replayed NULL-key row would duplicate. The streaming applier
    therefore DROPS rows with any NULL merge key (logged count)
    before applying, making replay safety unconditional; scrub or
    key-synthesize NULLs upstream if those rows matter.
  * 100 TB: the change batch broadcasts (merge_plan default), so the
    stored table never shuffles for updates/deletes; for
    partition-aligned feeds use `merge_apply_partitions` in the
    `apply_fn` instead.
"""

from __future__ import annotations

import functools
import logging
import operator
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ad_data_pipelines_spark.operators import merge as _merge

_log = logging.getLogger(__name__)


def _drop_null_key_rows(batch: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Replay-safety guard: merge_plan pins NULL-key rows as
    always-INSERT (a NULL never joins), so a crash-replayed micro-batch
    containing them would duplicate table rows. Drop them with a logged
    count — one bounded aggregate over the key projection. The count is
    an extra ACTION over the batch, and foreachBatch frames are NOT
    cached across actions — callers must persist the batch first (as
    run_cdc_apply_available_now does) so the probe and the downstream
    merge share one source read."""
    null_pred = functools.reduce(
        operator.or_, [F.col(k).isNull() for k in keys]
    )
    n_dropped = batch.select(*keys).filter(null_pred).count()
    if n_dropped:
        _log.warning(
            "dropping %d NULL-key change row(s) from micro-batch "
            "(keys=%s): NULL-key rows always INSERT and would "
            "duplicate on crash replay",
            n_dropped,
            list(keys),
        )
        return batch.filter(~null_pred)
    return batch


def read_changes_stream(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """File-source CDC stream: each parquet file under `path` is a
    change batch (op/seq columns included in `schema`)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def run_cdc_apply_available_now(
    spark: SparkSession,
    source_path: str,
    schema: StructType | str,
    table_root: str,
    keys: Sequence[str],
    checkpoint: str,
    op_col: str | None = "op",
    seq_col: str | None = "seq",
    max_files_per_trigger: int = 8,
    vacuum_keep: int | None = 2,
) -> None:
    """Drain all currently-available change files into the versioned
    table at `table_root` (availableNow trigger; the continuous
    deployment drops the trigger). The table must exist
    (`merge.table_init`). `vacuum_keep` bounds version accumulation
    on a long-running stream: after each batch commits, all but the
    newest N versions are reclaimed (keep ≥2 so a reader resolved
    just before the commit can still finish; None disables)."""

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        # persist: the NULL-key probe and the merge are separate
        # actions, and foreachBatch frames re-read the source per
        # action — the cache makes the probe's scan the only one
        batch = batch.persist()
        try:
            clean = _drop_null_key_rows(batch, keys)
            drop = [c for c in (op_col, seq_col) if c]
            changes = _merge.latest_change_per_key(
                clean, list(keys), seq_col
            )
            # keep op for merge_plan's delete routing; seq consumed
            _merge.merge_apply(
                spark,
                table_root,
                changes.drop(*[c for c in drop if c == seq_col]),
                keys,
                op_col=op_col,
                seq_col=None,
            )
        finally:
            batch.unpersist()
        if vacuum_keep is not None:
            _merge.table_vacuum(table_root, keep=vacuum_keep)

    (
        read_changes_stream(
            spark, source_path, schema,
            max_files_per_trigger=max_files_per_trigger,
        )
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_scd2_apply_available_now(
    spark: SparkSession,
    source_path: str,
    schema: StructType | str,
    table_root: str,
    keys: Sequence[str],
    attrs: Sequence[str],
    checkpoint: str,
    effective_col: str = "effective",
    seq_col: str | None = "seq",
    max_files_per_trigger: int = 8,
    vacuum_keep: int | None = 2,
) -> None:
    """Streaming SCD2 maintenance: micro-batches of attribute changes
    applied to the versioned history table with `scd.scd2_apply` —
    current intervals close at the change's effective time, unchanged
    re-sends are no-ops, so replayed batches cannot fragment the
    history (the same idempotence that makes the plain CDC apply
    replay-safe). Per-batch collapse keeps the latest `seq_col` change
    per key. The table must exist (`merge.table_init` with columns
    keys + attrs + valid_from + valid_to)."""
    from ad_data_pipelines_spark.operators import scd as _scd

    def apply_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        changes = _merge.latest_change_per_key(batch, list(keys), seq_col)
        history = _merge.table_read(spark, table_root)
        new_hist = _scd.scd2_apply(
            history, changes, keys, attrs, effective_col=effective_col
        )
        version = _merge._next_version(table_root)
        import os as _os

        new_hist.write.mode("overwrite").parquet(
            _os.path.join(table_root, version)
        )
        _merge._commit_pointer(table_root, version)
        if vacuum_keep is not None:
            _merge.table_vacuum(table_root, keep=vacuum_keep)

    (
        read_changes_stream(
            spark, source_path, schema,
            max_files_per_trigger=max_files_per_trigger,
        )
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
