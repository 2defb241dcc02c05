"""Streaming distinct-count shard maintainer: per-micro-batch HLL
sketches unioned into a persisted per-shard sketch table — the
streaming twin of `operators/sketch.hll_shard_table` /
`hll_union_estimate`, and the incremental producer of the artifact
`plans/ads_travel_info.py`'s sketch rollup consumes (the reference
rebuilt its HyperLogLog uniques per grain from raw legs,
scripts/ads_passenger_travel_info_mi.py:244-344; here the daily shard
is maintained as events arrive and every coarser grain is union
algebra over tiny rows).

Replay safety, contrasted with the CMS hot-key monitor
(streaming/hotkeys.py): a Count-Min sketch is ADDITIVE, so that
monitor must skip replayed batch ids behind a stream-identity pointer.
HLL union is register-MAX — re-unioning an identical replayed
micro-batch leaves every register unchanged — so crash-replay is
idempotent BY ALGEBRA and this maintainer needs no batch-id
bookkeeping at all. The shard table itself is versioned with the same
atomic `_CURRENT` pointer protocol as `operators/merge.py`: readers
observe a committed sketch set or the previous one, never a
half-written union.

Scale shape: per micro-batch, ONE bounded aggregate (one ~2^lg_k-byte
sketch per touched shard) + a rewrite of the shard table — which has
one row per (day, …) shard, i.e. thousands of rows for years of data,
regardless of event volume. The raw stream is never retained.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import merge as _merge
from ad_data_pipelines_spark.operators import sketch as _sketch


def apply_batch(
    batch: DataFrame,
    shard_root: str,
    key_col: str,
    shard_cols: Sequence[str],
    lg_k: int = 12,
    vacuum_keep: int | None = 2,
) -> None:
    """Union one micro-batch's per-shard sketches into the versioned
    shard table at `shard_root` (idempotent for a replayed identical
    batch — see module docstring). Shards absent from the batch pass
    through untouched; new shards appear. `vacuum_keep` bounds version
    accumulation across micro-batches (keep ≥2 so a reader that
    resolved the previous pointer can finish — same reader-grace
    contract as the CDC applier). Changing `lg_k` mid-stream fails
    loudly: `hll_union_agg` rejects mismatched lg_k sketches (its
    allowDifferentLgConfigK default), so the artifact cannot silently
    mix precisions — the self-guarding the histogram maintainer has
    to implement explicitly for its bounds."""
    spark = batch.sparkSession
    sk = _sketch.hll_shard_table(batch, key_col, shard_cols, lg_k)
    if _merge.table_current_version(shard_root) is None:
        # coalesce(1): the shard table is tiny by construction
        _merge.table_init(sk.coalesce(1), shard_root)
        return
    merged = (
        _merge.table_read(spark, shard_root)
        .unionByName(sk)
        .groupBy(*shard_cols)
        .agg(F.hll_union_agg("hll").alias("hll"))
    )
    version = _merge._next_version(shard_root)
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(shard_root, version)
    )
    _merge._commit_pointer(shard_root, version)
    if vacuum_keep is not None:
        _merge.table_vacuum(shard_root, keep=vacuum_keep)


def run_hll_shard_maintainer_available_now(
    spark: SparkSession,
    src_path: str,
    checkpoint: str,
    shard_root: str,
    key_col: str,
    shard_cols: Sequence[str] = ("shard",),
    lg_k: int = 12,
    derive: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int = 8,
    vacuum_keep: int | None = 2,
) -> None:
    """Drain available event files (parquet at `src_path`, same source
    contract as the other availableNow streams); per micro-batch,
    derive the shard columns (`derive`, e.g. `to_date(ts)` — runs on
    the batch DataFrame) and union the batch's sketches into the
    versioned shard table. After the drain, `sketch.hll_union_estimate`
    over `merge.table_read(spark, shard_root)` answers distinct-count
    questions at ANY grain over any shard subset with zero re-scan."""
    src = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src_path).schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(src_path)
    )

    def _apply(batch: DataFrame, _batch_id: int) -> None:
        if derive is not None:
            batch = derive(batch)
        apply_batch(
            batch, shard_root, key_col, list(shard_cols), lg_k, vacuum_keep
        )

    (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
