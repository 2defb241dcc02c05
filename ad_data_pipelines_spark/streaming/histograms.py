"""Streaming histogram-shard maintainer: per-micro-batch bin counts
merged into a persisted shard table — the streaming producer of the
mergeable QUANTILE artifact (`operators/sketch.histogram_shard_table`
/ `histogram_union_quantiles`). With this, every artifact in the
family has both producers: batch build + streaming maintenance for
HLL distinct shards (streaming/distincts.py), CMS frequencies
(streaming/hotkeys.py), and histogram quantiles (here).

Bin counts are ADDITIVE — like the CMS and unlike HLL's register-max —
so a replayed micro-batch would double-count. This maintainer
therefore reuses the hot-key monitor's replay guard verbatim: a
{version, batch_id, stream_id} pointer committed atomically per
batch; replayed batch ids of the same stream are no-ops, and a
recreated checkpoint (batch ids restart at 0) raises instead of
silently freezing the artifact (streaming/hotkeys.py:13-31 rationale).

Scale shape: per micro-batch, ONE combinable aggregate bounded by
(touched shards × K bins) rows, then a rewrite of a table whose size
is shards × K — thousands of rows for years of daily shards —
regardless of event volume. Raw values are never retained; quantile
queries at any grain run on the artifact alone.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import sketch as _sketch
from ad_data_pipelines_spark.streaming.hotkeys import (
    _checkpoint_query_id,
    _commit_state,
    _replay_check,
    _state,
)


def _commit(
    root: str,
    version: int,
    batch_id: int,
    stream_id: str | None,
    bounds: list[float],
) -> None:
    """hotkeys' committed state plus the artifact's bin BOUNDS: two
    histograms are only mergeable over identical bounds, and unlike
    the HLL union (which rejects mismatched lg_k loudly) adding counts
    from different bounds is silent corruption — so the bounds are
    part of the committed identity and checked on every apply. Read
    and write both go through hotkeys' `_state`/`_commit_state`, so
    the pointer file name exists in exactly one place."""
    _commit_state(
        root,
        {
            "version": version,
            "batch_id": batch_id,
            "stream_id": stream_id,
            "bounds": bounds,
        },
    )


def read_shards(spark: SparkSession, root: str) -> DataFrame | None:
    """The committed shard table (shard_cols…, bin, n), or None before
    the first batch. Feed it to `sketch.histogram_union_quantiles`."""
    st = _state(root)
    if st is None:
        return None
    return spark.read.parquet(os.path.join(root, f"v{st['version']:06d}"))


def apply_batch(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    batch_id: int,
    value_col: str,
    bounds: Sequence[float],
    shard_cols: Sequence[str],
    stream_id: str | None = None,
) -> bool:
    """Add one micro-batch's bin counts into the persisted shard
    table; returns False (no-op) for an already-applied batch_id of
    the same stream — the additive-artifact replay guard (see module
    docstring; identity semantics identical to hotkeys.apply_batch)."""
    os.makedirs(root, exist_ok=True)
    bs = [float(b) for b in bounds]
    st = _state(root)
    if st is not None:
        if st.get("bounds") != bs:
            raise ValueError(
                f"histogram shards at {root} were built with bounds "
                f"{st.get('bounds')} but this apply uses {bs} — counts "
                "over different bounds must never be added; rebuild "
                "the artifact (or re-train and start a new root)"
            )
    skip, stream_id = _replay_check(
        st, batch_id, stream_id, root, "histogram shards"
    )
    if skip:
        return False
    new = _sketch.histogram_shard_table(
        batch, value_col, bounds, list(shard_cols)
    )
    if st is None:
        merged, version = new, 1
    else:
        cur = spark.read.parquet(
            os.path.join(root, f"v{st['version']:06d}")
        )
        merged, version = (
            cur.unionByName(new)
            .groupBy(*shard_cols, "bin")
            .agg(F.sum("n").cast("bigint").alias("n")),
            st["version"] + 1,
        )
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(root, f"v{version:06d}")
    )
    _commit(root, version, batch_id, stream_id, bs)
    # keep current + one prior version (reader-grace, as in hotkeys)
    for name in os.listdir(root):
        if (
            name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) < version - 1
        ):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return True


def run_histogram_maintainer_available_now(
    spark: SparkSession,
    src_path: str,
    checkpoint: str,
    shard_root: str,
    value_col: str,
    bounds: Sequence[float],
    shard_cols: Sequence[str] = ("shard",),
    derive: Callable[[DataFrame], DataFrame] | None = None,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain available parquet files at `src_path`; per micro-batch,
    derive the shard columns (`derive`, e.g. to_date(ts)) and add the
    batch's bin counts into the artifact at `shard_root`. Afterwards,
    `sketch.histogram_union_quantiles(read_shards(spark, shard_root),
    bounds, probs, grain)` serves quantiles at any grain with zero
    re-scan."""
    src = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src_path).schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(src_path)
    )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if derive is not None:
            batch = derive(batch)
        apply_batch(
            spark,
            shard_root,
            batch,
            batch_id,
            value_col,
            bounds,
            list(shard_cols),
            stream_id=_checkpoint_query_id(checkpoint),
        )

    (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
