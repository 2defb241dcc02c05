"""Streaming hot-key monitor: a Count-Min sketch of key traffic,
maintained incrementally across micro-batches — the streaming twin of
the batch monitoring sketches (`operators/sketch.py`, registry
`llm_cms_estimates` / `llm_heavy_hitters_sketch`).

Beyond-reference (SURVEY.md north star). Skewed keys are discovered
AFTER they hurt unless something cheap watches the feed; a CMS is the
cheap watcher: per batch, one bounded aggregate (≤ depth×width
groups), then a bucket-wise merge into the persisted sketch — the
sketch answers "how hot has key K been, ever" in O(depth) lookups
(`sketch.cms_estimates`) and its size never grows.

Exactly-once under replay: a CMS is ADDITIVE, so re-applying a
replayed micro-batch would double-count. The committed state is
therefore {version, last_batch_id} in ONE pointer file (atomic
`os.replace`, same protocol as `operators/merge.py`); the per-batch
apply SKIPS any batch_id ≤ the committed one, making crash-replay a
no-op — the idempotent-foreachBatch pattern Structured Streaming
requires of additive sinks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ad_data_pipelines_spark.operators import sketch as _sketch

_POINTER = "_STATE"


def _state(root: str) -> dict | None:
    try:
        with open(os.path.join(root, _POINTER), encoding="ascii") as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _commit(root: str, version: int, batch_id: int) -> None:
    tmp = os.path.join(root, f"{_POINTER}.tmp")
    with open(tmp, "w", encoding="ascii") as f:
        json.dump({"version": version, "batch_id": batch_id}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _POINTER))


def read_sketch(spark: SparkSession, root: str) -> DataFrame | None:
    """The committed sketch (row, bucket, cnt), or None before the
    first batch. Feed it to `sketch.cms_estimates` for point lookups
    or persist-side joins."""
    st = _state(root)
    if st is None:
        return None
    return spark.read.parquet(os.path.join(root, f"v{st['version']:06d}"))


def apply_batch(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    batch_id: int,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> bool:
    """Merge one micro-batch into the persisted sketch; returns False
    (no-op) for an already-applied batch_id — replay safety for the
    additive sketch."""
    os.makedirs(root, exist_ok=True)
    st = _state(root)
    if st is not None and batch_id <= st["batch_id"]:
        return False
    new = _sketch.count_min_table(
        batch.select(key_col), key_col, width=width, depth=depth
    )
    if st is None:
        merged, version = new, 1
    else:
        cur = spark.read.parquet(
            os.path.join(root, f"v{st['version']:06d}")
        )
        merged, version = _sketch.cms_merge([cur, new]), st["version"] + 1
    merged.write.mode("overwrite").parquet(
        os.path.join(root, f"v{version:06d}")
    )
    _commit(root, version, batch_id)
    # bound version accumulation: keep current + one prior (a reader
    # that resolved the pointer just before the commit can finish)
    import shutil

    for name in os.listdir(root):
        if (
            name.startswith("v")
            and name[1:].isdigit()
            and int(name[1:]) < version - 1
        ):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    return True


def run_hotkey_monitor_available_now(
    spark: SparkSession,
    source_path: str,
    schema: StructType | str,
    key_col: str,
    sketch_root: str,
    checkpoint: str,
    width: int = 1024,
    depth: int = 4,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain all available source files, maintaining the persisted
    CMS at `sketch_root` (availableNow; continuous deployments drop
    the trigger)."""
    (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
        .writeStream.foreachBatch(
            lambda b, bid: apply_batch(
                spark, sketch_root, b, bid, key_col,
                width=width, depth=depth,
            )
            and None
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
