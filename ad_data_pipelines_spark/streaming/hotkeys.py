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
therefore {version, last_batch_id, stream_id} in ONE pointer file
(atomic `os.replace`, same protocol as `operators/merge.py`); the
per-batch apply SKIPS any batch_id ≤ the committed one, making
crash-replay a no-op — the idempotent-foreachBatch pattern Structured
Streaming requires of additive sinks.

The skip guard is only sound while batch ids come from the SAME
checkpoint lineage: a deleted or relocated checkpoint restarts batch
ids at 0, and a bare last-batch_id guard would then silently skip
every new micro-batch forever. The committed state therefore also
carries the stream identity (the checkpoint's query id from its
`metadata` file — regenerated whenever the checkpoint is recreated,
stable across restarts of the same checkpoint); a mismatch RAISES
instead of skipping, forcing the operator to either restore the
checkpoint or rebuild the sketch.
"""

from __future__ import annotations

import json
import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ad_data_pipelines_spark.operators import sketch as _sketch

logger = logging.getLogger(__name__)

#: the pointer file name is OWNED here — every additive-artifact
#: maintainer (this module, streaming/histograms.py) reads through
#: `_state` and writes through `_commit_state`, so the read and write
#: paths can never drift onto different file names
_POINTER = "_STATE"


def _state(root: str) -> dict | None:
    try:
        with open(os.path.join(root, _POINTER), encoding="ascii") as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _commit_state(root: str, state: dict) -> None:
    """Atomic pointer write (fsync + os.replace) shared by every
    additive-artifact maintainer; `state` must carry at least
    {version, batch_id, stream_id}."""
    tmp = os.path.join(root, f"{_POINTER}.tmp")
    with open(tmp, "w", encoding="ascii") as f:
        json.dump(state, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _POINTER))


def _commit(
    root: str, version: int, batch_id: int, stream_id: str | None
) -> None:
    _commit_state(
        root,
        {"version": version, "batch_id": batch_id, "stream_id": stream_id},
    )


def _replay_check(
    st: dict | None,
    batch_id: int,
    stream_id: str | None,
    root: str,
    what: str,
) -> tuple[bool, str | None]:
    """The additive-artifact replay guard, shared by every maintainer:
    returns (skip, effective_stream_id).

    * committed and incoming stream ids both present but different →
      RAISE (a recreated checkpoint restarts batch ids at 0; skipping
      would silently freeze the artifact).
    * batch_id ≤ committed → skip (crash-replay no-op). If the
      committed pointer carries NO stream identity (pre-upgrade, or a
      direct batch caller), that exact failure mode is undetectable —
      WARN loudly so the skip is never mistaken for replay safety.
    * otherwise apply; a pointer without identity adopts the incoming
      one (legacy backfill), an incoming None inherits the committed.
    """
    if st is None:
        return False, stream_id
    committed_sid = st.get("stream_id")
    if (
        stream_id is not None
        and committed_sid is not None
        and committed_sid != stream_id
    ):
        raise RuntimeError(
            f"{what} at {root} was committed by stream "
            f"{committed_sid!r} but this stream is {stream_id!r} "
            "(checkpoint deleted or relocated?) — batch ids are "
            "not comparable across checkpoints; restore the "
            "original checkpoint or rebuild the artifact"
        )
    if batch_id <= st["batch_id"]:
        if committed_sid is None:
            logger.warning(
                "%s at %s has no committed stream identity; skipping "
                "batch_id %d <= committed %d. If the checkpoint was "
                "recreated (batch ids restart at 0) this skip is WRONG "
                "— restore the original checkpoint or rebuild the "
                "artifact; future commits from an identified stream "
                "will backfill the identity.",
                what,
                root,
                batch_id,
                st["batch_id"],
            )
        return True, stream_id
    return False, stream_id if stream_id is not None else committed_sid


def _checkpoint_query_id(checkpoint: str) -> str | None:
    """The streaming query id persisted in `{checkpoint}/metadata` —
    written at stream start (so it exists by the first foreachBatch
    call), stable across restarts of the same checkpoint, regenerated
    if the checkpoint directory is deleted or relocated. Exactly the
    identity the replay-skip guard needs."""
    try:
        with open(os.path.join(checkpoint, "metadata"), encoding="utf-8") as f:
            return json.load(f).get("id")
    except (OSError, ValueError):
        return None


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
    stream_id: str | None = None,
) -> bool:
    """Merge one micro-batch into the persisted sketch; returns False
    (no-op) for an already-applied batch_id of the SAME stream —
    replay safety for the additive sketch. `stream_id` (the
    checkpoint's query id) guards against a recreated checkpoint whose
    batch ids restart at 0: a mismatch against the committed stream_id
    raises instead of silently skipping every new batch. None skips
    the identity check (direct/batch callers); a sketch committed
    without an identity adopts the first one it sees."""
    os.makedirs(root, exist_ok=True)
    st = _state(root)
    skip, stream_id = _replay_check(st, batch_id, stream_id, root, "sketch")
    if skip:
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
    _commit(root, version, batch_id, stream_id)
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
                stream_id=_checkpoint_query_id(checkpoint),
            )
            and None
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
