"""Streaming deduplication: exactly-once event/document identity over an
unbounded stream.

Beyond-reference (SURVEY.md §2.9 — the reference dedups only in batch,
`drop_duplicates` per script run). Two streaming policies:

  * `dedup_exact_stream` — drop every reappearance of a key for the
    stream's lifetime (`dropDuplicates`). State grows with distinct
    keys: only safe for bounded key universes (dimension feeds).
  * `dedup_within_watermark` — drop reappearances within the watermark
    horizon (`dropDuplicatesWithinWatermark`): state is bounded by
    keys-per-watermark-window, the only policy that survives an
    unbounded 100 TB/day stream. Late duplicates beyond the horizon
    re-emit — the at-least-once/state-size tradeoff, documented here
    rather than hidden.

Content dedup at stream time hashes the payload (md5, as the batch
`exact_dup_groups` does) so the state store holds 16-byte keys, never
document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(stream: DataFrame, keys: list[str]) -> DataFrame:
    """Lifetime key dedup — unbounded state; bounded-universe feeds only."""
    return stream.dropDuplicates(keys)


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 days",
) -> DataFrame:
    """Watermark-bounded dedup: a key seen once is suppressed until the
    watermark passes its first event time; state is purged after. The
    streaming twin of batch `exact_dup_groups` keeper semantics (first
    arrival wins — deterministic in event-time order, not file order)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def content_key(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a 16-byte `content_hash` for payload dedup — state never
    stores text (the batch pipeline's md5 groupBy, streamified)."""
    return stream.withColumn("content_hash", F.md5(F.col(text_col)))


# --- exactly-once micro-batch sink ---------------------------------------

def foreach_batch_idempotent(write_batch, ledger_path: str):
    """Wrap a micro-batch writer with batch-id idempotence for
    `writeStream.foreachBatch`.

    Structured Streaming's checkpoint guarantees each batch_id is
    *delivered* at least once — after a crash between sink commit and
    checkpoint commit, the batch replays. For sinks without their own
    transactional dedup (JDBC staging loads, object-store copies), the
    standard recipe is a per-batch ledger: skip the write when the
    batch_id is already recorded, record it after a successful write.
    Same idea as the reference's `.imported` markers
    (data_ingestion/folder_import.R:69-91) and our batch manifest
    (sources/manifest.py), applied per micro-batch.

    GUARANTEE, precisely: this narrows the duplicate window to a crash
    BETWEEN `write_batch` returning and the marker landing — it does
    NOT close it. The ledger upgrades the sink to exactly-once only
    when `write_batch` is itself idempotent for a given batch_id
    (overwrite-by-batch_id partition, staged table swap keyed on
    batch_id, MERGE on a batch key); for a blind append the composite
    remains at-least-once with a much smaller window. The marker itself
    is written tmp + os.replace (atomic on POSIX), so a crash mid-write
    can never leave a half-written marker that skips an unwritten batch.

    `write_batch(df, batch_id)` does the real work (e.g.
    `write_jdbc_staged`); the returned function plugs into
    `stream.writeStream.foreachBatch(...)`. foreachBatch executes on
    the driver, so the ledger uses plain file I/O — point it at storage
    that survives driver restarts (the checkpoint volume); swap in the
    Hadoop FS API for object stores.
    """
    import os

    os.makedirs(ledger_path, exist_ok=True)

    def _apply(df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger_path, f"batch-{batch_id}.done")
        if os.path.exists(marker):
            return
        write_batch(df, batch_id)
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, marker)

    return _apply
