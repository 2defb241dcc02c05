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
