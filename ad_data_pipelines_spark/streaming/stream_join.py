"""Stream-stream interval join with watermark-bounded state: attribute
each purchase to the clicks that preceded it within a window, with BOTH
sides arriving as streams.

Beyond-reference (SURVEY.md §2.9 — the reference is strictly batch).
The stream-static forms elsewhere (daily_aggs.enrich_stream,
enrich_asof, neardedup) cover a static right side; when both sides
flow — click stream ⋈ purchase stream — Spark's stream-stream join
needs explicit state bounds or the join state grows forever:

  * BOTH sides carry event-time watermarks (how late data may arrive);
  * the join condition carries a TIME-RANGE constraint
    (`p.ts BETWEEN c.ts AND c.ts + window`), which tells the state
    store exactly how long a buffered click can still match future
    purchases — state for older clicks is evicted, keeping the store
    O(rate × window), never O(history);
  * inner join + append output: a (click, purchase) pair emits once,
    when both sides have arrived and the watermark says the pair is
    final.

Results equal the batch inequality join over the union of all
micro-batches (asserted in tests) — modulo pairs older than the
watermark, which a batch backfill job owns (the standard lambda
split, stated rather than hidden).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_purchases_joined(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "7 days",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """(user_id, click_id, click_ts, purchase_id, purchase_ts,
    lag_hours) for every purchase within `window` AFTER a click by the
    same user. Works identically on batch DataFrames (watermarks are a
    no-op in batch) — the parity tests rely on that.

    Input contracts: `clicks` has (user_id, event_id, ts); `purchases`
    the same. Half-open attribution window [click_ts, click_ts +
    window): a purchase at the exact click instant attributes, one at
    exactly +window does not — the same convention as the interval
    operators.

    `how="left_outer"` additionally emits UNCONVERTED clicks (NULL
    purchase columns) — but only once the watermark passes the end of
    the click's window, when "no purchase" is final rather than "not
    yet". Clicks whose window is still open stay in checkpointed
    state; a later drain resuming from the same checkpoint emits them
    as the watermark advances (asserted in tests). That is the
    streaming contract: outer results are eventual, never retracted.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported join type {how!r}")
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr(f"INTERVAL {window}")
        ),
        how,
    )
    lag_h = (
        F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    ) / F.lit(3_600_000_000.0)
    return joined.select(
        "user_id",
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        F.round(lag_h, 4).alias("lag_hours"),
    )


def run_attribution_available_now(
    spark,
    clicks_path: str,
    purchases_path: str,
    checkpoint: str,
    out_path: str,
    window: str = "7 days",
    watermark: str = "1 hour",
    max_files_per_trigger: int = 8,
    how: str = "inner",
) -> None:
    """Drain the two file streams through the watermarked interval
    join, appending finalized (click, purchase) attributions (plus,
    with how='left_outer', watermark-finalized unconverted clicks)."""
    from ad_data_pipelines_spark.streaming.enrich_asof import (
        read_events_stream,
    )

    joined = clicks_purchases_joined(
        read_events_stream(spark, clicks_path, max_files_per_trigger),
        read_events_stream(spark, purchases_path, max_files_per_trigger),
        window=window,
        watermark=watermark,
        how=how,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
