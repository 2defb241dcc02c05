"""Streaming near-dedup against a historical corpus: the ingest-time
twin of the batch incremental dedup (`operators/dedup.dedup_against_
corpus`, registry llm_incremental_dedup).

Beyond-reference (SURVEY.md §2.9). A continuously-crawled corpus must
reject near-duplicates of what it ALREADY holds at ingest time — not in
a nightly re-pairing of the whole corpus. Plan shape:

  * The history side is a STATIC MinHash signature table (the same
    artifact the batch chain materializes; at scale a parquet/bucketed
    table rebuilt by the upstream batch job). It never streams.
  * Each micro-batch computes signatures for its (small) batch of docs
    with the exact batch operator, then LSH-joins them against history
    via `dedup_against_corpus` — so stream and batch verdicts are
    identical by construction, and the per-batch state is ZERO: no
    streaming aggregation, no watermark, nothing carried between
    batches beyond the checkpoint offsets.
  * Within-batch exact duplicates collapse DETERMINISTICALLY (min
    doc_id per content fingerprint keeps; never a bare dropDuplicates
    — CLAUDE.md invariant) and the losers are routed to the drop sink
    with the keeper as `matched_doc` evidence, so no row vanishes
    from both sinks. Near-dup pairs BETWEEN two new docs in the same
    batch are the batch chain's job when history refreshes —
    documented tradeoff, same as the daily-batch shape.

Kept docs append to `keep_path`; dropped docs append to `drop_path`
with their matched historical doc id as evidence. Both writes happen in
one foreachBatch on the same frame: exhaustive, disjoint.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import dedup as _dedup
from ad_data_pipelines_spark.streaming.quality import read_docs_stream


def _dedup_batch(
    batch: DataFrame,
    history_sigs: DataFrame,
    keep_path: str,
    drop_path: str,
    min_eq: int,
) -> None:
    # Within-batch exact dedup must be DETERMINISTIC (CLAUDE.md: never
    # bare dropDuplicates on rows that can disagree) and EXHAUSTIVE:
    # the min-doc_id copy of each text goes on to the history check,
    # the losers are routed to drop_path with the keeper as evidence —
    # no row may vanish from both sinks. NULL texts get a per-doc
    # sentinel fingerprint so distinct empty docs never collapse.
    fp = F.coalesce(
        F.md5("text"), F.concat(F.lit("\x00null:"), F.col("doc_id"))
    )
    w = Window.partitionBy("__fp").orderBy("doc_id")
    flagged = (
        batch.withColumn("__fp", fp)
        .withColumn("__keeper", F.min("doc_id").over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )))
        .persist()
    )
    intra_dups = flagged.filter(F.col("doc_id") != F.col("__keeper"))
    intra_dups.select(
        *batch.columns, F.col("__keeper").alias("matched_doc")
    ).write.mode("append").parquet(drop_path)

    survivors = flagged.filter(
        F.col("doc_id") == F.col("__keeper")
    ).drop("__fp", "__keeper")
    sigs = _dedup.minhash_signatures(survivors)
    verdicts = _dedup.dedup_against_corpus(
        sigs, history_sigs, min_eq=min_eq
    ).persist()
    docs = survivors.join(verdicts, "doc_id")
    docs.filter(F.col("kept")).drop("kept", "matched_doc").write.mode(
        "append"
    ).parquet(keep_path)
    docs.filter(~F.col("kept")).drop("kept").select(
        *batch.columns, "matched_doc"
    ).write.mode("append").parquet(drop_path)
    verdicts.unpersist()
    flagged.unpersist()


def run_near_dedup_available_now(
    spark: SparkSession,
    source_path: str,
    history_sigs: DataFrame | Callable[[], DataFrame],
    checkpoint: str,
    keep_path: str,
    drop_path: str,
    min_eq: int = 8,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain available document files through the near-dedup gate
    against `history_sigs` (a `minhash_signatures` table): novel docs
    append to `keep_path`, near-dups of history to `drop_path` with
    `matched_doc` evidence.

    Pass a zero-arg callable as `history_sigs` to re-resolve the
    history PER MICRO-BATCH — the long-running ingest stream's shape:
    the upstream batch dedup job republishes the signature artifact
    (e.g. via `operators/artifacts.materialize`), and each trigger
    gates against the version current at that moment, so a doc the
    corpus absorbed an hour ago already rejects its near-copies
    (`lambda: spark.read.parquet(sig_artifact_path)`). A plain
    DataFrame stays static for the whole drain."""
    resolve = (
        history_sigs if callable(history_sigs) else lambda: history_sigs
    )
    q = (
        read_docs_stream(
            spark, source_path, max_files_per_trigger=max_files_per_trigger
        )
        .writeStream.foreachBatch(
            lambda batch, _id: _dedup_batch(
                batch, resolve(), keep_path, drop_path, min_eq
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
