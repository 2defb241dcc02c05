"""Streaming decontamination gate: the ingest-time twin of the batch
bloom pass (`operators/dedup.bloom_contamination_filter`, registry
llm_bloom_decontam).

Beyond-reference (SURVEY.md §2.9). Continuously-crawled data must be
screened against the benchmark decontamination list AT INGEST — not in
a nightly re-scan of the whole corpus. Plan shape:

  * The list side is a STATIC `bloom_bits` word table (≤ 2^bits_log2/32
    rows — the artifact an upstream job materializes once per list
    revision; the raw gram list itself never ships). Re-resolve it per
    micro-batch by passing a callable, exactly like neardedup's
    history signatures.
  * Each micro-batch tokenizes its (small) batch of docs with the
    exact batch operator (`word_ngram_hashes`) and probes the
    broadcast bloom scalar with the exact batch probe
    (`bloom_hit_grams_from_words`) — stream and batch verdicts are
    identical by construction, and the per-batch streaming state is
    ZERO: stateless map + per-batch aggregate, no watermark, nothing
    carried between triggers beyond checkpoint offsets.
  * Exhaustive, disjoint routing: clean docs append to `keep_path`;
    flagged docs append to `quarantine_path` WITH their
    `n_flagged_ngrams` evidence — no row vanishes from both sinks.
    (The bloom can over-flag by its FP rate — the quarantine is a
    review queue, not a delete; run the exact `contamination_check`
    over the quarantine when exactness matters, the two-phase shape.)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import dedup as _dedup
from ad_data_pipelines_spark.streaming.quality import read_docs_stream


def _decontam_batch(
    batch: DataFrame,
    words: DataFrame,
    keep_path: str,
    quarantine_path: str,
    n: int,
    k: int,
    bits_log2: int,
) -> None:
    grams = _dedup.word_ngram_hashes(batch, n)
    flagged = (
        _dedup.bloom_hit_grams_from_words(
            grams, words, k=k, bits_log2=bits_log2
        )
        .groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_flagged_ngrams"))
        .persist()
    )
    docs = batch.join(flagged, "doc_id", "left")
    docs.filter(F.col("n_flagged_ngrams").isNull()).drop(
        "n_flagged_ngrams"
    ).write.mode("append").parquet(keep_path)
    docs.filter(F.col("n_flagged_ngrams").isNotNull()).write.mode(
        "append"
    ).parquet(quarantine_path)
    flagged.unpersist()


def run_bloom_decontam_available_now(
    spark: SparkSession,
    source_path: str,
    bloom_words: DataFrame | Callable[[], DataFrame],
    checkpoint: str,
    keep_path: str,
    quarantine_path: str,
    n: int = 8,
    k: int = 5,
    bits_log2: int = 18,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain available document files through the bloom
    decontamination gate: docs with zero flagged word-n-grams append
    to `keep_path`, flagged docs to `quarantine_path` with their
    `n_flagged_ngrams` evidence.

    `bloom_words` is a `bloom_bits` table (or a zero-arg callable
    re-resolved PER MICRO-BATCH — the long-running ingest shape: the
    upstream job republishes the artifact when the decontamination
    list grows, and each trigger gates against the version current at
    that moment). `k`/`bits_log2` must match the artifact's build
    parameters."""
    resolve = (
        bloom_words if callable(bloom_words) else lambda: bloom_words
    )
    q = (
        read_docs_stream(
            spark, source_path, max_files_per_trigger=max_files_per_trigger
        )
        .writeStream.foreachBatch(
            lambda batch, _id: _decontam_batch(
                batch, resolve(), keep_path, quarantine_path,
                n, k, bits_log2,
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
