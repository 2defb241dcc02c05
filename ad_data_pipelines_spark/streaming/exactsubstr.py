"""Streaming EXACTSUBSTR gate: ingest-time duplicated-span removal
against the accepted corpus — the stream twin of the batch
`operators/dedup.remove_dup_spans` (Lee et al. 2022), the same way
`streaming/neardedup.py` twins `dedup_against_corpus`.

Beyond-reference (SURVEY.md §2.9). A continuously-crawled corpus wants
boilerplate it ALREADY holds excised at ingest, not in a nightly
rewrite. Plan shape (mirrors the near-dedup gate):

  * History is a STATIC distinct-gram table
    (`dedup.corpus_gram_table` — at scale a bucketed parquet artifact
    the upstream batch job republishes). It never streams, and the
    ownership rule is simple: HISTORY OWNS EVERYTHING — any span of an
    incoming doc whose k-gram already exists in the corpus is removed
    from the incoming copy.
  * Each micro-batch explodes its own (small) positions, equi-joins
    them against history grams, and excises merged spans with the
    exact batch back-end (`dedup.excise_spans`) — stream and batch
    rebuilds are identical by construction. Per-batch streaming state
    is ZERO: no aggregation, no watermark, only checkpoint offsets.
  * Docs reduced below `min_kept_chars` route to the drop sink with
    their removal stats as evidence; everything else appends to the
    keep sink with its cleaned text. Exhaustive and disjoint.
  * Spans duplicated between two docs of the SAME batch are the batch
    chain's job when history refreshes — the same documented tradeoff
    as the near-dedup gate. Pass a callable history to re-resolve the
    artifact per trigger.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import dedup as _dedup
from ad_data_pipelines_spark.streaming.quality import read_docs_stream


def exactsubstr_batch_verdicts(
    batch: DataFrame, history_grams: DataFrame, k: int
) -> DataFrame:
    """(doc_id, n_chars, removed_chars, kept_chars, kept_text) for one
    micro-batch against the history gram table — split out so tests
    and backfills can call the exact per-batch computation directly."""
    grams = F.expr(
        f"if(length(text) < {k}, array(), "
        f"transform(sequence(1, length(text) - {k - 1}), "
        f"i -> substring(text, i, {k})))"
    )
    pos = batch.select(
        "doc_id", F.posexplode(grams).alias("p0", "gram")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "gram")
    hits = pos.join(
        history_grams.select("gram"), "gram"
    ).select("doc_id", "p")
    return _dedup.excise_spans(batch, hits, k)


def _gate_batch(
    batch: DataFrame,
    history_grams: DataFrame,
    keep_path: str,
    drop_path: str,
    k: int,
    min_kept_chars: int,
) -> None:
    cleaned = exactsubstr_batch_verdicts(batch, history_grams, k)
    out = (
        batch.drop("text", "n_chars")
        .join(cleaned, "doc_id")
        .persist()
    )
    kept = out.filter(F.col("kept_chars") >= min_kept_chars)
    # keep-sink rows re-establish the docs-schema invariant
    # n_chars == length(text) for the post-excision text; the original
    # length survives as kept_chars + removed_chars
    kept.withColumn("text", F.col("kept_text")).withColumn(
        "n_chars", F.col("kept_chars")
    ).drop("kept_text").write.mode("append").parquet(keep_path)
    out.filter(F.col("kept_chars") < min_kept_chars).drop(
        "kept_text"
    ).write.mode("append").parquet(drop_path)
    out.unpersist()


def run_exactsubstr_gate_available_now(
    spark: SparkSession,
    source_path: str,
    history_grams: DataFrame | Callable[[], DataFrame],
    checkpoint: str,
    keep_path: str,
    drop_path: str,
    k: int = 20,
    min_kept_chars: int = 50,
    max_files_per_trigger: int = 8,
) -> None:
    """Drain available document files through the exactsubstr gate:
    docs append to `keep_path` with history-owned spans excised
    (plus n_chars/removed_chars/kept_chars accounting); docs reduced
    below `min_kept_chars` route to `drop_path` with the same stats as
    evidence.

    Pass a zero-arg callable as `history_grams` to re-resolve the gram
    artifact PER MICRO-BATCH (the long-running ingest shape — an
    upstream batch job republishes `corpus_gram_table` output, e.g.
    `lambda: spark.read.parquet(gram_artifact_path)`); a plain
    DataFrame stays static for the whole drain."""
    resolve = (
        history_grams if callable(history_grams) else lambda: history_grams
    )
    q = (
        read_docs_stream(
            spark, source_path, max_files_per_trigger=max_files_per_trigger
        )
        .writeStream.foreachBatch(
            lambda b, _id: _gate_batch(
                b, resolve(), keep_path, drop_path, k, min_kept_chars
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
