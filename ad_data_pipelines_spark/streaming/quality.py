"""Streaming document-ingest quality gate: the Structured Streaming twin
of the batch keep-or-drop verdict (plans/testdata_queries.py
llm_quality_filter).

Beyond-reference (SURVEY.md §2.9). A training-data pipeline ingests
documents continuously; the quality verdict must ride the ingest stream,
not a nightly batch. Every quality signal here is DOC-LOCAL (each doc's
words/chars/grams — no cross-doc state), which picks the plan shape:

  * NOT a streaming aggregation — per-doc explode→groupBy(doc_id) would
    force watermarks and state for keys that are each seen exactly once;
  * instead, `foreachBatch` applies the exact batch operators
    (quality_features, char_entropy, repetition_signals) to each
    micro-batch — results are identical to the batch pipeline by
    construction because documents are self-contained rows, and state is
    ZERO regardless of stream length.

The sink appends per-doc verdicts; quarantining (routing fails to a
side table) is one extra filtered write in the same batch function —
both writes see the same micro-batch, so a doc can never land in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ad_data_pipelines_spark.operators import textstats as _ts

#: documents stream schema (streams must declare schemas — no inference)
DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_docs_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _gate_batch(batch: DataFrame, keep_path: str, quarantine_path: str) -> None:
    """One micro-batch through the gate: exhaustive, disjoint split of
    the batch into kept docs (original columns) and quarantined docs
    (plus their rule flags, for triage)."""
    verdicts = _ts.quality_verdicts(batch).persist()
    docs = batch.join(verdicts, "doc_id")
    docs.filter(F.col("pass")).drop(
        "ok_len", "ok_tok", "ok_entropy", "ok_rep", "pass"
    ).write.mode("append").parquet(keep_path)
    docs.filter(~F.col("pass")).write.mode("append").parquet(quarantine_path)
    verdicts.unpersist()


def run_quality_gate_available_now(
    spark: SparkSession,
    source_path: str,
    checkpoint: str,
    keep_path: str,
    quarantine_path: str,
) -> None:
    """Drain available document files through the quality gate: passing
    docs append to `keep_path`, failing docs (with their rule flags) to
    `quarantine_path`. Both writes happen inside one foreachBatch call
    on the same micro-batch frame, so the split is exhaustive and
    disjoint; the parquet appends are per-batch idempotent only via the
    checkpoint (standard Spark file-sink semantics)."""

    q = (
        read_docs_stream(spark, source_path)
        .writeStream.foreachBatch(
            lambda batch, _id: _gate_batch(batch, keep_path, quarantine_path)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
