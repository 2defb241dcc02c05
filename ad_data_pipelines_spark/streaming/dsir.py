"""Streaming DSIR ingest gate: score arriving documents against a
batch-fit importance model and route them by log-weight threshold.

Beyond-reference (SURVEY.md north star). The DSIR recipe splits
cleanly across batch and stream: FITTING the model
(`classify.dsir_bucket_weights`) needs two whole corpora and runs as a
batch job whose output is a ≤n_features-row (bucket, w) table —
a KB-scale artifact, the same deployment shape as the NB classifier
weights; SCORING is doc-local given that table (gram explode +
broadcast join + per-doc sum), so it rides the ingest stream via
`foreachBatch` with ZERO streaming state — results identical to batch
`classify.dsir_score` by construction, because every doc's score
depends only on its own grams and the broadcast model.

The threshold router mirrors `streaming/quality.py`'s keep/quarantine
contract: both writes happen inside one foreachBatch call on the same
micro-batch, so the split is exhaustive and disjoint. Docs with zero
tokens produce no gram rows and therefore no score — they route to
the below-threshold side with log_w NULL, visible for triage rather
than silently dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators import classify as _cls
from ad_data_pipelines_spark.streaming.quality import (
    DOCS_SCHEMA,
    read_docs_stream,
)

__all__ = ["read_docs_stream", "DOCS_SCHEMA", "run_dsir_gate_available_now"]


def _gate_batch(
    batch: DataFrame,
    weights: DataFrame,
    n_features: int,
    min_log_w: float,
    keep_path: str,
    rest_path: str,
) -> None:
    """One micro-batch through the gate: exhaustive, disjoint split on
    the DSIR log-weight. Scores come from the shared batch scorer, so
    stream and batch agree bit-for-bit."""
    scored = _cls.dsir_score(batch, weights, n_features).persist()
    docs = batch.join(scored, "doc_id", "left")
    keep = F.col("log_w").isNotNull() & (F.col("log_w") >= min_log_w)
    docs.filter(keep).write.mode("append").parquet(keep_path)
    docs.filter(~keep | F.col("log_w").isNull()).write.mode(
        "append"
    ).parquet(rest_path)
    scored.unpersist()


def run_dsir_gate_available_now(
    spark: SparkSession,
    source_path: str,
    weights: DataFrame,
    checkpoint: str,
    keep_path: str,
    rest_path: str,
    n_features: int = 4096,
    min_log_w: float = 0.0,
) -> None:
    """Drain available document files through the DSIR gate: docs
    scoring ≥ `min_log_w` under the broadcast importance model append
    to `keep_path` (with their n_grams/log_w columns), the rest —
    including zero-token docs with NULL log_w — to `rest_path`.
    `weights` is a batch-fit `dsir_bucket_weights` table; refreshing
    the target domain means refitting that table and restarting the
    stream, never touching streaming state (there is none)."""
    q = (
        read_docs_stream(spark, source_path)
        .writeStream.foreachBatch(
            lambda b, _id: _gate_batch(
                b, weights, n_features, min_log_w, keep_path, rest_path
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
