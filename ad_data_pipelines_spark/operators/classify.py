"""Model-based document scoring: hashed-feature Naive Bayes text
classifier, trained AND applied as pure DataFrame aggregation.

Beyond-reference (SURVEY.md north star). Modern corpus curation
(CCNet, DCLM, FineWeb) filters with a lightweight linear text
classifier — "does this look like reference text / the target
domain?" — not just rule features (`textstats.quality_features`).
The fasttext-style recipe maps exactly onto Spark:

  * features — the HASHING TRICK: token → md5 bucket in
    [0, n_features); no vocabulary object to build, broadcast, or
    version, and the md5-portable path makes the oracle reproduce
    buckets bit-for-bit (swap `fast=True` xxhash64 in production).
  * training — multinomial NB log-odds are ONE aggregate over the
    labeled corpus: per-bucket occurrence counts by class + add-α
    smoothing. No gradient loop, no driver-side state; retraining on
    100 TB is a groupBy.
  * scoring — score(doc) = prior + Σ_tokens w(bucket(token)): one
    token explode, one broadcast join against the (≤ n_features)-row
    weight table, one per-doc sum. When training and scoring run over
    the SAME corpus (self-scoring, the registry query), pass one
    persisted `token_buckets` table into both so the corpus explodes
    ONCE. Whole-stage codegen throughout;
    the corpus text never shuffles (only doc_id + bucket ids reach
    the aggregate).

score > 0 reads "more likely positive-class than negative". The
decision threshold, like any filter knob, should be validated against
held-out labels (`llm_nb_quality` surfaces per-class score means and
above-threshold rates for exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions.hashing import portable_hash64


def token_buckets(
    docs: DataFrame, n_features: int = 1024, text_col: str = "text"
) -> DataFrame:
    """(doc_id, bucket): one row per token OCCURRENCE, token hashed to
    [0, n_features) — the hashing-trick featurizer shared by training
    and scoring."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(text_col)), r"\s+"),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    )
    return toks.select(
        "doc_id",
        F.pmod(portable_hash64("tok"), F.lit(n_features)).alias("bucket"),
    )


def train_nb(
    docs: DataFrame,
    label: F.Column,
    n_features: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    buckets: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial-NB log-odds weights on `docs` with boolean
    `label` (positive class where true). Returns (weights, consts):

      weights: (bucket, w) for every bucket seen in training, where
        w = ln((c_pos+α)/(N_pos+α·F)) − ln((c_neg+α)/(N_neg+α·F)),
      consts: ONE row (prior, w_unseen) — the class-prior log-odds
        and the weight every bucket ABSENT from training inherits
        (the same smoothing formula with c=0), kept separate so the
        scoring join can coalesce instead of densifying all F
        buckets.

    One aggregate over the corpus; both outputs are tiny (≤ F rows)
    and broadcastable."""
    lb = docs.withColumn("__pos", label)
    tb = (
        buckets
        if buckets is not None
        else token_buckets(lb, n_features, text_col)
    )
    b = tb.join(lb.select("doc_id", "__pos"), "doc_id")
    per_bucket = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("c_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("c_neg"),
    )
    totals = b.agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("n_neg"),
    )
    doc_totals = lb.agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).alias("d_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).alias("d_neg"),
    )
    a, ff = float(alpha), float(n_features)
    weights = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("c_pos") + a) / (F.col("n_pos") + a * ff))
            - F.log((F.col("c_neg") + a) / (F.col("n_neg") + a * ff))
        ).alias("w"),
    )
    consts = totals.crossJoin(F.broadcast(doc_totals)).select(
        F.log(
            (F.col("d_pos") + 1.0) / (F.col("d_neg") + 1.0)
        ).alias("prior"),
        (
            F.log(F.lit(a) / (F.col("n_pos") + a * ff))
            - F.log(F.lit(a) / (F.col("n_neg") + a * ff))
        ).alias("w_unseen"),
    )
    return weights, consts


def nb_score(
    docs: DataFrame,
    weights: DataFrame,
    consts: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    buckets: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, score): prior + Σ_token w(bucket); buckets unseen in
    training contribute w_unseen. Empty docs score the bare prior.
    Weight table broadcasts; only (doc_id, bucket) pairs shuffle."""
    b = (
        buckets
        if buckets is not None
        else token_buckets(docs, n_features, text_col)
    )
    summed = (
        b.join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("__n"),
            F.sum(F.col("w").isNull().cast("int")).alias("__n_unseen"),
            F.sum(F.coalesce("w", F.lit(0.0))).alias("__w_sum"),
        )
    )
    return (
        docs.select("doc_id")
        .join(summed, "doc_id", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            (
                F.col("prior")
                + F.coalesce("__w_sum", F.lit(0.0))
                + F.coalesce("__n_unseen", F.lit(0)) * F.col("w_unseen")
            ).alias("score"),
        )
    )
