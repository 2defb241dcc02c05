"""Sequence packing: map documents onto fixed-token-budget training
sequences (GPT-style concat-and-chunk).

Beyond-reference (BASELINE.json north star): the final step of an LLM
training-data pipeline — concatenate the corpus in a canonical order and
cut it into `seq_tokens`-token sequences; each document then spans
sequences [first_seq, last_seq]. The interesting part at 100 TB is the
GLOBAL prefix sum of token counts, which must NOT be a single-partition
window (`Window.orderBy(...)` with no partitionBy collapses the whole
corpus into one task). Implemented as the classic two-phase scan:

  1. range-shard on the order key (shard = order_key div shard_span —
     monotonic, so shard order preserves global order),
  2. within-shard exclusive running sum (bounded window partitions),
  3. per-shard totals (tiny agg) → exclusive shard offsets (window over
     n_shards rows, the only single-partition step — kilobytes),
  4. broadcast-join offsets back; global offset = shard_offset + within.

Token counts use the whitespace tokenizer (operators/textstats) so the
budget agrees with the rest of the registry; swap in bpe_token_count for
subword budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ad_data_pipelines_spark.operators.textstats import token_count


def pack_sequences(
    docs: DataFrame,
    seq_tokens: int = 2048,
    order_col: str = "doc_id",
    shard_span: int = 1000,
) -> DataFrame:
    """Assign each doc its global token offset and the training-sequence
    range it lands in after concat-and-chunk at `seq_tokens`.

    Returns (doc_id, n_tokens, tok_offset, first_seq, last_seq) —
    deterministic in the canonical `order_col` order, independent of
    partitioning; `shard_span` only tunes window-partition size.
    """
    toks = docs.select(
        F.col(order_col),
        token_count("text").cast("bigint").alias("n_tokens"),
        F.floor(F.col(order_col) / shard_span).alias("shard"),
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    shard_totals = toks.groupBy("shard").agg(F.sum("n_tokens").alias("sh_toks"))
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_offsets = shard_totals.select(
        "shard",
        F.coalesce(F.sum("sh_toks").over(w_sh), F.lit(0)).alias("sh_offset"),
    )
    out = (
        toks.withColumn("within", within)
        .join(F.broadcast(shard_offsets), "shard")
        .select(
            order_col,
            "n_tokens",
            (F.col("sh_offset") + F.col("within")).alias("tok_offset"),
        )
    )
    # Exact BIGINT division — a double quotient can round across an
    # integer boundary at large corpus offsets (~2^53 tokens). Both
    # numerators are non-negative (empty docs clamp to a 1-token span,
    # so last_seq == first_seq), making DIV truncation == floor and
    # engine-portable.
    b = int(seq_tokens)
    return out.select(
        order_col,
        "n_tokens",
        "tok_offset",
        F.expr(f"tok_offset DIV {b}").cast("bigint").alias("first_seq"),
        F.expr(f"(tok_offset + greatest(n_tokens, 1) - 1) DIV {b}")
        .cast("bigint")
        .alias("last_seq"),
    )


def budget_select(
    df: DataFrame,
    budget: int,
    score_col: str = "score",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    shard_buckets: int = 64,
) -> DataFrame:
    """Greedy data selection under a token budget: rank rows by
    (score DESC, id ASC) and keep the maximal prefix whose cumulative
    token count stays ≤ `budget` — the "train on the best N tokens"
    step of corpus curation (quality-ranked selection with a hard
    compute budget).

    The cumulative sum over a GLOBAL score order is the same prefix-sum
    problem `pack_sequences` solves, and it reuses the same two-phase
    scan: rows range-shard on the score (shard index monotone in the
    sort order, so shard order preserves global order), the running sum
    windows WITHIN shards, and only the per-shard totals — `shard_
    buckets` rows — pass through a single-partition window. Shard
    boundaries never affect results (offsets are exact integers
    regardless of where a shard splits), so the min/max probe that
    scales the shard index needs no cross-engine parity; it is one
    column-pruned aggregate (footer-stats cheap under parquet
    aggregate pushdown when scoring straight off a scan).
    """
    # NULL scores are unrankable: a NULL shard index would silently
    # drop the row at the shard-offsets join. Reject loudly — the
    # caller decides the imputation policy, this operator must not.
    n_null = df.filter(F.col(score_col).isNull()).limit(1).count()
    if n_null:
        raise ValueError(
            f"budget_select: {score_col} contains NULLs — impute or "
            "filter them before ranking (a NULL cannot be ordered)"
        )
    lo, hi = df.agg(
        F.min(F.col(score_col).cast("double")),
        F.max(F.col(score_col).cast("double")),
    ).first()
    if lo is None:  # empty input: keep the (empty) frame, schema intact
        return df.select(
            id_col,
            score_col,
            # same bigint cast as the non-empty path — the two
            # branches must union cleanly
            F.col(tokens_col).cast("bigint").alias(tokens_col),
            F.lit(None).cast("bigint").alias("cum_tokens"),
        ).limit(0)
    span = (hi - lo) or 1.0
    shard = F.least(
        F.floor(
            (F.lit(hi) - F.col(score_col).cast("double")) / span * shard_buckets
        ),
        F.lit(shard_buckets - 1),
    ).cast("bigint")
    ranked = df.select(
        id_col,
        score_col,
        F.col(tokens_col).cast("bigint").alias(tokens_col),
        shard.alias("shard"),
    )
    w_in = (
        Window.partitionBy("shard")
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = F.sum(tokens_col).over(w_in)
    shard_totals = ranked.groupBy("shard").agg(
        F.sum(tokens_col).alias("sh_toks")
    )
    w_sh = Window.orderBy("shard").rowsBetween(Window.unboundedPreceding, -1)
    shard_offsets = shard_totals.select(
        "shard",
        F.coalesce(F.sum("sh_toks").over(w_sh), F.lit(0)).alias("sh_offset"),
    )
    return (
        ranked.withColumn("within", within)
        .join(F.broadcast(shard_offsets), "shard")
        .select(
            id_col,
            score_col,
            tokens_col,
            (F.col("sh_offset") + F.col("within")).alias("cum_tokens"),
        )
        .filter(F.col("cum_tokens") <= budget)
    )


def budget_select_sql(budget: int) -> str:
    """DuckDB twin over the documents table: score = n_chars, tokens =
    the whitespace count — one running sum over the same (score DESC,
    doc_id) order (range sharding is order-preserving, so results are
    identical by construction)."""
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   n_chars AS score,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                        AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, score, n_tokens,
                   CAST(SUM(n_tokens) OVER (
                       ORDER BY score DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM toks
        )
        SELECT doc_id, score, n_tokens, cum_tokens
        FROM c WHERE cum_tokens <= {budget}
    """


def pack_sequences_sql(seq_tokens: int = 2048) -> str:
    """DuckDB twin: the two-phase scan reduces to one running sum over
    the same canonical order (range sharding is order-preserving, so
    results are identical by construction)."""
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\\s+'))
                        AS BIGINT) AS n_tokens
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS tok_offset
            FROM toks
        )
        SELECT doc_id, n_tokens, tok_offset,
               CAST(tok_offset // {seq_tokens} AS BIGINT) AS first_seq,
               CAST((tok_offset + greatest(n_tokens, 1) - 1) // {seq_tokens}
                   AS BIGINT) AS last_seq
        FROM c
    """
