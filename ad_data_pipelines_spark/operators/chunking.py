"""Document chunking: split text into fixed-size overlapping windows
with deterministic chunk ids — the retrieval/embedding prep stage every
RAG or context-window-bounded training pipeline runs before encoding.

Beyond-reference (the reference processes row-shaped transit data,
never long documents). Spark-first: the chunk index list is a
`sequence()` array exploded JVM-side — no Python in the path, so a
100 TB corpus chunks inside whole-stage codegen with the explode's
output rows pipelined straight into the next stage (tokenize/embed).
Chunk count per doc is computed from `n_chars` arithmetic, NOT by
materializing chunk text first, so the explode is the only
row-multiplying step.

Chunk ids are content-independent (`doc_id:chunk_idx`) — stable across
re-chunks of identical text, and computed with the md5-portable path
(CLAUDE.md invariant) so oracles can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_chars: int = 256,
    overlap: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, chunk): chunk_idx, chunk_id, chunk_text.

    Windows start every `chunk_chars - overlap` characters; the last
    window may be short. Docs shorter than one window yield exactly one
    chunk (possibly empty text for empty docs — the filter policy
    belongs to the caller, not the chunker).
    """
    if overlap >= chunk_chars:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_chars ({chunk_chars})"
        )
    step = chunk_chars - overlap
    n = F.length(F.coalesce(F.col(text_col), F.lit("")))
    # ceil((n - overlap) / step) in pure integer math, floored at 1
    n_chunks = F.greatest(
        F.lit(1), (n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)
    ).cast("bigint")
    return (
        docs.withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)),
        )
        .withColumn(
            "chunk_text",
            F.substring(
                F.col(text_col),
                (F.col("chunk_idx") * step + 1).cast("int"),
                chunk_chars,
            ),
        )
        .withColumn(
            "chunk_id",
            F.md5(F.concat_ws(":", F.col(id_col), F.col("chunk_idx"))),
        )
    )


def chunk_documents_sql(chunk_chars: int = 256, overlap: int = 64) -> str:
    """Oracle twin (DuckDB): same windows via generate_series."""
    step = chunk_chars - overlap
    return f"""
        SELECT doc_id, chunk_idx,
               md5(doc_id || ':' || chunk_idx) AS chunk_id,
               substr(text, CAST(chunk_idx * {step} + 1 AS INT),
                      {chunk_chars}) AS chunk_text
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(
                       0, GREATEST(1, (length(coalesce(text, ''))
                                       - {overlap} + {step - 1}) // {step}) - 1
                   )) AS chunk_idx
            FROM documents
        )
    """


def chunk_by_tokens(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-granularity chunking: windows of `chunk_tokens` whitespace
    tokens with `overlap` tokens shared — context windows are counted
    in tokens, so this is the variant an embedding/training pipeline
    actually schedules. Same codegen-only shape as `chunk_documents`
    (sequence+explode over a word array; slice+rejoin instead of
    substring); empty/null docs yield one empty chunk.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    step = chunk_tokens - overlap
    words = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    # split('') yields [''] — treat as zero tokens
    n = F.when(
        (F.size(words) == 1) & (F.element_at(words, 1) == ""), 0
    ).otherwise(F.size(words))
    n_chunks = F.greatest(
        F.lit(1), (n - F.lit(overlap) + F.lit(step - 1)) / F.lit(step)
    ).cast("bigint")
    return (
        docs.withColumn("__w", words)
        .withColumn(
            "chunk_idx",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)),
        )
        .withColumn(
            "chunk_text",
            F.concat_ws(
                " ",
                F.slice(
                    F.col("__w"),
                    (F.col("chunk_idx") * step + 1).cast("int"),
                    chunk_tokens,
                ),
            ),
        )
        .withColumn("n_chunk_tokens",
                    F.least(F.lit(chunk_tokens),
                            (n - F.col("chunk_idx") * step).cast("bigint")))
        .withColumn(
            "chunk_id",
            F.md5(F.concat_ws(":", F.col(id_col), F.col("chunk_idx"))),
        )
        .drop("__w")
    )


def chunk_by_tokens_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """Oracle twin (DuckDB)."""
    step = chunk_tokens - overlap
    return f"""
        SELECT doc_id, chunk_idx,
               md5(doc_id || ':' || chunk_idx) AS chunk_id,
               array_to_string(
                   w[CAST(chunk_idx * {step} + 1 AS INT)
                     :CAST(chunk_idx * {step} + {chunk_tokens} AS INT)],
                   ' ') AS chunk_text,
               LEAST({chunk_tokens}, n - chunk_idx * {step})
                   AS n_chunk_tokens
        FROM (
            SELECT doc_id, w, n,
                   unnest(generate_series(
                       0, GREATEST(1, (n - {overlap} + {step - 1})
                                      // {step}) - 1)) AS chunk_idx
            FROM (
                SELECT doc_id,
                       regexp_split_to_array(trim(coalesce(text, '')),
                                             '\\s+') AS w,
                       CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                            ELSE len(regexp_split_to_array(
                                trim(coalesce(text, '')), '\\s+'))
                       END AS n
                FROM documents
            )
        )
    """
