"""Corpus snapshot diff — added / removed / changed / unchanged rows
between two versions of a keyed dataset (beyond-reference: the
data-versioning audit every recurring crawl/training-corpus refresh
needs before shipping a new snapshot; the batch twin of the reference's
first-seen tracking, sources/firstseen.py ←
`data_ingestion/folder_import.R:9-213`'s incremental import ledger).

Scale shape: each side fingerprints its payload MAP-SIDE (md5-derived
60-bit long via `functions.hashing.portable_hash64`) and projects to
(key, fingerprint) BEFORE the full-outer join — so the shuffle moves
two longs per row and the payload text/bytes never enter an exchange,
the same discipline as the dedup chain. Status is a null-pattern CASE
on the joined fingerprints; no driver collect, no window.

The fingerprint is the portable md5 path (not xxhash64) per the repo
invariant: oracle-facing hashing must be engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ad_data_pipelines_spark.functions.hashing import portable_hash64


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    payload: str = "text",
) -> DataFrame:
    """One row per key seen in either snapshot:
    (key, status ∈ added|removed|changed|unchanged, old_fp, new_fp).

    `added` = key only in `new`; `removed` = only in `old`; `changed` =
    both sides present with differing payload fingerprints.

    A NULL payload fingerprints a NULL SENTINEL, not NULL: presence is
    decided by the key, so a key whose payload is NULL on one side is
    `changed` (or `unchanged` when NULL on both) — never misreported
    as added/removed (a NULL fingerprint would make the null-pattern
    CASE fire the wrong branch).
    """
    sentinel = F.lit("\x00NULL")
    o = old.select(
        F.col(key),
        portable_hash64(F.coalesce(F.col(payload), sentinel)).alias(
            "old_fp"
        ),
    )
    n = new.select(
        F.col(key),
        portable_hash64(F.coalesce(F.col(payload), sentinel)).alias(
            "new_fp"
        ),
    )
    joined = o.join(n, on=key, how="full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col(key), status.alias("status"), "old_fp", "new_fp"
    )


def snapshot_diff_summary(diff: DataFrame) -> DataFrame:
    """Roll a `snapshot_diff` result up to (status, n_keys) — the
    one-screen release gate ("this refresh changes 3% of the corpus")."""
    return diff.groupBy("status").agg(
        F.count("*").cast("bigint").alias("n_keys")
    )


def snapshot_diff_sql(
    old_pred: str, new_pred: str, new_text_expr: str = "text"
) -> str:
    """DuckDB twin of `snapshot_diff` where both snapshots are carved
    out of the `documents` table: `old` = rows matching `old_pred`,
    `new` = rows matching `new_pred` with payload `new_text_expr`."""
    return f"""
        WITH old AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(coalesce(text, chr(0) || 'NULL')),
                        1, 15) AS BIGINT) AS old_fp
            FROM documents WHERE {old_pred}
        ),
        new AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(coalesce({new_text_expr},
                        chr(0) || 'NULL')), 1, 15) AS BIGINT) AS new_fp
            FROM documents WHERE {new_pred}
        )
        SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
               CASE WHEN old_fp IS NULL THEN 'added'
                    WHEN new_fp IS NULL THEN 'removed'
                    WHEN old_fp = new_fp THEN 'unchanged'
                    ELSE 'changed' END AS status,
               old_fp, new_fp
        FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """
