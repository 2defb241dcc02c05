"""Declarative data-quality constraint audit (Deequ / Great-Expectations
territory): evaluate a rule set against a table in ONE aggregate pass
and emit a per-rule violation report — the automated twin of the
reference's manual post-ingest sanity checks (e.g. the row-count and
range eyeballing around `data_ingestion/pg_import.R:230-280` before the
staged swap goes live).

Shapes:
  * `constraint_audit`: every row-local rule compiles to one
    `count_if(NOT coalesce(pred, FALSE))` inside a single wide
    aggregate — partial/final combinable, so a 100 TB table audits in
    one scan regardless of rule count; the 1-row result stack-unpivots
    to a row per rule (same pattern as operators/profile.py). NULL
    predicate results count as violations (a rule that cannot evaluate
    is not satisfied) — `coalesce(pred, FALSE)` pins that semantic in
    both engines.
  * `fk_audit`: referential integrity needs a join, not a scan — the
    orphan count comes from a LEFT ANTI join against the DISTINCT
    parent keys (broadcast when the parent is a dim; at fact-vs-fact
    scale the anti join shuffles only the key columns). Output schema
    matches `constraint_audit`, so reports union into one gate.

A pipeline gates on `violation_rate == 0` for hard rules or a
threshold for soft ones; the report itself stays a DataFrame — no
driver collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("rule_name", "n_rows", "n_violations", "violation_rate")


def constraint_audit(
    df: DataFrame, rules: dict[str, Column | str], round_dp: int = 6
) -> DataFrame:
    """One row per rule: (rule_name, n_rows, n_violations,
    violation_rate). `rules` maps rule name → boolean predicate (Column
    or SQL string) that is TRUE for VALID rows; NULL evaluates as a
    violation."""
    if not rules:
        raise ValueError(
            "constraint_audit: rules must be non-empty (stack(0) is "
            "not valid SQL and an empty audit is almost certainly a "
            "caller bug)"
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (name, pred) in enumerate(rules.items()):
        p = F.expr(pred) if isinstance(pred, str) else pred
        aggs.append(
            F.count_if(~F.coalesce(p, F.lit(False))).alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    parts = []
    for i, name in enumerate(rules):
        lit = "'" + name.replace("'", "''") + "'"
        parts.append(
            f"{lit}, __n, __v{i}, "
            f"ROUND(CAST(__v{i} AS DOUBLE) / __n, {round_dp})"
        )
    return one.selectExpr(
        f"stack({len(rules)}, {', '.join(parts)}) AS "
        f"({', '.join(_REPORT_COLS)})"
    )


def fk_audit(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    rule_name: str,
    round_dp: int = 6,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential-integrity row in the same report schema: orphans =
    child rows (null keys included — an unresolvable reference is a
    violation) with no match among the distinct parent keys.

    `broadcast_parent=True` (default) fits the dim-table case; pass
    False for fact-vs-fact audits so the anti join shuffles the key
    columns instead of trying to broadcast billions of parent keys.
    """
    pk = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        pk = F.broadcast(pk)
    orphans = child.select(child_key).join(pk, child_key, "left_anti")
    n = child.agg(F.count(F.lit(1)).alias("__n"))
    v = orphans.agg(F.count(F.lit(1)).alias("__v"))
    return (
        n.crossJoin(v)
        .selectExpr(
            f"'{rule_name}' AS rule_name",
            "__n AS n_rows",
            "__v AS n_violations",
            f"ROUND(CAST(__v AS DOUBLE) / __n, {round_dp}) AS violation_rate",
        )
    )


def constraint_audit_sql(
    table: str, rules: dict[str, str], round_dp: int = 6
) -> str:
    """DuckDB twin of `constraint_audit` (one UNION ALL branch per rule
    — CSE collapses them to one scan; the Spark side is structurally
    one pass)."""
    branches = []
    for name, pred in rules.items():
        lit = name.replace("'", "''")
        branches.append(f"""
            SELECT '{lit}' AS rule_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) FILTER (
                       WHERE NOT coalesce({pred}, FALSE)) AS BIGINT)
                       AS n_violations,
                   ROUND(CAST(COUNT(*) FILTER (
                       WHERE NOT coalesce({pred}, FALSE)) AS DOUBLE)
                       / COUNT(*), {round_dp}) AS violation_rate
            FROM {table}""")
    return " UNION ALL ".join(branches)


def fk_audit_sql(
    child: str,
    parent: str,
    child_key: str,
    parent_key: str,
    rule_name: str,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of `fk_audit`."""
    lit = rule_name.replace("'", "''")
    return f"""
        SELECT '{lit}' AS rule_name,
               CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_rows,
               CAST((SELECT COUNT(*) FROM {child} c
                     WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                       WHERE p.{parent_key} = c.{child_key}))
                    AS BIGINT) AS n_violations,
               ROUND(CAST((SELECT COUNT(*) FROM {child} c
                     WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                                       WHERE p.{parent_key} = c.{child_key}))
                    AS DOUBLE) / (SELECT COUNT(*) FROM {child}),
                    {round_dp}) AS violation_rate
    """


# --- Order-independent table checksum --------------------------------------

#: unit separator / NULL sentinel for row canonicalization — chosen from
#: control chars that cannot appear in the delimited business data.
_SEP = "\x1f"
_NULL = "\x00"


def _row_fingerprint_cols(cols: list[str]):
    return [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols
    ]


def table_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """(n_rows, checksum): order-independent content checksum — XOR of
    portable md5-derived 60-bit row fingerprints — for validating a
    migration/copy without moving the data ("does the Spark copy equal
    the warehouse original?"). XOR is commutative/associative and
    cannot overflow, so the aggregate is partial/final combinable and
    layout-independent at any scale; two tables with equal checksums
    AND equal row counts match w.h.p. (XOR is blind to rows duplicated
    an even number of times — the count catches the realistic cases,
    and pipelines needing stronger guarantees compare per-partition
    checksums, which this same expression computes under a groupBy).

    Columns are canonicalized as strings joined on an \\x1f unit
    separator with an \\x00 NULL sentinel (concat_ws alone would
    conflate NULL with empty). Restrict `cols` to int/string/date
    columns — float→string rendering is engine-specific; pre-format
    floats (e.g. ROUND + CAST) before checksumming them.
    """
    from ad_data_pipelines_spark.functions.hashing import portable_hash64

    fp = portable_hash64(
        F.concat_ws(_SEP, *_row_fingerprint_cols(cols))
    )
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.bit_xor(fp).alias("checksum"),
    )


def table_checksum_sql(table: str, cols: list[str]) -> str:
    """DuckDB twin of `table_checksum` (same canonicalization)."""
    rendered = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), chr(0))" for c in cols
    )
    return f"""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               bit_xor(CAST('0x' || substr(md5(
                   concat_ws(chr(31), {rendered})), 1, 15) AS BIGINT))
                   AS checksum
        FROM {table}
    """
