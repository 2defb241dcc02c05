"""Column profiling: per-column completeness / cardinality / range in
ONE aggregate pass — the data-quality summary every warehouse runs
before trusting a feed (Deequ/Great-Expectations territory, and the
distributed twin of the reference's ad-hoc `summary()` checks during
ingestion review).

Shape: one wide `agg` computes (count, non-null count, distinct,
min, max) for every profiled column — partial/final combinable, so a
100 TB table profiles in a single scan — then the 1-row result unpivots
driver-side-free via `stack` into one tidy row per column. min/max
compute on the NATIVE type (numeric ordering, not lexicographic) and
cast to string only for the uniform output schema.

`exact=False` (production default at scale) swaps COUNT(DISTINCT) for
approx_count_distinct: n exact distincts over one table each add an
Expand pass, where the HLL sketches merge in the same single scan. The
exact form exists for the DuckDB oracle and small dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """One row per profiled column:
    (col_name, n_rows, n_nulls, n_distinct, min_value, max_value)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        qc = F.col(_q(c))
        nd = (
            F.count_distinct(qc)
            if exact
            else F.approx_count_distinct(qc)
        )
        tag = c.replace("`", "")
        aggs += [
            F.count(qc).alias(f"{tag}__nn"),
            nd.alias(f"{tag}__nd"),
            F.min(qc).cast("string").alias(f"{tag}__min"),
            F.max(qc).cast("string").alias(f"{tag}__max"),
        ]
    one = df.agg(*aggs)
    # unpivot the single row with stack — stays a (tiny) DataFrame op,
    # no driver collect
    parts = []
    for c in cols:
        tag = c.replace("`", "")
        lit = "'" + c.replace("'", "''") + "'"
        parts.append(
            f"{lit}, __n, __n - {_q(tag + '__nn')}, {_q(tag + '__nd')}, "
            f"{_q(tag + '__min')}, {_q(tag + '__max')}"
        )
    stacked = one.selectExpr(
        f"stack({len(cols)}, {', '.join(parts)}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
    return stacked


def profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB twin of `profile(exact=True)`: one UNION ALL branch per
    column (DuckDB computes them over one scan via CSE; the Spark side
    is structurally one pass)."""
    branches = []
    for c in columns:
        branches.append(f"""
            SELECT '{c}' AS col_name,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   CAST(MIN({c}) AS VARCHAR) AS min_value,
                   CAST(MAX({c}) AS VARCHAR) AS max_value
            FROM {table}""")
    return " UNION ALL ".join(branches)
