"""SCD Type-2 history assembly: collapse per-key snapshots into
[valid_from, valid_to) attribute intervals — the "what did this row
look like on date X" table every warehouse eventually needs.

Beyond-reference: the reference tracks only first appearance
(first-seen create_time store,
scripts/ads_passenger_travel_distance_di.py:26-52 — our S13,
sources/firstseen.py). SCD-2 is its full-history generalization.

Gaps-and-islands, Spark-first, ONE shuffle: callers should
`repartition(keys)` (or arrive already key-partitioned) and every
window here — change detection, run grouping, interval close — asks
only for key-subset clustering, which that single partitioning
satisfies; Catalyst inserts no further Exchange. A naive
snapshot-vs-snapshot self-join per day would scan the history once
per snapshot instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    snapshots: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    order_col: str,
) -> DataFrame:
    """One row per (key, run of identical attrs): the attrs plus
    `valid_from` (first snapshot of the run) and `valid_to` (start of
    the next run, NULL while current — right-open intervals).

    `snapshots` must be unique per (keys, order_col) — dedup upstream
    with a deterministic keep policy (SURVEY §4.4-6). Attribute
    comparison is null-safe: NULL → value and value → NULL both open
    a new interval.
    """
    keys = list(keys)
    attrs = list(attrs)
    w = Window.partitionBy(*keys).orderBy(order_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a = F.struct(*attrs)
    changed = (~a.eqNullSafe(F.lag(a).over(w))).cast("int")
    with_runs = snapshots.withColumn(
        "__run", F.sum(changed).over(run)
    )
    w_run = Window.partitionBy(*keys, "__run").orderBy(order_col)
    firsts = (
        with_runs.withColumn("__rn", F.row_number().over(w_run))
        .filter(F.col("__rn") == 1)
        .withColumnRenamed(order_col, "valid_from")
    )
    w_key = Window.partitionBy(*keys).orderBy("valid_from")
    return firsts.select(
        *keys,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w_key).alias("valid_to"),
    )


def scd2_history_sql(
    keys: str, attrs: str, order_col: str, source: str
) -> str:
    """Oracle twin (DuckDB): same gaps-and-islands shape. `keys` and
    `attrs` are comma-joined column lists; `source` a relation or
    subquery unique per (keys, order_col)."""
    attr_tuple = f"({attrs})"
    return f"""
        WITH flagged AS (
            SELECT *, CASE WHEN {attr_tuple} IS NOT DISTINCT FROM
                                LAG({attr_tuple}) OVER w
                           THEN 0 ELSE 1 END AS chg
            FROM {source}
            WINDOW w AS (PARTITION BY {keys} ORDER BY {order_col})
        ),
        runs AS (
            SELECT *, SUM(chg) OVER (
                PARTITION BY {keys} ORDER BY {order_col}
                ROWS UNBOUNDED PRECEDING
            ) AS run_id
            FROM flagged
        ),
        firsts AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY {keys}, run_id ORDER BY {order_col}
            ) AS rn
            FROM runs
        )
        SELECT {keys}, {attrs}, {order_col} AS valid_from,
               LEAD({order_col}) OVER (
                   PARTITION BY {keys} ORDER BY {order_col}
               ) AS valid_to
        FROM firsts WHERE rn = 1
    """
