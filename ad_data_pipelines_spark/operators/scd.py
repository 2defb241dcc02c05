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


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    effective_col: str = "effective",
) -> DataFrame:
    """Apply one change batch to an SCD2 history (the S14 + S16
    composition: incremental history maintenance, the warehouse's
    daily dimension load): returns the NEW full history with the same
    (keys, attrs, valid_from, valid_to) schema.

    Per key with a change row (`changes`: keys + attrs +
    `effective_col`; at most one row per key — collapse upstream with
    `merge.latest_change_per_key`):
      * attrs EQUAL the key's current interval → no-op (re-sending an
        unchanged snapshot must not fragment the history — this is
        what makes daily re-loads idempotent),
      * attrs differ → the current interval closes at the effective
        time (valid_to = effective) and a new open interval starts
        there,
      * unknown key → a new open interval (valid_from = effective),
      * STALE change (effective ≤ the current interval's valid_from)
        → ignored: an out-of-order or replayed old batch cannot
        rewrite history backwards — this is what makes stream replay
        (`streaming/cdc.run_scd2_apply_available_now`) safe.
    Closed intervals are immutable: only each key's CURRENT row can
    be touched, so genuinely late corrections need the batch rebuild
    (`scd2_history`) instead — stated, not hidden.

    Plan shape: the change batch broadcasts (same contract as
    merge_plan's default); history rows join it map-side — the stored
    history NEVER shuffles. Null-safe attr comparison mirrors
    `scd2_history`.
    """
    keys = list(keys)
    attrs = list(attrs)
    chg = changes.select(
        *keys,
        *[F.col(a).alias(f"__c_{a}") for a in attrs],
        F.col(effective_col).alias("__eff"),
    )
    j = history.join(F.broadcast(chg), keys, "left")
    same = F.struct(*attrs).eqNullSafe(
        F.struct(*[F.col(f"__c_{a}").alias(a) for a in attrs])
    )
    is_current = F.col("valid_to").isNull()
    # existing rows: close the current interval iff attrs changed AND
    # the change is newer than the interval (stale changes ignored)
    kept = j.select(
        *keys,
        *attrs,
        "valid_from",
        F.when(
            is_current
            & F.col("__eff").isNotNull()
            & (F.col("__eff") > F.col("valid_from"))
            & ~same,
            F.col("__eff"),
        )
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
    )
    # new open intervals: changed keys + brand-new keys. The history's
    # current rows are first SEMI-REDUCED to the change keys (map-side
    # against the broadcast batch — the big history never broadcasts
    # and never shuffles), leaving ≤|changes| rows that can safely
    # broadcast into the change batch with an explicit presence flag.
    relevant_current = (
        history.filter(is_current)
        .join(F.broadcast(chg.select(*keys)), keys, "leftsemi")
        .select(
            *keys,
            F.struct(*attrs).alias("__h_attrs"),
            F.col("valid_from").alias("__h_from"),
            F.lit(True).alias("__h_present"),
        )
    )
    opened = (
        chg.join(F.broadcast(relevant_current), keys, "left")
        .filter(
            F.col("__h_present").isNull()
            | (
                (F.col("__eff") > F.col("__h_from"))
                & ~F.col("__h_attrs").eqNullSafe(
                    F.struct(
                        *[F.col(f"__c_{a}").alias(a) for a in attrs]
                    )
                )
            )
        )
        .select(
            *keys,
            *[F.col(f"__c_{a}").alias(a) for a in attrs],
            F.col("__eff").alias("valid_from"),
            F.lit(None).cast(dict(history.dtypes)["valid_to"]).alias(
                "valid_to"
            ),
        )
    )
    return kept.unionByName(opened).select(*history.columns)
