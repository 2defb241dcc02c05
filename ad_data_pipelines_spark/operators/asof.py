"""Backward as-of join — "for each left row, the most recent right row
at or before it" — the temporal-enrichment primitive (price-at-time,
last-config-before-event, attribution lookback).

Beyond-reference: the reference has only equi-joins (SURVEY.md §2.3 /
survey line 169 — "No sort-merge/range/as-of/theta joins exist"), but
any event pipeline needs this the moment two feeds tick at different
rates.

Spark-first plan, NO range-condition join anywhere:

    union(left rows, right rows) tagged by side
      → one window per key ordered by (ts, side):
          match = last(struct(right cols), ignoreNulls) over
                  rows unbounded-preceding..current
      → keep left rows, unpack the struct

A naive `left.join(right, key AND rts <= ts)` explodes to O(|L|·|R|)
per key and forces a per-row max — at 100 TB that's the job that never
finishes. The union-window form is ONE shuffle on the key (the same
hash partitioning both inputs already want), a per-partition sort, and
a linear scan; it is also how a sort-merge as-of would be scheduled by
hand. The matched right columns travel inside ONE struct so a NULL
payload column in the matching row cannot make `last(..., ignoreNulls)`
skip past it to an older row.

Tie policy: a right row AT the left timestamp matches (rts <= ts,
DuckDB ASOF semantics — the oracle twin). Callers wanting determinism
when several right rows share (key, rts) should pre-dedup the right
side (see `q_j15_asof_enrich` — row_number keep-max, SURVEY §4.4-6).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: Column | None = None,
    right_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """left rows + `right_cols` of the latest right row with
    right[right_ts] <= left[left_ts] per `on` key (NULLs when no such
    row, or when it is older than `tolerance`, an INTERVAL column).

    `right_cols` must not collide with left column names (rename on
    the right side first); `right_ts` itself is surfaced as
    `asof_ts` so callers can compute lags.

    `right_tiebreak`: extra right-side order columns for determinism
    when several right rows share (key, right_ts) — the LARGEST
    tiebreak wins (they sort ascending inside the running frame and
    `last` takes the latest). This replaces a separate
    row_number-dedup window, which would cost its own shuffle on
    (key, ts); folded into the as-of window the whole join stays at
    ONE exchange.
    """
    clash = (set(right_cols) | {"asof_ts"}) & set(left.columns)
    if clash:
        # NB: `on` ⊆ left.columns, so this also rejects join keys
        # passed in right_cols (they're already in the output).
        raise ValueError(
            f"output columns collide with left columns: {sorted(clash)}"
        )
    on = list(on)
    payload = F.struct(
        F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in right_cols]
    )
    tbs = [f"__tb{i}" for i in range(len(right_tiebreak))]
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(a) for c, a in zip(right_tiebreak, tbs)],
        payload.alias("__match"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    )
    l_side = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(r.schema[a].dataType).alias(a) for a in tbs],
        F.lit(None).cast(r.schema["__match"].dataType).alias("__match"),
        *[c for c in left.columns if c not in on],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", *tbs)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l_side)
        .withColumn("__m", F.last("__match", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.col("__m.asof_ts") >= F.col("__ts") - tolerance, F.col("__m")
            ),
        )
    return matched.select(
        *on,
        *[c for c in left.columns if c not in on],
        F.col("__m.asof_ts").alias("asof_ts"),
        *[F.col(f"__m.{c}").alias(c) for c in right_cols],
    )
