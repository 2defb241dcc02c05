"""Keyed MERGE / upsert (CDC batch apply) into a parquet warehouse.

The reference's first-seen store (S13,
`scripts/ads_passenger_travel_distance_di.py:9-52`) and the
create-vs-append decision in `data_ingestion/folder_import.R:94-98`
are point solutions to the same daily-ingest primitive: apply a keyed
batch of inserts / updates / deletes to a stored table. SURVEY.md
§2.1-S13 names Delta `MERGE` as the general restatement; this module
is that primitive on plain parquet, Spark-first.

Two layers:

  * `merge_plan` — the LOGICAL merge as a DataFrame (no I/O): Delta
    `MERGE` semantics (matched+delete → drop, matched+upsert → update,
    unmatched+upsert → insert, unmatched+delete → no-op) expressed as
    joins, so Catalyst plans it.
  * `merge_apply` + the versioned-table helpers — the PHYSICAL apply
    with the same crash-safety contract as `write_jdbc_staged`
    (sources/writers.py): the new state is fully written to a fresh
    version directory, then a one-file pointer (`_CURRENT`) is
    atomically replaced (`os.replace`, atomic on POSIX). A killed
    apply leaves the pointer — and therefore every reader — on the old
    version; this is the same commit shape Delta/Iceberg implement
    with their metadata logs.

Scale design (100 TB):
  * Default strategy broadcasts the (dedup'd) change batch, so the
    UPDATE/DELETE pass is a map-side join — the big target NEVER
    shuffles. Inserts need an anti-join of changes against target
    KEYS, which shuffles one projected key column of the target plus
    the tiny change batch — not the wide rows.
  * `broadcast_changes=False` switches to one full-outer sort-merge
    join for change batches too big to broadcast; both sides shuffle
    once on the key.
  * For partition-aligned daily ingest, `merge_apply_partitions`
    rewrites ONLY the hive partitions the change batch touches
    (partition pruning on read, dynamic partition-overwrite on
    write) — the backfill never touches cold partitions.
  * Change batches are collapsed to one row per key FIRST
    (`seq_col` row_number, deterministic — SURVEY §4.4-6), so a busy
    key replays as exactly its latest change.
"""

from __future__ import annotations

import os
import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: op-column value marking a delete; anything else upserts.
DELETE_OP = "D"

_CP = "__mrg_"  # collision-proof prefix for change-side columns


def latest_change_per_key(
    changes: DataFrame, keys: Sequence[str], seq_col: str | None
) -> DataFrame:
    """One row per key: the change with the highest `seq_col`
    (row_number, deterministic — `seq_col` must be unique per key,
    e.g. a CDC log offset). With `seq_col=None` the batch is REQUIRED
    to already be unique per key (CDC-compacted); this is asserted
    lazily by the merge join itself only in the sense that duplicate
    keys would fan out — callers with raw multi-event batches must
    pass `seq_col`."""
    if seq_col is None:
        return changes
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_plan(
    target: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str | None = None,
    seq_col: str | None = None,
    broadcast_changes: bool = True,
    evolve_schema: bool = False,
) -> DataFrame:
    """The merged state of `target` after applying `changes`, as a
    DataFrame with exactly the target's schema — or, with
    `evolve_schema=True`, the target schema WIDENED by any new
    change-batch columns (Delta-style schema evolution: existing
    target rows read NULL for the new columns, updates/inserts carry
    their values). Default False: unknown change columns are ignored,
    so a malformed feed cannot silently mutate the table schema.

    Semantics (Delta `MERGE` defaults):
      * matched  + op == 'D'  → row deleted,
      * matched  + otherwise  → row updated: every non-key target
        column also present in `changes` takes the change value;
        columns absent from `changes` keep the target value (partial
        update),
      * unmatched + op == 'D' → no-op,
      * unmatched + otherwise → row inserted (target columns absent
        from `changes` become NULL).
    Without `op_col`, every change row upserts.

    NULL keys: SQL join semantics apply — a NULL never matches, so a
    NULL-key change row always INSERTS a fresh row and a NULL-key
    target row is never updated or deleted (identical under both
    strategies; same as Delta `MERGE`). Re-applying a NULL-key batch
    therefore ACCUMULATES NULL rows — scrub or key-synthesize NULLs
    upstream (functions/cleaning.deep_clean exists for exactly this).
    Behavior pinned by test_merge_plan_null_keys_never_match.

    `broadcast_changes=True` (default, for change batches ≪ target):
    target does a map-side left join against the broadcast change
    batch — NO shuffle of the target; the insert pass anti-joins
    changes against the target's projected key column only.
    `broadcast_changes=False`: one full-outer shuffle join.
    """
    keys = list(keys)
    if evolve_schema:
        ctypes = dict(changes.dtypes)
        for c in changes.columns:
            if (
                c not in target.columns
                and c not in keys
                and c != op_col
                and c != seq_col
            ):
                target = target.withColumn(c, F.lit(None).cast(ctypes[c]))
    data_cols = [c for c in target.columns if c not in keys]
    chg_cols = [
        c
        for c in changes.columns
        if c not in keys and c != op_col and c != seq_col and c in target.columns
    ]
    last = latest_change_per_key(changes, keys, seq_col)
    is_del = (
        F.col(op_col) == F.lit(DELETE_OP) if op_col else F.lit(False)
    )
    chg = last.select(
        *keys,
        *[F.col(c).alias(f"{_CP}{c}") for c in chg_cols],
        is_del.alias(f"{_CP}del"),
        F.lit(True).alias(f"{_CP}present"),
    )

    def merged_value(c: str) -> F.Column:
        if c in chg_cols:
            return F.when(
                F.col(f"{_CP}present").isNotNull(), F.col(f"{_CP}{c}")
            ).otherwise(F.col(c))
        return F.col(c)

    if broadcast_changes:
        updated = (
            target.join(F.broadcast(chg), keys, "left")
            .filter(~F.coalesce(F.col(f"{_CP}del"), F.lit(False)))
            .select(*keys, *[merged_value(c).alias(c) for c in data_cols])
        )
        inserts = (
            chg.filter(~F.col(f"{_CP}del"))
            .join(target.select(*keys), keys, "left_anti")
            .select(
                *keys,
                *[
                    (
                        F.col(f"{_CP}{c}")
                        if c in chg_cols
                        else F.lit(None).cast(dict(target.dtypes)[c])
                    ).alias(c)
                    for c in data_cols
                ],
            )
        )
        return updated.unionByName(inserts).select(*target.columns)

    # full-outer path: one shuffle join, both sides keyed once
    tgt = target.withColumn(f"{_CP}t", F.lit(True))
    joined = tgt.join(chg, keys, "full_outer")
    merged = joined.filter(
        ~F.coalesce(F.col(f"{_CP}del"), F.lit(False))
    ).select(
        *keys,
        *[
            F.when(
                F.col(f"{_CP}present").isNotNull(),
                (
                    # update keeps target value for columns the change
                    # batch doesn't carry; insert rows have no target
                    # value to keep → NULL
                    F.col(f"{_CP}{c}")
                    if c in chg_cols
                    else F.when(
                        F.col(f"{_CP}t").isNotNull(), F.col(c)
                    ).otherwise(F.lit(None).cast(dict(target.dtypes)[c]))
                ),
            )
            .otherwise(F.col(c))
            .alias(c)
            for c in data_cols
        ],
    )
    return merged.select(*target.columns)


# --------------------------------------------------------------------------
# Versioned parquet table: atomic pointer commit
# --------------------------------------------------------------------------

_POINTER = "_CURRENT"
# 6-digit MINIMUM: `_next_version` zero-pads to six but keeps counting
# past v999999 (a streaming CDC applier commits one version per
# micro-batch), so v1000000 must stay a valid pointer value.
_VERSION_RE = re.compile(r"^v(\d{6,})$")


def _commit_pointer(root: str, version: str) -> None:
    """Atomically point `_CURRENT` at `version`: write a temp file,
    fsync, `os.replace` (atomic on POSIX). Readers resolve the pointer
    first, so they observe either the old or the new version, never a
    half-written directory."""
    tmp = os.path.join(root, f"{_POINTER}.tmp")
    with open(tmp, "w", encoding="ascii") as f:
        f.write(version)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _POINTER))


def table_current_version(root: str) -> str | None:
    """The committed version name, or None for an uninitialized root.
    Uncommitted version directories (a crashed apply) are invisible."""
    try:
        with open(os.path.join(root, _POINTER), encoding="ascii") as f:
            v = f.read().strip()
    except FileNotFoundError:
        return None
    if not _VERSION_RE.match(v):
        raise ValueError(f"corrupt {_POINTER} pointer at {root}: {v!r}")
    return v


def table_init(df: DataFrame, root: str) -> str:
    """Create a versioned table at `root` with `df` as v000001."""
    os.makedirs(root, exist_ok=True)
    version = "v000001"
    df.write.mode("overwrite").parquet(os.path.join(root, version))
    _commit_pointer(root, version)
    return version


def table_read(spark: SparkSession, root: str) -> DataFrame:
    """The committed state of the table (resolves `_CURRENT`)."""
    v = table_current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed version at {root}")
    return spark.read.parquet(os.path.join(root, v))


def _next_version(root: str) -> str:
    versions = [
        m.group(1)
        for name in os.listdir(root)
        if (m := _VERSION_RE.match(name))
    ]
    n = max((int(v) for v in versions), default=0) + 1
    return f"v{n:06d}"


def merge_apply(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str | None = None,
    seq_col: str | None = None,
    broadcast_changes: bool = True,
    evolve_schema: bool = False,
) -> str:
    """Apply a change batch to the versioned table at `root` and
    atomically commit the result as a new version; returns the new
    version name. Crash-safe: the pointer moves only after the full
    new version is on disk — a killed apply leaves an orphan directory
    (reclaimed by `table_vacuum`) and readers on the old version.
    Re-running the same batch is idempotent in effect (upserts of
    identical values, deletes of absent keys are no-ops)."""
    target = table_read(spark, root)
    merged = merge_plan(
        target,
        changes,
        keys,
        op_col=op_col,
        seq_col=seq_col,
        broadcast_changes=broadcast_changes,
        evolve_schema=evolve_schema,
    )
    version = _next_version(root)
    merged.write.mode("overwrite").parquet(os.path.join(root, version))
    _commit_pointer(root, version)
    return version


def table_vacuum(root: str, keep: int = 1) -> list[str]:
    """Delete all version directories except the committed one and the
    `keep`-1 newest others (time travel / reader grace window at scale;
    here a plain directory removal). Returns the removed names."""
    import shutil

    current = table_current_version(root)
    # numeric sort: lexicographic would order "v999999" after
    # "v1000000" once the version counter outgrows the 6-digit pad
    versions = sorted(
        (name for name in os.listdir(root) if _VERSION_RE.match(name)),
        key=lambda name: int(name[1:]),
        reverse=True,
    )
    # the committed version is usually also the newest, so the
    # "keep-1 newest OTHERS" must be counted excluding it — otherwise
    # keep=2 (the reader-grace default of the streaming appliers)
    # would protect only the current version
    others = [v for v in versions if v != current]
    protected = set(others[: max(keep - 1, 0)]) | {current}
    removed = []
    for v in versions:
        if v not in protected:
            shutil.rmtree(os.path.join(root, v))
            removed.append(v)
    return removed


def merge_apply_partitions(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    keys: Sequence[str],
    partition_cols: Sequence[str],
    op_col: str | None = None,
    seq_col: str | None = None,
) -> None:
    """Partition-scoped MERGE into a plain hive-partitioned parquet
    dir: only the partitions present in the change batch are read
    (partition pruning via the IN-filter below) and rewritten (dynamic
    partition overwrite — sources/writers.write_partition_overwrite).
    Cold partitions are never touched: at 100 TB a daily CDC batch
    rewrites one day, not the table. Partition columns must be part of
    (or functionally determined by) the merge keys so a change row
    cannot move a key across partitions."""
    from ad_data_pipelines_spark.sources.writers import (
        write_partition_overwrite,
    )

    parts = [r.asDict() for r in changes.select(*partition_cols).distinct().collect()]
    if not parts:
        return
    pred = None
    for p in parts:
        clause = F.lit(True)
        for c in partition_cols:
            # eqNullSafe: a NULL partition value in the change batch
            # must still SELECT the existing NULL partition
            # (__HIVE_DEFAULT_PARTITION__) for the merge — plain `=`
            # would skip it, and the dynamic overwrite below would then
            # replace that partition with only the batch rows, silently
            # dropping its pre-existing rows. Pinned by
            # test_merge_apply_partitions_null_partition_value.
            clause = clause & F.col(c).eqNullSafe(F.lit(p[c]))
        pred = clause if pred is None else (pred | clause)
    target = spark.read.parquet(path).filter(pred)
    merged = merge_plan(
        target, changes, keys, op_col=op_col, seq_col=seq_col
    )
    write_partition_overwrite(merged, path, list(partition_cols))
