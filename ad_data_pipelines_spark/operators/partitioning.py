"""Shuffle-elimination utilities for the 100 TB path: bucketed
co-located joins and deterministic skew salting.

The reference never needed these (single-process pandas), but they are
what makes the same logical plans survive a 1000-executor cluster:

  * **Bucketing** — the AFC fact joined to another fact-sized table
    (e.g. legs ⋈ journeys, or fact ⋈ fact-sized first-seen snapshots)
    shuffles both sides on every run. Writing both sides bucketed by
    the join key makes the join a zero-exchange sort-merge: each task
    reads matching bucket files. Verified by plan assertion in
    tests/test_partitioning.py (no `Exchange` above the join).
  * **Salting** — broadcast handles small dims; AQE splits skewed
    *shuffle* partitions; but a hot key joined against a
    non-broadcastable side still funnels into one task. `salted_join`
    spreads each hot key over `n_salts` sub-keys deterministically
    (hash of the fact row, not rand() — stable under task retries,
    which matters: a retried task re-emitting different salts breaks
    exactly-once sinks).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Persist `df` bucketed (and bucket-sorted) by `keys` as an
    external table at `path`. Join/agg on `keys` between tables with
    the SAME bucket count then needs no Exchange; sortBy additionally
    removes the Sort under sort-merge joins."""
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    grain: str = "month",
    partition_col: str | None = None,
) -> str:
    """Write `df` as parquet hive-partitioned by a time grain of
    `ts_col` (month → `p_month=yyyy-MM`, day → `p_date=yyyy-MM-dd`).

    This is the storage layout that makes the reference's quarter-month
    re-scan loops unnecessary: a `.filter` on the grain column prunes
    directories at planning time (`PartitionFilters` in explain), so a
    one-month query over a 100 TB / multi-year fact reads one month of
    files. Returns the partition column name.
    """
    if grain == "month":
        part = partition_col or "p_month"
        val = F.date_format(ts_col, "yyyy-MM")
    elif grain == "day":
        part = partition_col or "p_date"
        val = F.date_format(ts_col, "yyyy-MM-dd")
    else:
        raise ValueError(f"unsupported grain: {grain}")
    df.withColumn(part, val).write.mode("overwrite").partitionBy(part).parquet(path)
    return part


def salted_join(
    facts: DataFrame,
    skewed_side: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `facts ⋈ skewed_side` on `key`, spreading each key over
    `n_salts` sub-partitions.

    The fact side gets a deterministic salt from a hash of the whole
    row plus its partition id (no rand(); the partition component also
    spreads rows that are byte-identical duplicates — common for
    boilerplate/null-heavy hot keys — across salts when they sit in
    different input partitions; identical rows co-resident in one
    partition still share a salt, the remaining caveat). The other side
    is exploded ×n_salts so every (key, salt) pair finds its match.
    Use when the right side is too big to broadcast AND key skew
    defeats AQE (e.g. a null-heavy or boilerplate-heavy key).
    Output columns = facts.* + skewed_side.* minus its join key.

    Only `inner` and `left` are accepted: under right/full outer an
    unmatched skewed_side row exists once per salt copy and would emit
    n_salts duplicate outputs.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: "
            "right/full outer would duplicate unmatched exploded rows "
            "n_salts times"
        )
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), *facts.columns), F.lit(n_salts)
    )
    f = facts.withColumn("__salt", salt)
    s = skewed_side.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(s, [key, "__salt"], how)
    return joined.drop("__salt")


def partitions_for_target_size(df: DataFrame, target_mb: int = 256) -> int:
    """Partition count that lands output files near `target_mb`,
    from Catalyst's optimized-plan size estimate.

    The small-files problem is the quiet killer of 100 TB warehouses: a
    1000-task job writing a 10 GB result produces 1000×10 MB files, and
    every later scan pays 1000 opens + footer reads. Catalyst already
    carries a size estimate for every plan (`sizeInBytes` — column
    stats when available, else scan-size propagation); using it costs
    nothing at runtime. The estimate is in-memory-row-oriented and
    typically 2-4× the on-disk parquet size, so files land *under*
    target_mb — the safe side of the tradeoff (fewer, larger files).
    """
    raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    size_bytes = int(str(raw))  # scala BigInt → python int
    return max(1, -(-size_bytes // (target_mb * 1024 * 1024)))


def write_sized(
    df: DataFrame, path: str, target_mb: int = 256, mode: str = "overwrite"
) -> int:
    """Write parquet with stat-derived output partitioning: repartition
    to `partitions_for_target_size` (a round-robin exchange — use
    `write_bucketed`/`write_time_partitioned` when the layout should
    carry join/prune structure instead). Returns the partition count."""
    n = partitions_for_target_size(df, target_mb)
    df.repartition(n).write.mode(mode).parquet(path)
    return n


def write_range_sorted(
    df: DataFrame, path: str, order_col: str, n_files: int, mode: str = "overwrite"
) -> None:
    """Write parquet range-partitioned AND sorted on `order_col`:
    `repartitionByRange` gives non-overlapping value ranges per file,
    `sortWithinPartitions` orders rows inside each.

    Why at 100 TB: parquet keeps min/max statistics per row group; when
    file ranges don't overlap, a predicate on `order_col` (the time
    filter every daily pipeline starts with) skips whole files and row
    groups at scan time — the same effect as directory partitioning but
    at sub-partition granularity, and it composes with
    `write_time_partitioned` (partition dirs prune months, sorted row
    groups prune days). The range exchange samples the column to pick
    balanced boundaries, so skewed timestamps still give even files.
    """
    (
        df.repartitionByRange(n_files, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark, path: str, target_mb: int = 256, checksum_cols=None
) -> dict:
    """Compact a small-files parquet directory in place: rewrite at
    `partitions_for_target_size` granularity into a sibling temp dir,
    VERIFY row count (and, with `checksum_cols`, the order-independent
    md5-XOR content checksum from `operators/audit.table_checksum`)
    against the original, then swap directories — the maintenance job
    that keeps long-lived append targets (streaming sinks, daily
    appends) scannable.

    Verification runs BEFORE the swap, so a failed rewrite leaves the
    live directory untouched (the parquet-directory sibling of the
    JDBC staged swap, sources/writers.py ←
    `data_ingestion/pg_import.R:288-313`). The two renames are atomic
    on POSIX/HDFS; object stores without atomic rename should compact
    through a table format instead — documented, not hidden.

    Returns {"files_before", "files_after", "n_rows"}.
    """
    import glob
    import os
    import shutil

    def _data_files(p):
        return [
            f
            for f in glob.glob(os.path.join(p, "**", "*.parquet"),
                               recursive=True)
            if os.path.isfile(f)
        ]

    before = len(_data_files(path))
    df = spark.read.parquet(path)
    n = partitions_for_target_size(df, target_mb)
    tmp = path.rstrip("/") + ".compact.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    df.repartition(n).write.mode("overwrite").parquet(tmp)

    from ad_data_pipelines_spark.operators.audit import table_checksum

    new_df = spark.read.parquet(tmp)
    cols = checksum_cols or []
    if cols:
        old_c = table_checksum(df, cols).collect()[0]
        new_c = table_checksum(new_df, cols).collect()[0]
        ok = (old_c.n_rows, old_c.checksum) == (
            new_c.n_rows,
            new_c.checksum,
        )
        n_rows = old_c.n_rows
    else:
        n_rows = df.count()
        ok = n_rows == new_df.count()
    if not ok:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            "compact_parquet: rewritten data does not match the "
            "original — live directory left untouched"
        )

    backup = path.rstrip("/") + ".compact.old"
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(tmp, path)
    shutil.rmtree(backup)
    return {
        "files_before": before,
        "files_after": len(_data_files(path)),
        "n_rows": int(n_rows),
    }


def normalize_to_bits(
    col, lo: float, hi: float, bits: int
) -> "Column":
    """Map [lo, hi] linearly onto the integer grid [0, 2^bits), clamped
    at both ends (out-of-bounds values land on the edge cells rather
    than corrupting the interleave). The EXPLICIT-domain normalizer:
    no stats job, so the layout is deterministic under appends —
    `zorder_key` below is the stats-derived sibling."""
    if hi <= lo:
        raise ValueError(f"normalize_to_bits: need lo < hi, got [{lo}, {hi}]")
    c = F.col(col) if isinstance(col, str) else col
    top = (1 << bits) - 1
    scaled = F.floor(
        (c.cast("double") - F.lit(float(lo)))
        * F.lit(top / (float(hi) - float(lo)))
    ).cast("long")
    return F.greatest(F.least(scaled, F.lit(top)), F.lit(0))


def z_value(cols: Sequence["Column"], bits: int = 16) -> "Column":
    """Morton interleave of already-normalized integer columns (each in
    [0, 2^bits)): bit b of column i lands at position b*len(cols)+i.
    len(cols)*bits must stay ≤ 62 (sign bit clear). Pure
    shift/mask/or — whole-stage codegen, no UDF. The single canonical
    interleave: `zorder_key` and `zorder_write` both build on it, and
    `z_value_sql` is its ANSI-SQL twin for oracles."""
    from functools import reduce

    n = len(cols)
    if n == 0:
        raise ValueError("z_value: need at least one column")
    if n * bits > 62:
        raise ValueError(
            f"z_value: {n} cols × {bits} bits = {n * bits} exceeds 62"
        )
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(
                F.lit(1)
            )
            terms.append(F.shiftleft(bit, b * n + i))
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def z_value_sql(exprs: Sequence[str], bits: int = 16) -> str:
    """The identical interleave as an ANSI-SQL expression over
    already-normalized integer SQL expressions — the DuckDB oracle
    twin (generated the same way dedup.simhash_sql is)."""
    n = len(exprs)
    terms = [
        f"((({e}) >> {b} & 1) << {b * n + i})"
        for b in range(bits)
        for i, e in enumerate(exprs)
    ]
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[tuple[str, float, float]],
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write `df` as parquet clustered by the z-order of `cols`
    ((name, lo, hi) EXPLICIT domain triples — no stats pass, so the
    layout is append-deterministic; `write_zordered` below derives
    domains from data instead): range partitioning on the z-key gives
    each output file a contiguous z-run → tight per-file min/max for
    EVERY interleaved column; the within-partition sort tightens
    row-group bounds too. The z-key is dropped before writing (a
    layout device, not data)."""
    z = z_value(
        [normalize_to_bits(c, lo, hi, bits) for c, lo, hi in cols], bits
    )
    keyed = df.withColumn("__z", z)
    parts = (
        keyed.repartitionByRange(num_files, "__z")
        if num_files
        else keyed.repartitionByRange("__z")
    )
    parts.sortWithinPartitions("__z").drop("__z").write.mode(
        "overwrite"
    ).parquet(path)


def zorder_key(
    df: DataFrame, cols, bits: int = 16
) -> tuple[DataFrame, "Column"]:
    """Morton (Z-order) key over numeric `cols`: each column min/max-
    normalizes into a `bits`-bit bucket (ONE stats aggregate, broadcast
    back), and bit j of column i lands at interleaved position
    j*d + i. Returns (df_with_stats_joined, key_column).

    Linear bucketing keeps the stats pass to one tiny aggregate; for
    heavily skewed columns pre-transform (log, clamp) before ordering —
    the key only drives LAYOUT, so a suboptimal spread degrades pruning,
    never correctness."""
    names = list(cols)
    d = len(names)
    assert d >= 2, "zorder needs ≥2 columns (use write_range_sorted for 1)"
    stats = df.agg(
        *[
            agg
            for c in names
            for agg in (
                F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__hi_{c}"),
            )
        ]
    )
    joined = df.crossJoin(F.broadcast(stats))
    n_buckets = 1 << bits
    buckets = []
    for c in names:
        lo, hi = F.col(f"__lo_{c}"), F.col(f"__hi_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        buckets.append(
            F.least(
                F.greatest(
                    F.floor(
                        (F.col(c).cast("double") - lo) / span * n_buckets
                    ).cast("long"),
                    F.lit(0).cast("long"),
                ),
                F.lit(n_buckets - 1).cast("long"),
            )
        )
    # one canonical interleave — shared with zorder_write/z_value_sql
    return joined, z_value(buckets, bits)


def write_zordered(
    df: DataFrame,
    path: str,
    cols,
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet Z-ORDERED on several columns: range-partition and
    sort on the Morton interleaving of the columns' bucket indices —
    the multi-dimension extension of `write_range_sorted`.

    Why at 100 TB: single-column range sort gives perfect min/max
    pruning on ONE column and none on the others; Z-order spreads
    locality across all `cols`, so each file covers a small hyper-
    rectangle and a predicate on ANY of the columns skips most files
    (the same layout Delta/Iceberg OPTIMIZE ZORDER produces). The
    Morton key is layout-only — readers see plain parquet and rely on
    standard row-group statistics.
    """
    joined, key = zorder_key(df, cols, bits)
    (
        joined.withColumn("__z", key)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z", *[c2 for c2 in joined.columns if c2.startswith("__lo_") or c2.startswith("__hi_")])
        .write.mode(mode)
        .parquet(path)
    )
