"""Sinks: CSV (S10) and staged atomic-swap JDBC (S11).

Reference parity (SURVEY.md §2.1): the reference uploaded to PostgreSQL
in 50-100k-row chunks with 3 retries per chunk and an atomic
temp-table → rename swap (data_ingestion/pg_import.R:154-346). On Spark:
  * chunking      → `batchsize` option (executor-side batched inserts),
  * retries       → Spark task retries (`spark.task.maxFailures`),
  * atomic swap   → the staging-table + rename DDL below, driver-side,
                    one transaction,
  * parallelism   → `numPartitions` writers vs the reference's single
                    connection (the 50-200k rows/s single-link baseline
                    in BASELINE.md scales per-executor).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.types import StringType

_log = logging.getLogger(__name__)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """CSV sink (S10). `single_file=True` reproduces the reference's
    one-file-per-table output (scripts/ads_passenger_travel_info_mi.py:520)
    via coalesce(1) — only for small ADS outputs; large tables keep one
    file per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


@dataclass
class JdbcTarget:
    url: str
    table: str
    user: str | None = None
    password: str | None = None
    driver: str = "org.postgresql.Driver"
    batchsize: int = 100_000  # reference default chunk (pg_import.R:11)
    num_partitions: int | None = None

    def options(self) -> dict[str, str]:
        opts = {"url": self.url, "driver": self.driver, "batchsize": str(self.batchsize)}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.num_partitions:
            opts["numPartitions"] = str(self.num_partitions)
        return opts


def swap_ddl(
    table: str,
    staging: str,
    dialect: str = "postgres",
    table_exists: bool = True,
) -> list[str]:
    """The atomic-swap DDL sequence (reference
    data_ingestion/pg_import.R:288-313). Transaction control is NOT in
    the statement list — `write_jdbc_staged` runs the sequence on one
    connection with autocommit off and commits once, the JDBC-idiomatic
    equivalent of the reference's BEGIN…COMMIT, so readers never observe
    a half-loaded table.

    `dialect='derby'` emits Derby's spelling (no DROP IF EXISTS — pass
    `table_exists` from a probe — and RENAME TABLE instead of ALTER),
    which is what the in-process end-to-end test runs against."""
    if dialect == "postgres":
        return [
            f'DROP TABLE IF EXISTS "{table}"',
            f'ALTER TABLE "{staging}" RENAME TO "{table}"',
        ]
    if dialect == "derby":
        drops = [f'DROP TABLE "{table}"'] if table_exists else []
        return drops + [f'RENAME TABLE "{staging}" TO "{table}"']
    raise ValueError(f"unknown jdbc dialect {dialect!r}")


def compression_ddl(
    table: str, text_columns: list[str], dialect: str = "postgres"
) -> list[str]:
    """Storage-compression DDL for a freshly written table (reference
    data_ingestion/pg_import.R:187-221): shrink the TOAST inline
    threshold so wide rows compress out-of-line, mark text columns
    EXTENDED (compressed TOAST storage), and request LZ4 column
    compression on PostgreSQL 14+. The reference's table-level
    `SET (compression = lz4)` spelling (pg_import.R:213) is not a
    valid PG reloption — it lives inside a tryCatch and always falls
    back — so this emits the column-level `SET COMPRESSION lz4`,
    which is the DDL PG 14+ actually accepts; same intent, valid
    spelling. Every statement is OPTIONAL tuning: run via
    `_run_best_effort` (per-statement autocommit, failures logged),
    matching the reference's warn-and-continue contract.

    Derby (the in-process test engine) has no storage-compression
    DDL — returns [] so the staged-swap path is byte-identical there."""
    if dialect == "derby":
        return []
    if dialect != "postgres":
        raise ValueError(f"unknown jdbc dialect {dialect!r}")
    stmts = [f'ALTER TABLE "{table}" SET (toast_tuple_target = 128)']
    for c in text_columns:
        stmts.append(
            f'ALTER TABLE "{table}" ALTER COLUMN "{c}" SET STORAGE EXTENDED'
        )
        stmts.append(
            f'ALTER TABLE "{table}" ALTER COLUMN "{c}" SET COMPRESSION lz4'
        )
    return stmts


def _run_best_effort(conn, statements: list[str]) -> list[str]:
    """Run each statement on its own autocommit transaction; a failure
    logs a warning and continues (the reference's tryCatch-per-step,
    pg_import.R:191-221, 317-331). Autocommit ON is also what VACUUM
    FULL requires — it cannot run inside a transaction block. Returns
    the statements that succeeded (for tests/telemetry)."""
    ok: list[str] = []
    conn.setAutoCommit(True)
    for sql in statements:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
            ok.append(sql)
        except Exception as exc:  # noqa: BLE001 — warn-and-continue contract
            _log.warning("post-load statement failed (continuing): %s — %s", sql, exc)
        finally:
            stmt.close()
    return ok


def _table_exists(conn, table: str) -> bool:
    """Probe with a zero-row select — dialect-neutral, run with
    autocommit ON so a failed probe can't poison the swap transaction."""
    try:
        stmt = conn.createStatement()
        try:
            rs = stmt.executeQuery(f'SELECT 1 FROM "{table}" WHERE 1=0')
            rs.close()
            return True
        finally:
            stmt.close()
    except Exception:
        return False


def write_jdbc_staged(
    df: DataFrame,
    target: JdbcTarget,
    dialect: str = "postgres",
    enable_compression: bool = False,
    post_load_sql: list[str] | None = None,
) -> list[str]:
    """Write to `<table>__staging` with parallel batched inserts, then
    atomically swap it into place (one transaction: drop old + rename
    staging). Re-running is idempotent — the staging write is
    mode('overwrite') and the swap replaces the previous table.

    `enable_compression=True` reproduces the reference's
    `enable_compression` path (data_ingestion/pg_import.R:187-221,
    316-331): storage-compression DDL on the staging table BEFORE the
    swap (so the rename carries the settings) and a `VACUUM FULL`
    AFTER it (rewrites the heap so compression applies to already
    loaded rows). `post_load_sql` appends caller statements (index
    builds, ANALYZE, grants) to that post-swap step. Both are
    warn-and-continue best-effort on per-statement autocommit — a
    missing privilege or an older PG version can never fail the load,
    and VACUUM cannot run inside a transaction block anyway. The swap
    itself stays strict and transactional. Returns the post-load
    statements that succeeded.

    Exercised end-to-end in tests against embedded Derby (on the Spark
    classpath); the postgres dialect is the production path and differs
    only in the DDL spelling from `swap_ddl` / `compression_ddl`.
    """
    staging = f"{target.table}__staging"
    (
        df.write.format("jdbc")
        .options(**target.options())
        .option("dbtable", f'"{staging}"')
        .mode("overwrite")
        .save()
    )
    text_cols = [
        f.name for f in df.schema.fields if isinstance(f.dataType, StringType)
    ]
    # driver-side swap through one JDBC connection, one transaction
    jvm = df.sparkSession._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in target.options().items():
        if k not in ("url", "batchsize", "numPartitions"):
            props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(target.url, props)
    try:
        if enable_compression:
            _run_best_effort(
                conn, compression_ddl(staging, text_cols, dialect)
            )
        exists = _table_exists(conn, target.table)
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        for sql in swap_ddl(target.table, staging, dialect, exists):
            stmt.execute(sql)
        stmt.close()
        conn.commit()
        post = list(post_load_sql or [])
        if enable_compression and dialect == "postgres":
            post.append(f'VACUUM FULL "{target.table}"')
        return _run_best_effort(conn, post) if post else []
    finally:
        conn.close()


def write_partition_overwrite(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Idempotent partition-level backfill: overwrite ONLY the
    hive-style partitions present in `df`, leaving every other
    partition untouched — the parquet-directory equivalent of the
    JDBC staged swap above (and of the reference's re-run-a-month
    refresh loops, e.g. `scripts/ads_passenger_travel_info_mi.py`'s
    per-month rewrite): re-running a day/month job replaces that
    slice atomically-per-partition instead of truncating the table.

    Uses Spark's dynamic partitionOverwriteMode, scoped to this write
    and restored afterwards (the session default stays whatever the
    user configured). At 100 TB this is the difference between a
    backfill touching one day's files and rewriting the table.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
