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

from dataclasses import dataclass

from pyspark.sql import DataFrame


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
    df: DataFrame, target: JdbcTarget, dialect: str = "postgres"
) -> None:
    """Write to `<table>__staging` with parallel batched inserts, then
    atomically swap it into place (one transaction: drop old + rename
    staging). Re-running is idempotent — the staging write is
    mode('overwrite') and the swap replaces the previous table.

    Exercised end-to-end in tests against embedded Derby (on the Spark
    classpath); the postgres dialect is the production path and differs
    only in the DDL spelling from `swap_ddl`.
    """
    staging = f"{target.table}__staging"
    (
        df.write.format("jdbc")
        .options(**target.options())
        .option("dbtable", f'"{staging}"')
        .mode("overwrite")
        .save()
    )
    # driver-side swap through one JDBC connection, one transaction
    jvm = df.sparkSession._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in target.options().items():
        if k not in ("url", "batchsize", "numPartitions"):
            props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(target.url, props)
    try:
        exists = _table_exists(conn, target.table)
        conn.setAutoCommit(False)
        stmt = conn.createStatement()
        for sql in swap_ddl(target.table, staging, dialect, exists):
            stmt.execute(sql)
        stmt.close()
        conn.commit()
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
