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


def swap_ddl(table: str, staging: str) -> list[str]:
    """The atomic-swap statement sequence (reference
    data_ingestion/pg_import.R:288-313): executed in one transaction so
    readers never observe a half-loaded table."""
    return [
        "BEGIN",
        f'DROP TABLE IF EXISTS "{table}"',
        f'ALTER TABLE "{staging}" RENAME TO "{table}"',
        "COMMIT",
    ]


def write_jdbc_staged(df: DataFrame, target: JdbcTarget) -> None:
    """Write to `<table>__staging` with parallel batched inserts, then
    atomically swap it into place.

    Requires the JDBC driver jar on the classpath and a live database —
    statement generation (`swap_ddl`) is unit-tested; this function is
    exercised in integration environments only.
    """
    staging = f"{target.table}__staging"
    (
        df.write.format("jdbc")
        .options(**target.options())
        .option("dbtable", staging)
        .mode("overwrite")
        .save()
    )
    # driver-side swap through the same JDBC connection
    jvm_spark = df.sparkSession
    props = jvm_spark._sc._jvm.java.util.Properties()
    for k, v in target.options().items():
        if k not in ("url", "batchsize", "numPartitions"):
            props.setProperty(k, v)
    conn = jvm_spark._sc._jvm.java.sql.DriverManager.getConnection(target.url, props)
    try:
        stmt = conn.createStatement()
        for sql in swap_ddl(target.table, staging):
            stmt.execute(sql)
        stmt.close()
    finally:
        conn.close()
