"""SparkSession factory with scale-ready defaults.

The reference system hand-managed memory (chunked scans, gc.collect, dtype
downcasts — SURVEY.md §4). On Spark all of that is the engine's job; the
session config below is what we tune instead:

  * AQE on (runtime shuffle-partition coalescing, skew-join splitting,
    broadcast-join demotion/promotion at runtime).
  * UTC session timezone — the reference's timestamps are naive
    (`timestamp without time zone`); pinning UTC makes `to_date`/
    `date_trunc` deterministic and oracle-comparable.
  * Arrow enabled for the (rare) Pandas-UDF paths and fast toPandas.
  * Shuffle partitions default to local core count; on a real cluster this
    is overridden (AQE coalesces down, so a high initial number is safe).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ad_data_pipelines_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Local test/bench runs honor ``SPARK_GRAFT_CPUS`` (default 32). On a
    cluster, pass ``master=None`` and let spark-submit decide.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- correctness-critical ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # --- adaptive execution: runtime re-planning at scale ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing: AQE coalesces, so err high for big data ---
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))),
        )
        # --- scan efficiency ---
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # --- Python interop (pandas UDF paths only) ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # --- long-lived-session hygiene (r14 opt) ---
        # ContextCleaner only reclaims dead broadcasts/shuffles after a
        # driver GC; its built-in periodic GC defaults to 30min, so a
        # session running hundreds of queries accumulates dead AQE
        # broadcast blocks in storage memory until they LRU-evict the
        # persisted/localCheckpointed shared stages — measured as
        # roving 2-3x slowdowns on the iterative graph queries (which
        # rescan a checkpointed edge RDD 10-20x per run) deep into a
        # bench session, same-plan spread 2.4-2.9x. 2min keeps the
        # storage pool clean; harmless on short sessions.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_PERIODIC_GC", "2min"),
        )
        # --- keep local runs quiet & snappy ---
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
