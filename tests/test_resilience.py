"""Task-level fault tolerance: the reference retried each JDBC chunk
3x in application code (data_ingestion/pg_import.R:253-268); on Spark
the same resilience is the ENGINE's job — a failed task re-runs on
another attempt and the job still commits exactly-once output. These
tests inject real task failures and assert the recovery contract.

The retry test runs in a SUBPROCESS: retries are a SparkContext-wide
setting (`local[N, maxFailures]`), and the shared test session
deliberately runs with maxFailures=1 so genuine flakiness in other
tests fails loudly instead of being silently retried.
"""

from __future__ import annotations

import pytest

import subprocess
import sys
import textwrap


@pytest.mark.slow
def test_transient_task_failure_retries_to_success(tmp_path):
    """A mapInPandas stage whose FIRST attempt per partition raises
    (transient fault: flaky network, OOM-killed container) must
    succeed end-to-end via Spark's task retry — same rows, no dupes,
    no application-level retry loop. Needs master local[4, 2]
    (maxFailures=2), hence the dedicated subprocess session."""
    script = textwrap.dedent(
        f"""
        import sys
        from pyspark.sql import SparkSession
        from pyspark.sql import functions as F

        marker_dir = {str(tmp_path / "attempts")!r}
        import os
        os.makedirs(marker_dir, exist_ok=True)

        spark = (SparkSession.builder.master("local[4, 2]")
                 .config("spark.ui.enabled", "false")
                 .config("spark.sql.shuffle.partitions", "4")
                 .getOrCreate())

        def flaky(batches):
            from pyspark import TaskContext
            ctx = TaskContext.get()
            marker = os.path.join(marker_dir, f"p{{ctx.partitionId()}}")
            if ctx.attemptNumber() == 0:
                with open(marker, "w") as fh:
                    fh.write("failed-once")
                raise RuntimeError("injected transient fault")
            for b in batches:
                yield b

        df = spark.range(0, 1000, numPartitions=4).select(
            F.col("id"), (F.col("id") * 2).alias("v"))
        out = df.mapInPandas(flaky, df.schema).collect()
        assert len(out) == 1000, len(out)
        assert {{r.id for r in out}} == set(range(1000))
        assert {{r.v for r in out}} == {{2 * i for i in range(1000)}}
        assert len(os.listdir(marker_dir)) == 4, os.listdir(marker_dir)
        print("RETRY-OK")
        spark.stop()
        """
    )
    res = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "RETRY-OK" in res.stdout, (
        f"stdout:\n{res.stdout[-2000:]}\nstderr:\n{res.stderr[-2000:]}"
    )


def test_failed_write_job_leaves_no_committed_output(spark, tmp_path):
    """A write whose tasks exhaust retries must NOT leave a readable
    committed dataset — the FileOutputCommitter contract that makes
    idempotent re-runs safe (only _temporary droppings remain)."""
    import glob

    import pytest

    def always_fail(batches):
        raise RuntimeError("injected permanent fault")
        yield  # pragma: no cover

    df = spark.range(100, numPartitions=2)
    out = str(tmp_path / "never")
    with pytest.raises(Exception, match="injected permanent fault"):
        df.mapInPandas(always_fail, df.schema).write.parquet(out)
    committed = [
        f for f in glob.glob(out + "/*.parquet")
    ] + ([out + "/_SUCCESS"] if (tmp_path / "never" / "_SUCCESS").exists() else [])
    assert committed == [], f"failed job committed output: {committed}"
