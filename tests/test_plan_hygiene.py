"""Physical-plan lint over EVERY registry query: the CLAUDE.md scale
invariants, enforced mechanically instead of by review.

Banned in any query plan:
  * CartesianProduct — an unconditioned join that didn't broadcast;
    at 100 TB this is the job that never finishes. (The intentional
    O(N·K) centroid/plane joins broadcast a ≤K-row side and appear as
    BroadcastNestedLoopJoin, which is allowed.)
  * BatchEvalPython — a row-at-a-time Python UDF; Python is allowed
    only through Arrow (MapInPandas / ArrowEvalPython).
  * Exchange SinglePartition over unaggregated data — a global sort /
    empty-partition-spec Window collapsing fact-scale input onto ONE
    task (the w8 lesson). Single-partition exchanges above an
    aggregate (per-shard counts, vocab ranking, threshold curves —
    bounded, kilobyte-scale inputs) are the legitimate pattern and
    stay allowed.

Plans are built at sf0.001 — this lints plan SHAPE, not timing.
"""

from __future__ import annotations

import pytest

from ad_data_pipelines_spark.plans.testdata_queries import REGISTRY
from tests.conftest import SF_MEDIUM, SF_SMALL

ALL_QUERIES = sorted(REGISTRY)

#: plan lines that read stored/materialized data — reaching one of
#: these below a SinglePartition exchange without crossing an
#: aggregate means raw (unbounded) rows were collapsed to one task
_LEAF_MARKERS = (
    "Scan parquet",
    "FileScan",
    "Scan ExistingRDD",
    "InMemoryTableScan",
    "Scan csv",
    "Scan json",
)
_AGG_MARKERS = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def single_partition_collapses(plan: str) -> list[str]:
    """Lines where an `Exchange SinglePartition` feeds on unaggregated
    stored data. The physical plan prints depth-first, so the lines
    after an exchange are its subtree: if a leaf scan appears before
    any aggregate, the exchange is funneling raw rows into one task."""
    final = plan.split("+- == Initial Plan ==")[0]
    lines = final.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        for below in lines[i + 1:]:
            if any(m in below for m in _AGG_MARKERS):
                break  # bounded: exchange input is post-aggregation
            if any(m in below for m in _LEAF_MARKERS):
                bad.append(line.strip())
                break
    return bad


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_no_cartesian_no_row_udfs(name, spark):
    df = REGISTRY[name].fn(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, (
        f"{name}: unconditioned non-broadcast join\n{plan}"
    )
    assert "BatchEvalPython" not in plan, (
        f"{name}: row-at-a-time Python UDF in the plan\n{plan}"
    )
    collapses = single_partition_collapses(plan)
    assert not collapses, (
        f"{name}: single-partition collapse of unaggregated data "
        f"(global sort / empty-partition-spec Window over a fact "
        f"input): {collapses}\n{plan}"
    )


def test_shared_stages_key_on_sf_dir(spark):
    """The session-scoped _shared persist cache must key on the data
    directory: the same query against two SFs returns different data,
    never a cache hit across directories."""
    from ad_data_pipelines_spark.plans import testdata_queries as tq

    small = {
        tuple(r)
        for r in tq.REGISTRY["llm_boilerplate_ngrams"].fn(spark, SF_SMALL).collect()
    }
    medium = {
        tuple(r)
        for r in tq.REGISTRY["llm_boilerplate_ngrams"].fn(spark, SF_MEDIUM).collect()
    }
    assert small != medium


def test_shared_corpus_stages_actually_reused(spark):
    """Breaking the _shared pattern silently reintroduces per-query
    corpus re-assignment (r2's top perf defect) — assert the ANN and
    shingle consumers read the persisted stage (InMemoryTableScan),
    not a fresh scan chain."""
    from ad_data_pipelines_spark.plans import testdata_queries as tq

    for name in ["llm_ann_lsh", "llm_ann_ivf", "llm_boilerplate_ngrams"]:
        df = tq.REGISTRY[name].fn(spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, name


def test_single_partition_collapse_lint_catches_global_window(spark):
    """Negative control: the exact shape the lint exists for — an
    empty-partition-spec Window straight over a parquet scan (the
    pre-r7 w8 form) — is flagged, while the same window over an
    aggregate is not."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    bad = cust.select(
        F.ntile(10).over(Window.orderBy("c_acctbal", "c_custkey")).alias("d")
    )
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert single_partition_collapses(plan), plan

    ok = (
        cust.groupBy("c_nationkey")
        .count()
        .select(
            "c_nationkey",
            F.sum("count").over(
                Window.orderBy("c_nationkey").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ).alias("running"),
        )
    )
    plan_ok = ok._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" in plan_ok  # the window is global
    assert not single_partition_collapses(plan_ok), plan_ok
