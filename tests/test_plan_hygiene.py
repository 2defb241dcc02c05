"""Physical-plan lint over EVERY registry query: the CLAUDE.md scale
invariants, enforced mechanically instead of by review.

Banned in any query plan:
  * CartesianProduct — an unconditioned join that didn't broadcast;
    at 100 TB this is the job that never finishes. (The intentional
    O(N·K) centroid/plane joins broadcast a ≤K-row side and appear as
    BroadcastNestedLoopJoin, which is allowed.)
  * BatchEvalPython — a row-at-a-time Python UDF; Python is allowed
    only through Arrow (MapInPandas / ArrowEvalPython).

Plans are built at sf0.001 — this lints plan SHAPE, not timing.
"""

from __future__ import annotations

import pytest

from ad_data_pipelines_spark.plans.testdata_queries import REGISTRY
from tests.conftest import SF_MEDIUM, SF_SMALL

ALL_QUERIES = sorted(REGISTRY)


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
