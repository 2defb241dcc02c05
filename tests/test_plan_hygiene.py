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
from tests.conftest import SF_SMALL

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
